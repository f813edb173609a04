package graft

import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.{GZIPOutputStream, ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions.col

import graft.sources.ArchiveSource

class ArchiveSpec extends SparkSpec {
  import spark.implicits._

  private def makeZip(): String = {
    val dir = Files.createTempDirectory("archive-spec")
    val f = dir.resolve("data.zip").toFile
    val zos = new ZipOutputStream(new FileOutputStream(f))
    zos.putNextEntry(new ZipEntry("a.csv"))
    zos.write("id,hz\n1,50.01\n2,49.99\n".getBytes)
    zos.putNextEntry(new ZipEntry("b.csv"))
    zos.write("id,hz\n3,50.02\n".getBytes)
    zos.putNextEntry(new ZipEntry("sub/"))
    zos.closeEntry(); zos.close()
    f.toString
  }

  test("zipLines expands all members with provenance columns") {
    val lines = ArchiveSource.zipLines(spark, makeZip())
    assert(lines.count() == 5) // 3 + 2 header+data lines
    assert(lines.select("member").distinct().as[String].collect()
      .toSet == Set("a.csv", "b.csv"))
  }

  test("zipMemberCsv parses one member as headered CSV") {
    val df = ArchiveSource.zipMemberCsv(spark, makeZip(), "a.csv")
    assert(df.columns.toSeq == Seq("id", "hz"))
    assert(df.count() == 2)
  }

  test("gzipLines expands gz text") {
    val dir = Files.createTempDirectory("archive-spec")
    val f = dir.resolve("x.gz").toFile
    val gz = new GZIPOutputStream(new FileOutputStream(f))
    gz.write("l1\nl2\nl3\n".getBytes)
    gz.close()
    assert(ArchiveSource.gzipLines(spark, f.toString).count() == 3)
  }

  test("bz2Lines round-trips text, including concatenated streams") {
    import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream
    val dir = Files.createTempDirectory("archive-spec")
    val f = dir.resolve("x.csv.bz2").toFile
    val fos = new FileOutputStream(f)
    // two back-to-back bz2 streams — the pbzip2/multi-stream shape
    // Python's bz2.decompress also handles
    for (chunk <- Seq("l1\nl2\n", "l3\n")) {
      val bz = new BZip2CompressorOutputStream(fos)
      bz.write(chunk.getBytes); bz.finish()
    }
    fos.close()
    val got = ArchiveSource.bz2Lines(spark, f.toString)
      .select("line").as[String].collect().toSet
    assert(got == Set("l1", "l2", "l3"))
  }

  test("bz2Bytes yields the exact decompressed payload") {
    import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream
    val dir = Files.createTempDirectory("archive-spec")
    val f = dir.resolve("x.bin.bz2").toFile
    val payload = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    val bz = new BZip2CompressorOutputStream(new FileOutputStream(f))
    bz.write(payload); bz.close()
    val got = ArchiveSource.bz2Bytes(spark, f.toString)
      .select("payload").as[Array[Byte]].collect()
    assert(got.length == 1 && got.head.sameElements(payload))
  }

  private def make7z(): String = {
    import org.apache.commons.compress.archivers.sevenz.{SevenZArchiveEntry, SevenZOutputFile}
    val dir = Files.createTempDirectory("archive-spec")
    val f = dir.resolve("data.7z").toFile
    val out = new SevenZOutputFile(f)
    for ((name, text) <- Seq(
        ("House_1.csv", "id,w\n1,100\n2,250\n"),
        ("House_2.csv", "id,w\n3,175\n"))) {
      val e = new SevenZArchiveEntry(); e.setName(name)
      out.putArchiveEntry(e)
      out.write(text.getBytes)
      out.closeArchiveEntry()
    }
    out.close()
    f.toString
  }

  test("sevenZLines expands LZMA2 members with provenance columns") {
    val lines = ArchiveSource.sevenZLines(spark, make7z())
    assert(lines.count() == 5)
    assert(lines.select("member").distinct().as[String].collect()
      .toSet == Set("House_1.csv", "House_2.csv"))
  }

  test("sevenZMemberCsv parses one member as headered CSV") {
    val df = ArchiveSource.sevenZMemberCsv(spark, make7z(), "House_1.csv")
    assert(df.columns.toSeq == Seq("id", "w"))
    assert(df.count() == 2)
  }

  // ---- independent-writer fixtures (r16 verdict #5): bytes the JVM
  // stack did NOT produce. Every fixture above is written by
  // java.util.zip or commons-compress — the same code family that
  // reads it, so a shared misreading of the format would round-trip
  // invisibly. scripts/make_archive_fixtures.py builds these from
  // the reference C bzip2 binary and a hand-assembled 7z container
  // (pure-Python struct from the public 7zFormat.txt layout).

  private def golden(): com.fasterxml.jackson.databind.JsonNode = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    om.readTree(getClass.getResourceAsStream(
      "/graft/wild_archive_golden.json"))
  }

  test("wild bz2: multi-stream bytes from the system bzip2 binary " +
      "(reference C libbz2, not commons-compress) decode completely") {
    val path = getClass.getResource("/graft/wild_multi.csv.bz2").getPath
    val got = ArchiveSource.bz2Lines(spark, path)
      .select("line").as[String].collect().toSeq.sorted
    val g = golden().get("bz2_lines")
    val want = (0 until g.size()).map(g.get(_).asText()).sorted
    assert(got == want, s"bz2 lines: $got")
    // the multi-stream trap specifically: a reader that stops at the
    // first stream's end-of-stream magic sees only stream 1's rows
    assert(got.count(_ == "id,load") == 2,
      "second bz2 stream was silently dropped")
  }

  test("wild gz: multi-member bytes from the system gzip binary " +
      "(FNAME header on member 1, cat/pigz concatenation) decode " +
      "completely") {
    val path = getClass.getResource("/graft/wild_multi.csv.gz").getPath
    val got = ArchiveSource.gzipLines(spark, path)
      .select("line").as[String].collect().toSeq.sorted
    val g = golden().get("gz_lines")
    val want = (0 until g.size()).map(g.get(_).asText()).sorted
    assert(got == want, s"gz lines: $got")
    // the two traps specifically: a reader that chokes on the FNAME
    // field loses member 1; one that stops at the first trailer
    // loses member 2
    assert(got.count(_ == "id,x") == 2,
      "one of the gz members was silently dropped")
  }

  test("wild 7z: a hand-assembled store-codec container (no 7z " +
      "library wrote any header byte) lists and decodes byte-exact") {
    val path = getClass.getResource("/graft/wild_store.7z").getPath
    val lines = ArchiveSource.sevenZLines(spark, path)
    val g = golden().get("sevenz_members")
    val wantMembers = {
      val it = g.fieldNames(); val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result().toSet
    }
    assert(lines.select("member").distinct().as[String].collect()
      .toSet == wantMembers)
    for (m <- wantMembers) {
      val got = lines.filter(col("member") === m)
        .select("line").as[String].collect().toSeq
      val arr = g.get(m)
      val want = (0 until arr.size()).map(arr.get(_).asText())
      assert(got.sorted == want.sorted, s"$m: $got")
    }
    val csv = ArchiveSource.sevenZMemberCsv(spark, path, "meters_a.csv")
    assert(csv.columns.toSeq == Seq("id", "kwh"))
    assert(csv.count() == 2)
  }

  test("wild zip: CPython-zipfile bytes (UTF-8-flagged non-ASCII " +
      "name, deflate, directory entry) decode completely") {
    val path = getClass.getResource("/graft/wild_members.zip").getPath
    val lines = ArchiveSource.zipLines(spark, path)
    val g = golden().get("zip_members")
    val wantMembers = {
      val it = g.fieldNames(); val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result().toSet
    }
    assert(wantMembers.exists(_.contains("straße")),
      "fixture must carry the non-ASCII member name")
    // the empty data/ directory entry contributes no line rows
    assert(lines.select("member").distinct().as[String].collect()
      .toSet == wantMembers)
    for (m <- wantMembers) {
      val got = lines.filter(col("member") === m)
        .select("line").as[String].collect().toSeq.sorted
      val arr = g.get(m)
      val want = (0 until arr.size()).map(arr.get(_).asText()).sorted
      assert(got == want, s"$m: $got")
    }
  }
}
