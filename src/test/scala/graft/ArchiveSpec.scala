package graft

import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.{GZIPOutputStream, ZipEntry, ZipOutputStream}

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
}
