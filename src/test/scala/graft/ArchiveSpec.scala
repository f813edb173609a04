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
}
