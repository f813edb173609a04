package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, ZipInputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S5 — in-flight archive expansion (reference: `frequency.py:34-43`
  * streams zip members, `londondatastore.py:49-55`,
  * `vea_industrial_load_profiles.py:57-60`, `dwd.py:106` bz2/gz).
  *
  * Archives land as opaque binaries; members are expanded inside
  * `flatMap` over `binaryFiles` — decompression runs on executors, one
  * task per archive, and only text lines (tagged with member name)
  * enter the DataFrame world. A CSV member then parses through
  * `spark.read.csv(Dataset[String])` like any other line stream.
  */
object ArchiveSource {

  /** (archive, member, line) rows for every text member of every zip
    * under the glob. */
  def zipLines(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(pathGlob)
      .flatMap { case (file, stream) =>
        val zin = new ZipInputStream(
          new ByteArrayInputStream(stream.toArray()))
        Iterator.continually(zin.getNextEntry)
          .takeWhile(_ != null)
          .filterNot(_.isDirectory)
          .flatMap { entry =>
            val name = entry.getName
            val text = new String(zin.readAllBytes(), StandardCharsets.UTF_8)
            text.split("\n", -1).iterator
              .filter(_.nonEmpty)
              .map(line => (file, name, line))
          }.toList
      }
      .toDF("archive", "member", "line")
  }

  /** Parse one member's lines as headered CSV. */
  def zipMemberCsv(spark: SparkSession, pathGlob: String, member: String,
      sep: String = ","): DataFrame = {
    import spark.implicits._
    val lines = zipLines(spark, pathGlob)
      .filter(org.apache.spark.sql.functions.col("member") === member)
      .select("line").as[String]
    spark.read.option("header", "true").option("sep", sep).csv(lines)
  }

  /** Gzip single-file expansion → line stream. */
  def gzipLines(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(pathGlob)
      .flatMap { case (file, stream) =>
        val gin = new GZIPInputStream(
          new ByteArrayInputStream(stream.toArray()))
        new String(gin.readAllBytes(), StandardCharsets.UTF_8)
          .split("\n", -1).iterator.filter(_.nonEmpty)
          .map(line => (file, line)).toList
      }
      .toDF("archive", "line")
  }
}
