package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, ZipInputStream}

import org.apache.commons.compress.archivers.sevenz.SevenZFile
import org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream
import org.apache.commons.compress.utils.SeekableInMemoryByteChannel
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S5 — in-flight archive expansion (reference: `frequency.py:34-43`
  * streams zip members, `londondatastore.py:49-55`,
  * `vea_industrial_load_profiles.py:57-60`, `dwd.py:106` bz2,
  * `refit.py:50-61` 7z via py7zr).
  *
  * Archives land as opaque binaries; members are expanded inside
  * `flatMap` over `binaryFiles` — decompression runs on executors, one
  * task per archive, and only text lines (tagged with member name)
  * enter the DataFrame world. A CSV member then parses through
  * `spark.read.csv(Dataset[String])` like any other line stream.
  * bz2 and 7z (LZMA2) decode through commons-compress + xz, both part
  * of Spark's own runtime classpath — no extra dependency.
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

  /** bz2 single-file expansion → line stream (`dwd.py:106` downloads
    * `*.grb.bz2` and `bz2.decompress`es before handing to the GRIB
    * adapter). `decompressConcatenated = true` matches Python's `bz2`
    * on multi-stream files (pbzip2 output). */
  def bz2Lines(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(pathGlob)
      .flatMap { case (file, stream) =>
        val bin = new BZip2CompressorInputStream(
          new ByteArrayInputStream(stream.toArray()), true)
        try new String(bin.readAllBytes(), StandardCharsets.UTF_8)
          .split("\n", -1).iterator.filter(_.nonEmpty)
          .map(line => (file, line)).toList
        finally bin.close()
      }
      .toDF("archive", "line")
  }

  /** Raw decompressed bytes of each bz2 file — for binary payloads
    * (the dwd GRIB path) where line-splitting would corrupt. One row
    * per archive; the payload stays executor-side from here on. */
  def bz2Bytes(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(pathGlob)
      .map { case (file, stream) =>
        val bin = new BZip2CompressorInputStream(
          new ByteArrayInputStream(stream.toArray()), true)
        try (file, bin.readAllBytes()) finally bin.close()
      }
      .toDF("archive", "payload")
  }

  /** (archive, member, line) rows for every text member of every 7z
    * archive under the glob (`refit.py:50-61` lands a zip-of-CSV-like
    * 7z, members read per-name). LZMA2/LZMA/copy coders decode via
    * commons-compress; decompression is executor-side, one task per
    * archive, like [[zipLines]]. */
  def sevenZLines(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(pathGlob)
      .flatMap { case (file, stream) =>
        val sz = SevenZFile.builder()
          .setSeekableByteChannel(
            new SeekableInMemoryByteChannel(stream.toArray()))
          .get()
        try {
          Iterator.continually(sz.getNextEntry)
            .takeWhile(_ != null)
            .filterNot(_.isDirectory)
            .flatMap { entry =>
              val bos = new java.io.ByteArrayOutputStream()
              val buf = new Array[Byte](8192)
              var n = sz.read(buf)
              while (n > 0) { bos.write(buf, 0, n); n = sz.read(buf) }
              new String(bos.toByteArray, StandardCharsets.UTF_8)
                .split("\n", -1).iterator.filter(_.nonEmpty)
                .map(line => (file, entry.getName, line))
            }.toList
        } finally sz.close()
      }
      .toDF("archive", "member", "line")
  }

  /** Parse one 7z member's lines as headered CSV — the py7zr
    * `z.read([name])` + `pd.read_csv` shape from refit.py. */
  def sevenZMemberCsv(spark: SparkSession, pathGlob: String,
      member: String, sep: String = ","): DataFrame = {
    import spark.implicits._
    val lines = sevenZLines(spark, pathGlob)
      .filter(org.apache.spark.sql.functions.col("member") === member)
      .select("line").as[String]
    spark.read.option("header", "true").option("sep", sep).csv(lines)
  }
}
