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

  /** Lazy line iterator over a reader: no full-member materialization —
    * a multi-GB member streams through O(buffer) memory. CR of CRLF
    * endings is stripped (readLine), matching what a text source does. */
  private def lineIter(br: java.io.BufferedReader): Iterator[String] =
    Iterator.continually(br.readLine()).takeWhile(_ != null)
      .filter(_.nonEmpty)

  /** (archive, member, line) rows for every text member of every zip
    * under the glob. STREAMING: the zip is read through
    * `PortableDataStream.open()` and each member through a lazy line
    * iterator, so task memory is O(io buffer) no matter how large the
    * archive — one task per archive, decompression executor-side. */
  def zipLines(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(pathGlob)
      .flatMap { case (file, stream) =>
        val zin = new ZipInputStream(stream.open())
        val it = Iterator.continually(zin.getNextEntry)
          .takeWhile(_ != null)
          .filterNot(_.isDirectory)
          .flatMap { entry =>
            val name = entry.getName
            // per-entry reader over the shared zip stream: reads hit
            // the entry's own EOF; do NOT close it (that would close
            // the archive stream)
            val br = new java.io.BufferedReader(
              new java.io.InputStreamReader(zin, StandardCharsets.UTF_8))
            lineIter(br).map(line => (file, name, line))
          }
        // close the archive once the lazy traversal is exhausted
        it ++ { zin.close(); Iterator.empty }
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

  /** Gzip single-file expansion → line stream. STREAMING — O(buffer)
    * task memory, like [[zipLines]]. */
  def gzipLines(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(pathGlob)
      .flatMap { case (file, stream) =>
        val gin = new GZIPInputStream(stream.open())
        val br = new java.io.BufferedReader(
          new java.io.InputStreamReader(gin, StandardCharsets.UTF_8))
        lineIter(br).map(line => (file, line)) ++ {
          br.close(); Iterator.empty
        }
      }
      .toDF("archive", "line")
  }

  /** bz2 single-file expansion → line stream (`dwd.py:106` downloads
    * `*.grb.bz2` and `bz2.decompress`es before handing to the GRIB
    * adapter). `decompressConcatenated = true` matches Python's `bz2`
    * on multi-stream files (pbzip2 output). STREAMING — O(buffer)
    * task memory, like [[zipLines]]. */
  def bz2Lines(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(pathGlob)
      .flatMap { case (file, stream) =>
        val bin = new BZip2CompressorInputStream(stream.open(), true)
        val br = new java.io.BufferedReader(
          new java.io.InputStreamReader(bin, StandardCharsets.UTF_8))
        lineIter(br).map(line => (file, line)) ++ {
          br.close(); Iterator.empty
        }
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
    * archive, like [[zipLines]]. Unlike zip/gz/bz2, 7z NEEDS random
    * access (the format stores its entry table at the end and LZMA2
    * folders seek), so the archive is buffered in task memory — the
    * same cost py7zr pays; size 7z inputs accordingly or pre-extract
    * at the adapter boundary. */
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
