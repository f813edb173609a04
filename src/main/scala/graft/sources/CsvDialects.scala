package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Source adapters for the reference's CSV dialects (SURVEY.md §2.1 S1,
  * FIXTURES.md §C). Each returns a plain DataFrame; locale-typed
  * columns (German decimals, composed timestamps) are then parsed with
  * `graft.functions.LocaleFuncs` expressions.
  *
  * The preamble/record-splitting pre-passes run on a `Dataset[String]`
  * line stream — distributed text processing, not a driver read — so
  * the adapters hold at landing-zone scale.
  */
object CsvDialects {

  /** S1 — German CSV: `;` separator, `,` decimal (parse downstream),
    * explicit null markers (`netztransparenz.py:88-95`). */
  def germanCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("sep", ";")
      .option("nullValue", "N.A.")
      .csv(path)

  /** S1 — preamble skip: junk lines before the header
    * (`ladesaeulenregister.py:42` skiprows=10). The line index comes
    * from a zipWithIndex over the text stream; everything stays an RDD/
    * Dataset pipeline. Also drops trailing all-empty lines. */
  def preambleCsv(spark: SparkSession, path: String, skipLines: Int,
      sep: String = ","): DataFrame = {
    import spark.implicits._
    val lines: Dataset[String] = spark.read.textFile(path)
      .rdd.zipWithIndex()
      .filter { case (l, i) => i >= skipLines && l.trim.nonEmpty }
      .map(_._1)
      .toDS()
    spark.read.option("header", "true").option("sep", sep).csv(lines)
  }

  /** S1 — headerless with positional columns
    * (`frequency.py:53-76`). Extra source columns beyond `names` are
    * dropped (the reference drops the optional 3rd column). */
  def headerlessCsv(spark: SparkSession, path: String,
      names: Seq[String], sep: String = ","): DataFrame = {
    val raw = spark.read.option("header", "false").option("sep", sep)
      .csv(path)
    raw.select(raw.columns.take(names.length).map(col): _*)
      .toDF(names: _*)
  }

  /** S10/S1 — multi-record file (`eex.py:85-133`): interleaved typed
    * lines (`ST;…`, `PR;…`) become one DataFrame per record type.
    * One pass over the text stream per requested type; the tag is
    * stripped and the per-type column names applied. */
  def multiRecord(spark: SparkSession, path: String,
      layouts: Map[String, Seq[String]]): Map[String, DataFrame] = {
    import spark.implicits._
    val lines = spark.read.textFile(path)
      .filter(l => !l.startsWith("#") && l.trim.nonEmpty)
    layouts.map { case (tag, cols) =>
      val body = lines.filter(_.startsWith(tag + ";"))
        .map(_.drop(tag.length + 1))
      val df = spark.read.option("header", "false").option("sep", ";")
        .csv(body)
      tag -> df.select(df.columns.take(cols.length).map(col): _*)
        .toDF(cols: _*)
    }
  }

  /** S10 — filesystem-tree scan where path segments carry labels
    * (`eex.py:135-184`, `enet.py:69-92`): read a glob and derive label
    * columns from `input_file_name()`. */
  def treeScan(spark: SparkSession, glob: String,
      labelFromFile: String => String): DataFrame = {
    val extract = udf(labelFromFile)
    spark.read.option("header", "true").csv(glob)
      .withColumn("source_label", extract(input_file_name()))
  }
}
