package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Uniform access to the driver-provided parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's schema-per-dataset namespace
  * (`common/base_crawler.py:20-22` in the reference creates one Postgres
  * schema per crawler); here a "schema" is just a directory of parquet
  * tables and each query receives the directory root.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Columns stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. We read them as raw nanosecond longs
    * (`nanosAsLong`) and floor-divide to microseconds — the same
    * truncation DuckDB applies, so oracle comparisons line up. */
  private val nanosCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df0 =
      if (nanosCols.contains(name)) {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$dir/$name.parquet")
      } else spark.read.parquet(s"$dir/$name.parquet")
    nanosCols.getOrElse(name, Nil).foldLeft(df0) { (df, c) =>
      // integer `div` — a double division would lose precision on
      // ~1.7e18 nanosecond values (53-bit mantissa)
      df.withColumn(c,
        org.apache.spark.sql.functions.expr(s"timestamp_micros($c div 1000)"))
    }
  }

  /** Incremental read of `events` with the time bound applied to the
    * RAW nanosecond long, BEFORE the timestamp conversion.
    *
    * The safe path made easy: filtering on the converted ts column
    * cannot reach the parquet scan (the `timestamp_micros(ts div 1000)`
    * projection is a pushdown barrier — PLANS.md), so a naive
    * incremental reader re-scans the full table every run. Filtering on
    * the raw long lands in `PushedFilters` and prunes row groups via
    * parquet min/max stats — at 100 TB that is the difference between
    * reading a day and reading the archive. ScaleSpec asserts the
    * pushdown stays in the plan. */
  def loadEventsSince(spark: SparkSession, dir: String,
      sinceMicros: Long): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    // The scan-pruning raw bound is widened 999 ns so it is sound for
    // truncating division too (pre-epoch rows: `-10500 div 1000` is
    // -10, which a naive `raw >= since*1000` would wrongly drop); the
    // exact predicate re-applies on the converted column post-scan.
    raw.filter(org.apache.spark.sql.functions.col("ts")
        >= sinceMicros * 1000L - 999L)
      .withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      .filter(org.apache.spark.sql.functions.col("ts")
        >= org.apache.spark.sql.functions.expr(
          s"timestamp_micros(${sinceMicros}L)"))
  }

  /** Register every table as a temp view so `spark.sql` can be used with
    * the same table names the DuckDB oracle sees. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      load(spark, dir, n).createOrReplaceTempView(n)
    }
}
