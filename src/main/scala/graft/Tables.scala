package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.sources.AdaptiveRead

/** Uniform access to the driver-provided parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's schema-per-dataset namespace
  * (`common/base_crawler.py:20-22` in the reference creates one Postgres
  * schema per crawler); here a "schema" is just a directory of parquet
  * tables and each query receives the directory root.
  *
  * Reads are SCHEMA-ADAPTIVE (see [[graft.sources.AdaptiveRead]]): the
  * contract columns below are normalized to `TimestampType` micros-UTC
  * whatever physical layout the producer last wrote — TIMESTAMP(NANOS)
  * read as raw longs, `timestamp_ntz[us]`, annotated instants, or raw
  * epoch ints. The reference re-infers schema on every read
  * (`entsoe_crawler.py:196-209`); hard-coding one layout here died the
  * day the corpus regenerated, so now the loader observes, then adapts.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Columns contracted to be event-time instants (micros, session-UTC). */
  private val timestampContract: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"))

  /** Columns contracted to be NAIVE timestamps (`timestamp_ntz`) — the
    * date-grained dimensions every query and the DuckDB oracle read as
    * naive values. Normalizing them (instead of passing through raw)
    * is regen insurance: if a future corpus rewrite ships them as
    * DATE, instant timestamps, or epoch ints, the loader absorbs the
    * change instead of re-running the round-8 outage on a different
    * column. */
  private val ntzContract: Map[String, Seq[String]] = Map(
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"))

  /** Measure columns contracted to `double` — decimal-exact
    * aggregation (`ExactAgg`) rounds float→decimal and double→decimal
    * differently, so a producer shipping float32/DECIMAL would change
    * hashes silently without this normalization. */
  private val doubleContract: Map[String, Seq[String]] = Map(
    "events" -> Seq("value"),
    "orders" -> Seq("o_totalprice"),
    "lineitem" -> Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))

  /** Text columns contracted to `string` — a regen shipping them as
    * un-annotated binary would fail every regex/tokenize/shingle
    * expression at analysis time (the LLM-pipeline half of the
    * registry). Bytes are UTF-8 either way; the cast is lossless. */
  private val stringContract: Map[String, Seq[String]] = Map(
    "documents" -> Seq("text", "lang", "source"))

  /** Vector columns contracted to `array<float>` — the type the native
    * similarity kernels and `Array[Float]` encoders require; a
    * float64-shipping regen would otherwise kill every ANN/near-dup
    * query at analysis time. Integer widths are deliberately NOT
    * contracted: Spark's arithmetic promotes them transparently, and
    * pinning a width would desynchronize output dtypes from the
    * oracle's native read of the same file. */
  private val floatArrayContract: Map[String, Seq[String]] = Map(
    "embeddings" -> Seq("embedding"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    AdaptiveRead.readTable(spark, s"$dir/$name.parquet",
      timestampContract.getOrElse(name, Nil),
      ntzContract.getOrElse(name, Nil),
      doubleContract.getOrElse(name, Nil),
      stringContract.getOrElse(name, Nil),
      floatArrayContract.getOrElse(name, Nil))

  /** Incremental read of `events` with the time bound applied in the
    * column's PHYSICAL layout, so it reaches the parquet scan.
    *
    * For the raw-nanos layout, filtering on the converted ts column
    * cannot reach the scan (the `timestamp_micros(ts div 1000)`
    * projection is a pushdown barrier — PLANS.md), so the bound is
    * applied to the raw long, widened so it is sound for truncating
    * division, and the exact predicate re-applied post-conversion. For
    * native timestamp layouts the predicate is expressed on the stored
    * column BEFORE any cast, which Spark translates straight into
    * `PushedFilters` and prunes row groups via parquet min/max stats —
    * at 100 TB that is the difference between reading a day and reading
    * the archive. ScaleSpec asserts the pushdown stays in the plan for
    * both layouts. */
  def loadEventsSince(spark: SparkSession, dir: String,
      sinceMicros: Long): DataFrame = {
    val path = s"$dir/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path)
    raw.schema("ts").dataType match {
      case TimestampType =>
        raw.filter(col("ts") >= expr(s"timestamp_micros(${sinceMicros}L)"))
      case TimestampNTZType =>
        // bound folded to an NTZ literal (session UTC: same micros
        // value) so the predicate sits on the stored attribute and
        // pushes down; the cast to the instant contract happens after
        raw.filter(col("ts") >=
            expr(s"cast(timestamp_micros(${sinceMicros}L) as timestamp_ntz)"))
          .withColumn("ts", col("ts").cast(TimestampType))
      case LongType =>
        val unit = AdaptiveRead.detectEpochUnit(spark, path, "ts")
        // widened raw bound prunes the scan; exact predicate re-applied
        // on the converted column post-scan
        raw.filter(col("ts") >= unit.rawLowerBound(sinceMicros))
          .withColumn("ts", unit.toTimestamp("ts"))
          .filter(col("ts") >= expr(s"timestamp_micros(${sinceMicros}L)"))
      case other => throw new IllegalStateException(
        s"events.ts arrived as $other — not a recognized timestamp layout")
    }
  }

  /** Register every table as a temp view so `spark.sql` can be used with
    * the same table names the DuckDB oracle sees. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      load(spark, dir, n).createOrReplaceTempView(n)
    }

  /** Tables actually PRESENT in a dataset directory (`<name>.parquet`
    * entries) — the standard names first in canonical order, then any
    * user tables sorted. The serving layer discovers instead of
    * assuming [[all]], so a profile can point at any dataset dir. */
  def discover(spark: SparkSession, dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return Nil
    val names = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet")).toSeq
    all.filter(names.contains) ++ names.filterNot(all.contains).sorted
  }

  /** Load ANY table in a dataset dir: contract tables go through the
    * adaptive loader; user tables read as plain parquet. The single
    * rule both the REST table endpoint and view registration share. */
  def loadAny(spark: SparkSession, dir: String, name: String): DataFrame =
    if (all.contains(name)) load(spark, dir, name)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** [[registerAll]] over [[discover]]ed tables (serving path). */
  def registerDiscovered(spark: SparkSession, dir: String): Seq[String] = {
    val names = discover(spark, dir)
    names.foreach(n => loadAny(spark, dir, n).createOrReplaceTempView(n))
    names
  }
}
