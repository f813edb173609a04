package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Time-series helpers mirroring TimescaleDB's `time_bucket` and the
  * Grafana `$__timeGroup` macro — the dominant query-side operator in the
  * reference (SURVEY.md §2.5 A2: `entsoe.json:147`, `refit.json:111`,
  * `resample("1h")` in `client_export_examples.md:28`).
  */
object TimeFuncs {

  /** Truncate `ts` down to a fixed-width bucket of `seconds`.
    * Pure arithmetic on the epoch — codegen-friendly, no UDF, and
    * identical semantics to `time_bucket(INTERVAL, ts)` for
    * origin-aligned buckets. */
  def timeBucket(seconds: Long, ts: Column): Column =
    timestamp_seconds(floor(unix_timestamp(ts) / seconds) * seconds)

  /** Common calendar buckets delegate to date_trunc (also codegen'd,
    * and DuckDB-parity for the oracle). */
  def timeBucket(unit: String, ts: Column): Column = date_trunc(unit, ts)

  /** Postgres/TimescaleDB interval literal → seconds: both the spaced
    * form the reference's refit dashboard uses (`'1 hour'`,
    * `'15 minutes'`) and the terse Grafana form (`'900s'`, `'15m'`). */
  def pgIntervalSeconds(interval: String): Long = {
    val m = "^(\\d+)\\s*([A-Za-z]+)$".r
      .findFirstMatchIn(interval.trim)
      .getOrElse(throw new IllegalArgumentException(
        s"unparseable interval: '$interval'"))
    val n = m.group(1).toLong
    m.group(2).toLowerCase match {
      case "ms" | "millisecond" | "milliseconds" => math.max(1L, n / 1000)
      case "s" | "sec" | "secs" | "second" | "seconds" => n
      case "m" | "min" | "mins" | "minute" | "minutes" => n * 60
      case "h" | "hour" | "hours" => n * 3600
      case "d" | "day" | "days" => n * 86400
      case "w" | "week" | "weeks" => n * 604800
      case u => throw new IllegalArgumentException(s"unknown unit: $u")
    }
  }

  /** Register `time_bucket_s(seconds, ts)` (macro-expansion target) and
    * TimescaleDB-style `time_bucket('1 hour', ts)` (called DIRECTLY by
    * the reference's refit dashboard rawSql) so dashboards' SQL shapes
    * run unchanged through spark.sql. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("time_bucket_s",
      (secs: Long, ts: java.sql.Timestamp) => {
        val epoch = ts.getTime / 1000L
        new java.sql.Timestamp(Math.floorDiv(epoch, secs) * secs * 1000L)
      })
    spark.udf.register("time_bucket",
      (interval: String, ts: java.sql.Timestamp) => {
        val secs = pgIntervalSeconds(interval)
        val epoch = ts.getTime / 1000L
        new java.sql.Timestamp(Math.floorDiv(epoch, secs) * secs * 1000L)
      })
  }
}
