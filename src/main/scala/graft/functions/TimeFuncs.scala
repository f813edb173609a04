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

  /** Register `time_bucket(seconds, ts)` for SQL parity so dashboards'
    * SQL shapes run unchanged through spark.sql. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("time_bucket_s",
      (secs: Long, ts: java.sql.Timestamp) => {
        val epoch = ts.getTime / 1000L
        new java.sql.Timestamp(Math.floorDiv(epoch, secs) * secs * 1000L)
      })
  }
}
