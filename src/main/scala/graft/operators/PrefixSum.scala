package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sum — the scale-honest replacement for a
  * `Window.orderBy(...)` with no partition key, which Spark executes
  * as a SINGLE task holding the entire dataset (fine at 60k rows,
  * fatal at 100 TB).
  *
  * Two-phase shape (the classic parallel scan): rows are bucketed by
  * a key derived from the order column; phase 1 computes the running
  * sum WITHIN each bucket (parallel windows); phase 2 computes each
  * bucket's offset — a running sum over the per-bucket totals, which
  * IS a global window but over |buckets| rows (data size / bucket
  * granularity, e.g. millions of rows → thousands of buckets), then
  * broadcast back. Exact for integer values at any partitioning.
  */
object PrefixSum {

  /** Exclusive running sum of `value` in ascending `order` order
    * (first row gets 0), appended as column `out`. `order` must be
    * globally unique (it is the total order); `bucketSize` controls
    * the phase-2 fan-in: buckets = orderValue / bucketSize. */
  def exclusiveCumsum(df: DataFrame, order: Column, value: Column,
      out: String, bucketSize: Long): DataFrame = {
    val bucketed = df.withColumn("_psb", floor(order / bucketSize))
      .withColumn("_psv", value)
    val wIn = Window.partitionBy("_psb").orderBy(order)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wBuckets = Window.orderBy("_psb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("_psb").agg(sum(col("_psv")).as("_pst"))
      .withColumn("_pso", coalesce(sum(col("_pst")).over(wBuckets), lit(0L)))
      .select(col("_psb"), col("_pso"))
    bucketed
      .withColumn("_psi", coalesce(sum(col("_psv")).over(wIn), lit(0L)))
      .join(broadcast(offsets), "_psb")
      .withColumn(out, col("_pso") + col("_psi"))
      .drop("_psb", "_psv", "_psi", "_pso")
  }
}
