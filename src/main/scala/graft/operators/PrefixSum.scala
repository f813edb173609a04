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
    // fail fast on a non-numeric order: the bucket key is
    // floor(order / bucketSize), which on a string column would
    // silently produce NULL buckets (one giant "bucket", wrong sums)
    // instead of an error. A path/shard-ordered corpus derives a
    // numeric rank first — see [[globalRank]] /
    // [[SequencePack.packOrdered]].
    val orderType = df.select(order).schema.head.dataType
    require(orderType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"exclusiveCumsum order column must be numeric, got $orderType — " +
        "derive a numeric rank first (PrefixSum.globalRank or " +
        "SequencePack.packOrdered)")
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

  /** Dense 0-based global rank in ascending `orderCols` order,
    * appended as `out` — the numeric total order a string/composite-
    * keyed corpus (shard, path, …) needs before [[exclusiveCumsum]]
    * can bucket it.
    *
    * Same two-phase scale shape as the cumsum, with the range
    * partitioner supplying the buckets: rows are range-partitioned on
    * `orderCols` (distributed sampling picks the boundaries; equal
    * keys always land in one partition), ranked WITHIN each partition
    * by a parallel window, and offset by the running sum of
    * per-partition counts — a global window over |partitions| rows,
    * broadcast back. No single-task global window, no zipWithIndex
    * re-partitioning round-trip, no driver loop.
    *
    * The rank is a total order consistent with `orderCols`; ties (if
    * the composite is not unique) are broken arbitrarily within their
    * partition, so pass a unique composite for a deterministic
    * layout. */
  def globalRank(df: DataFrame, orderCols: Seq[Column],
      out: String, partitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "globalRank needs at least one order column")
    val n =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // ONE data-volume exchange: the range repartition. The local rank
    // is NOT a Window.partitionBy(partition id) — that would re-
    // shuffle the whole corpus by a key that already equals its
    // physical partition (measured: it doubled q328's shuffle volume
    // and left an 11-node duplicate subtree in the audit). Instead a
    // partition-local sort (no exchange) plus
    // monotonically_increasing_id, whose (partition << 33 | row)
    // layout makes `mid - min(mid per partition)` exactly the local
    // row index; per-partition counts and min-mids are a partial-
    // aggregate exchange of |partitions| tiny rows, running-summed
    // (a global window over n rows) and broadcast back. Duplicate
    // evaluation of the two branches is safe: range boundaries are
    // deterministically sampled, the local sort is total on a unique
    // composite, and min(mid)/count are tie-order-invariant.
    val parted = df.repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("_grp", spark_partition_id())
      .withColumn("_mid", monotonically_increasing_id())
    val wOff = Window.orderBy("_grp")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy("_grp")
      .agg(count(lit(1)).as("_gc"), min(col("_mid")).as("_gm"))
      .withColumn("_go", coalesce(sum(col("_gc")).over(wOff), lit(0L)))
      .select(col("_grp"), col("_gm"), col("_go"))
    parted
      .join(broadcast(offsets), "_grp")
      .withColumn(out, col("_go") + (col("_mid") - col("_gm")))
      .drop("_grp", "_mid", "_gm", "_go")
  }
}
