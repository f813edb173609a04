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

  /** Order-consistent bucket column over `orderCols` — the explicit
    * replacement for borrowing buckets from a range partitioner.
    *
    * The natural two-branch rank formulation (repartitionByRange
    * feeding both a per-partition count and a per-partition rank)
    * shuffles the corpus TWICE: Spark does not reuse a range exchange
    * across an unpersisted diamond (measured: ReusedExchange=0,
    * rangepartitioning=2 — for the window- AND the partition-id-based
    * variants). So the bucket function is made EXPLICIT: sampled
    * splitter keys (a pruned scan of just the order columns, sample
    * fraction sized from the footer row count — free on parquet), and
    * bucket(key) = #splitters ≤ key via order-consistent struct
    * comparisons. An explicit bucket is a pure row-local function of
    * the data: any branch that needs per-bucket statistics becomes a
    * narrow pruned aggregation (map-side combine to ≤partitions rows,
    * no data shuffle), and only the branch that orders rows pays a
    * hash exchange on the bucket. Sample quality affects only
    * balance, never correctness: per-bucket statistics are exact,
    * equal keys always compare identically (no tie-splitting across
    * buckets), and a null-keyed row or splitter degrades to a coarser
    * bucket, still order-consistent with nulls-first. Per-row cost is
    * O(partitions) struct comparisons — fine for the hundreds-of-
    * buckets regime this targets. */
  def orderBuckets(df: DataFrame, orderCols: Seq[Column],
      partitions: Int = 0): Column = {
    require(orderCols.nonEmpty, "orderBuckets needs at least one order column")
    val n =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val key = struct(orderCols: _*)
    val total = graft.sources.ParquetStats
      .footerRowCount(df.sparkSession, df)
      .getOrElse(df.count())
    val target = n.toLong * 20
    val fraction =
      if (total <= target) 1.0 else target.toDouble / total
    val sampled = df.select(key.as("_k"))
      .sample(withReplacement = false, fraction, seed = 42)
      .orderBy("_k").collect()
    // every (sample.size / n)-th sampled key becomes a splitter
    val splitters =
      if (sampled.length < 2 || n <= 1) Array.empty[org.apache.spark.sql.Row]
      else (1 until n).map { i =>
        sampled(((i.toLong * sampled.length) / n).toInt
          .min(sampled.length - 1))
      }.distinct.toArray
    // each splitter field is cast to its key field's type: a sampled
    // NULL otherwise becomes a VOID-typed literal and the struct
    // comparison fails analysis (caught by the null-key spec)
    val keyTypes = df.select(orderCols: _*).schema.map(_.dataType)
    def structLit(r: org.apache.spark.sql.Row): Column = {
      val s = r.getStruct(0)
      struct(orderCols.indices.map(i =>
        lit(s.get(i)).cast(keyTypes(i))): _*)
    }
    splitters.foldLeft(lit(0)) { (acc, b) =>
      acc + when(key >= structLit(b), 1).otherwise(0)
    }
  }

  /** Dense 0-based global rank in ascending `orderCols` order,
    * appended as `out` — the numeric total order a string/composite-
    * keyed corpus (shard, path, …) needs before [[exclusiveCumsum]]
    * can bucket it. Built on [[orderBuckets]]: ONE data-volume
    * exchange (the per-bucket rank window), a narrow pruned count
    * aggregation, and a broadcast of ≤partitions offsets.
    *
    * The rank is a total order consistent with `orderCols`; ties (if
    * the composite is not unique) are broken arbitrarily within their
    * bucket, so pass a unique composite for a deterministic layout. */
  def globalRank(df: DataFrame, orderCols: Seq[Column],
      out: String, partitions: Int = 0): DataFrame = {
    val bucket = orderBuckets(df, orderCols, partitions)
    val wOff = Window.orderBy("_bk")
      .rowsBetween(Window.unboundedPreceding, -1)
    // narrow branch: scans ONLY the order columns, combines map-side
    // to ≤n rows, running-sums them (a global window over n rows)
    val offsets = df.groupBy(bucket.as("_bk"))
      .agg(count(lit(1)).as("_gc"))
      .withColumn("_go", coalesce(sum(col("_gc")).over(wOff), lit(0L)))
      .select(col("_bk"), col("_go"))
    val wIn = Window.partitionBy("_bk").orderBy(orderCols: _*)
    df.withColumn("_bk", bucket)
      .withColumn("_gr", row_number().over(wIn).cast("long"))
      .join(broadcast(offsets), "_bk")
      .withColumn(out, col("_go") + col("_gr") - 1)
      .drop("_bk", "_gr", "_go")
  }
}
