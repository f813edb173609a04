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
    * splitter keys from a pruned scan of just the order columns, and
    * bucket(key) = #splitters ≤ key — computed by ONE binary search
    * per row against the broadcast sorted splitter array
    * ([[graft.expressions.SearchSortedCount]]): O(log buckets) struct
    * comparisons and constant generated-code size, so the per-row
    * cost no longer grows with the bucket fan-in (the previous
    * when-chain paid O(buckets) comparisons per row — fine at
    * hundreds of buckets, dominant at the ~10⁵ task-sized buckets a
    * 100 TB corpus needs). An explicit bucket is a pure row-local
    * function of the data: any branch that needs per-bucket
    * statistics becomes a narrow pruned aggregation (map-side combine
    * to ≤partitions rows, no data shuffle), and only the branch that
    * orders rows pays a hash exchange on the bucket.
    *
    * Sampling: parquet-backed frames size a Bernoulli fraction from
    * the footer row count (metadata-only); anything else falls back
    * to a per-partition RESERVOIR sample — one pruned pass, bounded
    * driver rows (≤ target + partitions) — instead of the previous
    * `df.count()`, which silently read the corpus twice just to size
    * the fraction. Sample quality affects only balance, never
    * correctness: per-bucket statistics are exact, equal keys always
    * compare identically (no tie-splitting across buckets), and a
    * null-keyed row or splitter degrades to a coarser bucket, still
    * order-consistent with nulls-first. */
  def orderBuckets(df: DataFrame, orderCols: Seq[Column],
      partitions: Int = 0): Column = {
    require(orderCols.nonEmpty, "orderBuckets needs at least one order column")
    val n =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val key = struct(orderCols: _*)
    val keyDf = df.select(key.as("_k"))
    val keyType =
      keyDf.schema.head.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    // 20 samples per bucket, capped at 1e6 total — the same driver-
    // memory bound Spark's own RangePartitioner applies to its
    // splitter sample (core/Partitioner.scala): at the ~1e5-bucket
    // regime an uncapped 20/bucket collect would hold 2M keys on the
    // driver; past the cap, buckets get fewer samples each (balance
    // degrades gracefully, correctness never depends on the sample)
    val target = math.min(n.toLong * 20, 1000000L)
    val sampled: Array[org.apache.spark.sql.Row] =
      graft.sources.ParquetStats.footerRowCount(df.sparkSession, df) match {
        case Some(total) =>
          val fraction =
            if (total <= target) 1.0 else target.toDouble / total
          keyDf.sample(withReplacement = false, fraction, seed = 42).collect()
        case None =>
          // per-partition reservoir: deterministic (xorshift seeded by
          // partition id), one pruned pass, ≤ quota rows per partition
          // on the driver — no count() pre-pass (r17 verdict #5)
          val rdd = keyDf.rdd
          val parts = rdd.getNumPartitions
          if (parts == 0) Array.empty
          else {
            val quota = math.max(1L, target / parts).toInt
            rdd.mapPartitionsWithIndex { (pid, it) =>
              val res = new Array[org.apache.spark.sql.Row](quota)
              var seen = 0L
              var state = 0x9e3779b97f4a7c15L ^ (pid + 1) * 0xbf58476d1ce4e5b9L
              def nextLong(): Long = {
                state ^= state >>> 12; state ^= state << 25
                state ^= state >>> 27; state * 0x2545f4914f6cdd1dL
              }
              while (it.hasNext) {
                val r = it.next()
                if (seen < quota) res(seen.toInt) = r
                else {
                  val j = java.lang.Long.remainderUnsigned(nextLong(), seen + 1)
                  if (j < quota) res(j.toInt) = r
                }
                seen += 1
              }
              res.iterator.take(math.min(seen, quota.toLong).toInt)
            }.collect()
          }
      }
    if (sampled.length < 2 || n <= 1) return lit(0)
    // driver-side: convert the ≤ target+partitions sampled keys to
    // catalyst rows, sort by the SAME interpreted struct ordering the
    // search expression compares with (nulls first), and dedupe so
    // the binary-search count is strictly monotone in the key
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(keyType)
    val ord = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(keyType)
    val internal = sampled.map(r =>
      conv(r.getStruct(0))
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow].copy())
    java.util.Arrays.sort(internal, ord)
    // every (sample.size / n)-th sorted key becomes a splitter
    val picked = (1 until n).map { i =>
      internal(((i.toLong * internal.length) / n).toInt
        .min(internal.length - 1))
    }
    val splitters = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    picked.foreach { r =>
      if (splitters.isEmpty || ord.compare(splitters.last, r) != 0)
        splitters += r
    }
    if (splitters.isEmpty) lit(0)
    else graft.expressions.SearchSortedCount
      .bucketOf(key, splitters.toArray, keyType)
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
