package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Concatenation packing — the training-window layout for LLM
  * pretraining: documents are laid head-to-tail, in a deterministic
  * order, on one token stream that is then paged into fixed
  * `contextLen`-token windows. A window may hold several documents
  * (cross-document attention masking) and a long document spans
  * several windows; unlike padding-per-document (q317's census), the
  * stream wastes zero tokens.
  *
  * Beyond-reference surface (the reference has no training layer);
  * complements q317 (padding waste), q249 (balanced shards), q301
  * (rendezvous shards).
  *
  * Scale: the ONLY global coordination is the token-offset prefix
  * sum, which runs as [[PrefixSum.exclusiveCumsum]] — per-bucket
  * window functions plus a broadcast of tiny bucket offsets; no
  * single-partition global window, no driver loop. Everything after
  * the offset is row-local arithmetic, so the operator pays one
  * data-volume shuffle (the bucket window's) plus a rows-per-bucket
  * aggregate exchange, regardless of corpus size (ExplainAudit:
  * hashEx=2, bnlj=0, cartesian=0).
  */
object SequencePack {

  /** Per-document packing layout. Output columns (input columns are
    * kept): `n_tokens`, `tok_start` (exclusive cumsum in `orderCol`
    * order), `win_start`/`win_end` (first/last window the document
    * touches), `n_windows`, and `head_fill` (how many of the
    * document's tokens land in its first window — the tail of a
    * window boundary). Zero-token inputs are treated as occupying one
    * slot boundary-free (`greatest(n,1)` in the span math) so the
    * span columns stay well-ordered; the standard whitespace token
    * count is never 0.
    */
  def pack(docs: DataFrame, orderCol: Column, nTokens: Column,
      contextLen: Long, bucketSize: Long = 1L << 20): DataFrame = {
    require(contextLen > 0, s"contextLen must be positive: $contextLen")
    val withToks = docs.withColumn("n_tokens", nTokens.cast(LongType))
    withSpanCols(PrefixSum.exclusiveCumsum(withToks, orderCol,
      col("n_tokens"), "tok_start", bucketSize), contextLen)
  }

  /** The window-span columns derived row-locally from `tok_start` /
    * `n_tokens` — shared by every packing entry point. */
  private def withSpanCols(df: DataFrame, contextLen: Long): DataFrame =
    df.withColumn("win_start",
        floor(col("tok_start") / contextLen))
      .withColumn("win_end",
        floor((col("tok_start") + greatest(col("n_tokens"), lit(1L)) -
          1) / contextLen))
      .withColumn("n_windows", col("win_end") - col("win_start") + 1)
      .withColumn("head_fill", least(col("n_tokens"),
        (col("win_start") + 1) * contextLen - col("tok_start")))

  /** [[pack]] for a corpus whose deterministic order is NOT a numeric
    * column — the common real-world case: a pretraining corpus laid
    * out by (shard, path) or (source, doc key). `pack`'s prefix sum
    * buckets by `floor(order / bucketSize)`, which requires a numeric
    * total order (PrefixSum fails fast otherwise); this derives one —
    * a dense 0-based rank over `orderCols`, kept in the output as
    * `pack_rank` (the layout order a data loader replays) — and packs
    * in that order. `orderCols` should be a unique composite (ties
    * get an arbitrary stable-in-run order).
    *
    * FUSED, not globalRank-then-pack: chaining the two operators
    * re-evaluates the whole rank subtree inside the cumsum's offsets
    * branch (audit: a 10-node duplicate subtree). Both the rank and
    * the token offset are per-bucket prefix sums over the SAME
    * [[PrefixSum.orderBuckets]] bucketing, so one window pass yields
    * both: the narrow branch aggregates per-bucket (count, token sum)
    * from a pruned scan — no data shuffle — and the one data-volume
    * hash exchange carries the per-bucket row_number AND running
    * token sum together. `bucketSize` does not apply (the bucket
    * count is the partition fan-in). */
  def packOrdered(docs: DataFrame, orderCols: Seq[Column],
      nTokens: Column, contextLen: Long,
      partitions: Int = 0): DataFrame = {
    require(contextLen > 0, s"contextLen must be positive: $contextLen")
    val bucket = PrefixSum.orderBuckets(docs, orderCols, partitions)
    val withToks = docs.withColumn("n_tokens", nTokens.cast(LongType))
    val wOff = Window.orderBy("_bk")
      .rowsBetween(Window.unboundedPreceding, -1)
    // narrow branch: per-bucket doc counts and token sums from a
    // pruned scan, running-summed over ≤partitions rows
    val offsets = withToks.groupBy(bucket.as("_bk"))
      .agg(count(lit(1)).as("_gc"), sum(col("n_tokens")).as("_gt"))
      .withColumn("_go", coalesce(sum(col("_gc")).over(wOff), lit(0L)))
      .withColumn("_to", coalesce(sum(col("_gt")).over(wOff), lit(0L)))
      .select(col("_bk"), col("_go"), col("_to"))
    val wIn = Window.partitionBy("_bk").orderBy(orderCols: _*)
    val packed = withToks.withColumn("_bk", bucket)
      .withColumn("_gr", row_number().over(wIn).cast("long"))
      .withColumn("_lt", coalesce(sum(col("n_tokens")).over(
        wIn.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(broadcast(offsets), "_bk")
      .withColumn("pack_rank", col("_go") + col("_gr") - 1)
      .withColumn("tok_start", col("_to") + col("_lt"))
      .drop("_bk", "_gr", "_lt", "_go", "_to")
    withSpanCols(packed, contextLen)
  }

  /** Explode a per-document window span `[winStart, winEnd]` into one
    * row per window id, with BOUNDED per-row allocation.
    *
    * The naive `explode(sequence(win_start, win_end))` materializes
    * the whole span as ONE in-memory array before exploding — a
    * single mega-document spanning millions of context windows
    * allocates an n_windows-sized array in one row, the same uncapped
    * data-dependent-allocation class the dedup bomb guards exist to
    * eliminate (r16 ADVICE). Here the span is paged in two levels:
    * an outer sequence of chunk indices (size n_windows/chunk + 1)
    * and an inner sequence of at most `chunk` window ids, so no
    * single allocation exceeds max(chunk, n_windows/chunk + 1)
    * elements. At the default chunk of 4096 the outer array only
    * passes 4096 elements once one document spans >16.7M windows
    * (~8.6B tokens at a 512 context) — and grows as the square root
    * thereafter, where the naive form grows linearly. Output is
    * identical to the naive explode: each window id in the span,
    * exactly once per document. */
  def explodeWindowSpan(df: DataFrame, winStart: Column, winEnd: Column,
      out: String, chunk: Long = 4096L): DataFrame = {
    require(chunk > 0, s"chunk must be positive: $chunk")
    // chunk count via INTEGER division (`div`), not floor(a / b):
    // Spark's Divide promotes longs to Double, and beyond ~2^53
    // windows the rounded quotient can come out one too high — the
    // last _ws0 then exceeds winEnd and sequence(start, stop) with
    // start > stop emits a DESCENDING sequence: duplicate,
    // out-of-span window ids instead of an error (r17 ADVICE)
    df.withColumn("_wsd", winEnd - winStart)
      .withColumn("_wsk",
        explode(sequence(lit(0L), expr(s"_wsd div $chunk"))))
      .withColumn("_ws0", winStart + col("_wsk") * chunk)
      .withColumn(out,
        explode(sequence(col("_ws0"),
          least(winEnd, col("_ws0") + (chunk - 1)))))
      .drop("_wsd", "_wsk", "_ws0")
  }
}
