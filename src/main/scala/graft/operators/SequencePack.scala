package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    PrefixSum.exclusiveCumsum(withToks, orderCol, col("n_tokens"),
        "tok_start", bucketSize)
      .withColumn("win_start",
        floor(col("tok_start") / contextLen))
      .withColumn("win_end",
        floor((col("tok_start") + greatest(col("n_tokens"), lit(1L)) -
          1) / contextLen))
      .withColumn("n_windows", col("win_end") - col("win_start") + 1)
      .withColumn("head_fill", least(col("n_tokens"),
        (col("win_start") + 1) * contextLen - col("tok_start")))
  }
}
