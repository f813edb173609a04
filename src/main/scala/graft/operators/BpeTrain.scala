package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary learning — the
  * tokenizer-training half of an LLM data pipeline (the reference
  * pipeline stops at token ACCOUNTING; training the tokenizer itself
  * is the natural next verb and follows Sennrich et al. 2016, the
  * public BPE algorithm).
  *
  * Scale shape: ONE corpus-sized shuffle builds the word-frequency
  * table; every merge round after that touches only |vocab|-sized
  * data — adjacent-pair counts are a map-side-combinable hash
  * aggregate over the word table, the winning pair is a 1-row
  * struct-min aggregate (no global sort anywhere), and the merge
  * application is a typed map over the word table. At 100 TB the
  * corpus is read once; the iteration cost is bounded by vocabulary
  * size, not corpus size. Lineage is cut per round (the
  * ConnectedComponents localCheckpoint discipline) so the plan does
  * not grow with merge count.
  *
  * Merge semantics are the standard greedy left-to-right scan: within
  * a run of overlapping matches (e.g. "aaa" under merge (a,a)) the
  * 1st, 3rd, … positions merge — deterministic, and exactly mirrored
  * by the oracle's run-parity window SQL. Ties on pair count break to
  * the lexicographically smallest (left, right).
  */
object BpeTrain {

  final case class WordSyms(word: String, wc: Long, syms: Seq[String])

  final case class MergeRound(
      round: Int, lhs: String, rhs: String, pair_count: Long,
      corpus_syms_after: Long)

  /** Word-frequency table from a (doc_id, text) corpus: the single
    * corpus-sized aggregation. Words split on runs of whitespace. */
  def wordFreq(docs: DataFrame, textCol: String): Dataset[WordSyms] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("wc"))
      .as[(String, Long)]
      .map { case (w, c) => WordSyms(w, c, w.map(_.toString)) }
  }

  /** Greedy left-to-right application of one merge to a symbol
    * sequence: a match at i merges unless position i-1 just merged. */
  def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toSeq
  }

  /** Learn `rounds` merges; returns one row per round with the merged
    * pair, its corpus-weighted count, and the corpus symbol total
    * after applying it (Σ wc · |syms| — pins the merge application
    * itself under the caller's oracle, not just the argmax). */
  def train(docs: DataFrame, textCol: String, rounds: Int)
      : Dataset[MergeRound] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var words = wordFreq(docs, textCol)
    // vocab-sized and hit once per round: keep it pinned
    words = words.localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[MergeRound]
    var r = 1
    while (r <= rounds) {
      // adjacent pairs weighted by word count — |vocab|-bound explode
      val pairs = words.flatMap { w =>
        (0 until w.syms.length - 1).map(i =>
          (w.syms(i), w.syms(i + 1), w.wc))
      }.toDF("a", "b", "wc")
        .groupBy("a", "b").agg(sum("wc").as("cnt"))
      // winner: max count, ties to smallest (a, b) — a 1-row
      // struct-MIN aggregate ((-cnt, a, b) orders exactly that way),
      // never a global ORDER BY over the pair table
      // min(struct) over ZERO rows yields one row with a NULL struct
      // (single-char corpus, or vocabulary fully merged before
      // `rounds` ran out) — stop with a descriptive error instead of
      // letting the tuple decode throw an opaque NPE.
      val winRaw = pairs
        .agg(min(struct((-col("cnt")).as("nc"), col("a"), col("b")))
          .as("w"))
        .select(col("w.a"), col("w.b"), (-col("w.nc")).as("cnt"))
        .head()
      require(!winRaw.isNullAt(0),
        s"BPE round $r: no adjacent pairs left to merge " +
          s"(corpus exhausted after ${r - 1} merges; lower `rounds`)")
      val (wa, wb, wcnt) =
        (winRaw.getString(0), winRaw.getString(1), winRaw.getLong(2))
      val prevWords = words
      words = words
        .map(w => w.copy(syms = applyMerge(w.syms, wa, wb)))
        .localCheckpoint()
      // the new round's table is materialized — drop the old one's
      // blocks now rather than waiting for a GC-driven ContextCleaner
      CacheOps.releaseCheckpoint(prevWords)
      val symsAfter = words
        .select(sum(col("wc") * size(col("syms")))).as[Long].head()
      out += MergeRound(r, wa, wb, wcnt, symsAfter)
      r += 1
    }
    // the result is a driver-built round table — the word-table
    // checkpoint is unreachable from it and can be dropped entirely
    CacheOps.releaseCheckpoint(words)
    spark.createDataset(out.toSeq)
  }

  /** Tokenize the word table with an ordered merge list (inference
    * side of BPE) — map-side over |vocab|, merges applied in learned
    * order. */
  def tokenize(words: Dataset[WordSyms], merges: Seq[(String, String)])
      : Dataset[WordSyms] = {
    import words.sparkSession.implicits._
    words.map { w =>
      var s = w.syms
      merges.foreach { case (a, b) => s = applyMerge(s, a, b) }
      w.copy(syms = s)
    }
  }
}
