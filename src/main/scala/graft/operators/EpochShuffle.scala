package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic epoch shuffling — the data-loader permutation for
  * multi-epoch pretraining, computed WITHOUT shuffling any data.
  *
  * A training run revisits the corpus every epoch in a fresh
  * "random" order that must be (a) a true permutation — every doc
  * exactly once, (b) reproducible from (seed, epoch) alone for
  * restartability, and (c) cheap at 100 TB. Materializing
  * `orderBy(rand(seed))` is a full global sort of the corpus per
  * epoch; this instead uses the classic affine bijection on a dense
  * index domain: `pos = (a·idx + b) mod n` with gcd(a, n) = 1 is an
  * exact permutation of [0, n), so every document's epoch position —
  * and therefore its batch id — is ROW-LOCAL arithmetic: zero
  * shuffle, zero sort, nothing moves until a consumer groups by
  * batch. The multiplier is a fixed large prime (a coprime stride
  * walks the corpus far from arrival order); the offset rotates with
  * the epoch so epochs differ. An affine walk is weaker than a
  * cryptographic permutation (it has a constant stride structure);
  * for loader-grade decorrelation of arrival order it is the
  * standard tool; [[assignFeistel]] offers the keyed, stride-free
  * permutation behind the same contract for sampling-sensitive
  * consumers (ablations, data-order studies).
  *
  * Beyond-reference surface (the reference has no training layer);
  * complements q326/q328 (packing), q249/q301 (shards), q100 (epoch
  * mixture). Reference behavior studied at
  * NOWUM/open-energy-data-server (no equivalent operator).
  */
object EpochShuffle {

  /** Default multiplier: prime, far from any power of two, and small
    * enough that a·idx stays in Long for corpora under ~9.2e12 docs. */
  val DefaultA = 1000003L

  /** Epoch-`epoch` position and batch id for each row, appended as
    * `epoch_pos` / `batch_id`. `idx` must be a DENSE index in
    * [0, n) — the natural doc_id of an ingested corpus, or a
    * [[PrefixSum.globalRank]] for anything else (same contract as
    * SequencePack, same remedy). gcd(a, n) = 1 is REQUIRED for the
    * bijection and checked here; with the default prime multiplier it
    * only fails when n is a multiple of that prime, in which case
    * pass e.g. a+2's next coprime. */
  def assign(df: DataFrame, idx: Column, n: Long, epoch: Int,
      batchSize: Long, a: Long = DefaultA): DataFrame = {
    require(n > 0, s"corpus size must be positive: $n")
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    require(BigInt(a).gcd(BigInt(n)) == 1,
      s"multiplier $a shares a factor with corpus size $n — the affine " +
        "map would not be a bijection; pick a coprime multiplier")
    // the guard must bound a*(n-1) + b for b up to n-1, not just
    // a*(n-1): at the extreme boundary a*idx + b could pass
    // Long.MaxValue and Spark's signed % would yield a NEGATIVE
    // epoch_pos, silently breaking the bijection (r17 ADVICE)
    require(a > 0 && a <= (Long.MaxValue - (n - 1)) / math.max(n - 1, 1),
      s"a*idx + b would overflow Long for a=$a, n=$n")
    val b = java.lang.Long.remainderUnsigned(
      // epoch offset: a second prime keeps consecutive epochs'
      // offsets far apart; the exact value is immaterial, only
      // determinism and epoch-distinctness matter
      epoch.toLong * 7919L, n)
    df.withColumn("epoch_pos", (lit(a) * idx + lit(b)) % n)
      // integer division, NOT floor(x / y): Spark's `/` on longs is
      // double division, lossy past 2^53 while epoch_pos ranges up to
      // n-1 ≤ 2^62 (the explodeWindowSpan rounded-quotient class; the
      // oracle rounds identically so verification can't catch it)
      .withColumn("batch_id", expr(s"epoch_pos div ${batchSize}L"))
  }

  /** [[assign]] with a 3-round Feistel permutation instead of the
    * affine map (r17 verdict #7): the affine walk's constant stride
    * means batch composition correlates with doc_id arithmetic —
    * fine for loader-grade decorrelation, visible to a
    * sampling-sensitive ablation. The Feistel network over the
    * smallest even-bit domain 2^(2h) ≥ n, with cycle-walking for
    * non-power-of-4 n, is an exact keyed bijection of [0, n) with no
    * arithmetic structure, still row-local, still ZERO shuffle
    * (expected walk length ≤ 4 re-permutes;
    * [[graft.expressions.FeistelPermute]]). Same contract as
    * [[assign]]: `idx` must be dense in [0, n). n ≤ 2^62 so every
    * intermediate stays below 2^63 — exactly replayable on signed
    * BIGINT SQL (the q331 oracle replays the walk as a recursive
    * CTE). */
  def assignFeistel(df: DataFrame, idx: Column, n: Long, epoch: Int,
      batchSize: Long, seed: Long = 42L): DataFrame = {
    require(n > 0, s"corpus size must be positive: $n")
    require(n <= (1L << 62), s"corpus size exceeds the 2^62 domain: $n")
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    var half = 1
    while ((1L << (2 * half)) < n) half += 1
    // 16-bit round keys from (seed, epoch): the bound keeps the
    // round multiply under 2^63 (see FeistelPermute); the exact
    // derivation is immaterial beyond determinism and distinctness —
    // it is REPLICATED LITERALLY in the q331 oracle SQL
    val keys = Array.tabulate(3) { i =>
      ((epoch + 1).toLong * 7919L + seed * 104729L +
        (i + 1).toLong * 40503L) & 0xFFFFL
    }
    df.withColumn("epoch_pos",
        graft.expressions.FeistelPermute.permute(idx.cast("long"), n,
          half, keys.toIndexedSeq))
      // integer division — same 2^53 rationale as [[assign]]
      .withColumn("batch_id", expr(s"epoch_pos div ${batchSize}L"))
  }
}
