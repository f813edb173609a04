package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.expressions.CosineSimilarity.cosine

/** Embedding similarity search over an `Array[Float]` column.
  *
  * Two-phase design:
  *   1. **Prune** with the native codegen'd [[graft.expressions.CosineSimilarity]]
  *      kernel evaluated inside a broadcast nested-loop join — the
  *      double-precision cosine runs fused in the join loop, so only
  *      surviving pairs ever materialize.
  *   2. **Rescore** survivors with fixed-scale DECIMAL partial sums —
  *      associative, so bit-identical under any partitioning and equal
  *      to the DuckDB oracle.
  * The prune threshold sits 1e-6 below the exact threshold; the double
  * kernel's error is ~1e-12, so phase 1 never drops a true survivor.
  *
  * At 100 TB the same shape holds: broadcast the (always small) query
  * side, or pre-bucket both sides with [[lshBuckets]] and run the
  * nested-loop within buckets only.
  */
object Similarity {

  private val termDec = DecimalType(18, 9)
  private val accDec = DecimalType(28, 9)

  /** Oracle-exact dot product of two float-array columns: per-term
    * double products quantized to DECIMAL(18,9), summed exactly.
    * Round 20: compiled kernel (graft.expressions.DecimalFold) — the
    * HOF form ran interpreted per term; bit-identical semantics pinned
    * by DecimalFoldSpec. */
  def exactDot(a: Column, b: Column): Column =
    graft.expressions.DecimalFold.dot(a, b)

  /** Oracle-exact cosine (decimal dot and norms, double combine). */
  def exactCosine(a: Column, b: Column): Column =
    exactDot(a, b) / (sqrt(exactDot(a, a)) * sqrt(exactDot(b, b)))

  /** Bit-exact identity (`x + 0.0·id = x` for all finite x ≥ 0) that is
    * nondeterministic to the optimizer, pinning the expression where it
    * is written: downstream filters on it cannot be pushed below this
    * point. Used to keep a cheap prune phase and an expensive exact
    * phase in their intended order. */
  private def asNondetBarrier(c: Column): Column =
    c + monotonically_increasing_id() * lit(0.0)

  /** Exact top-k cosine neighbors for every query vector.
    * `queries`/`candidates`: (vec_id, embedding) frames. The query side
    * is broadcast; candidates stream through the fused kernel. */
  def bruteForceTopK(
      queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val parallelism = candidates.sparkSession.sparkContext.defaultParallelism
    val q = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = candidates.select(
      col("vec_id").as("cand_id"), col("embedding").as("ce"))
      .repartition(parallelism)
    val fast = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("cos_fast", cosine(col("qe"), col("ce")))
    // keep a small buffer beyond k, then rescore exactly and re-rank —
    // absorbs any double-vs-decimal ordering jitter at the k boundary
    val wFast = Window.partitionBy("query_id")
      .orderBy(col("cos_fast").desc, col("cand_id"))
    val wExact = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("cand_id"))
    fast
      .withColumn("_rf", row_number().over(wFast))
      .filter(col("_rf") <= k + 3)
      .withColumn("cosine", exactCosine(col("qe"), col("ce")))
      .withColumn("rank", row_number().over(wExact).cast(LongType))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "rank", "cosine")
  }

  /** Hard-negative mining — for each query vector, the k most-SIMILAR
    * candidates carrying a DIFFERENT label (the contrastive-training
    * negatives that actually teach a retriever something; random
    * negatives are trivially far). Same two-phase shape as
    * [[bruteForceTopK]]: the codegen'd kernel prunes inside the
    * broadcast join, a small buffer beyond k absorbs double-ordering
    * jitter at the boundary, decimal rescore re-ranks the survivors
    * exactly. The label inequality rides the join condition, so
    * same-label pairs never leave the fused loop. */
  def hardNegativesTopK(
      queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val parallelism = candidates.sparkSession.sparkContext.defaultParallelism
    val q = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("qe"),
      col("label").as("q_label"))
    val c = candidates.select(
      col("vec_id").as("cand_id"), col("embedding").as("ce"),
      col("label").as("neg_label"))
      .repartition(parallelism)
    val fast = c.join(broadcast(q), col("q_label") =!= col("neg_label"))
      .withColumn("cos_fast", cosine(col("qe"), col("ce")))
    val wFast = Window.partitionBy("query_id")
      .orderBy(col("cos_fast").desc, col("cand_id"))
    val wExact = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("cand_id"))
    fast
      .withColumn("_rf", row_number().over(wFast))
      .filter(col("_rf") <= k + 3)
      .withColumn("cosine", exactCosine(col("qe"), col("ce")))
      .withColumn("rank", row_number().over(wExact).cast(LongType))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "neg_label", "rank", "cosine")
  }

  /** All pairs with exact cosine ≥ threshold (embedding near-dup
    * detection). The kernel runs inside the join condition, so the
    * quadratic phase emits only survivors. */
  def cosinePairsAbove(emb: DataFrame, threshold: Double): DataFrame = {
    val parallelism = emb.sparkSession.sparkContext.defaultParallelism
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
      .repartition(parallelism)
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    a.join(broadcast(b),
        col("id_a") < col("id_b") &&
          cosine(col("ea"), col("eb")) >= threshold - 1e-6)
      // asNondetBarrier: without it Catalyst pushes the exact-cosine
      // filter into the join condition and the expensive decimal rescore
      // runs on all N² pairs instead of the kernel-pruned survivors
      .withColumn("cosine",
        asNondetBarrier(exactCosine(col("ea"), col("eb"))))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Cluster-scoped near-dup pairs (the SemDeDup shape): identical
    * two-phase exact-cosine join to [[cosinePairsAbove]], but pairs
    * only form INSIDE `scope` groups — an equi-join on the scope key,
    * so the quadratic term drops from N² to Σ cluster² and the join
    * SHUFFLES instead of broadcasting the candidate set (this is the
    * 100 TB path; feed it [[KMeans.fitAssign]] clusters or
    * [[lshBuckets]] signatures). Input: (vec_id, embedding, scope). */
  def cosinePairsAboveWithin(emb: DataFrame, scope: String,
      threshold: Double): DataFrame = {
    val a = emb.select(col(scope), col("vec_id").as("id_a"),
      col("embedding").as("ea"))
    val b = emb.select(col(scope), col("vec_id").as("id_b"),
      col("embedding").as("eb"))
    a.as("x")
      .join(b.as("y"),
        col(s"x.$scope") === col(s"y.$scope") &&
          col("id_a") < col("id_b") &&
          cosine(col("ea"), col("eb")) >= threshold - 1e-6)
      .withColumn("cosine",
        asNondetBarrier(exactCosine(col("ea"), col("eb"))))
      .filter(col("cosine") >= threshold)
      .select(col(s"x.$scope").as(scope), col("id_a"), col("id_b"),
        col("cosine"))
  }

  /** Embedding-space decontamination support: the distinct probe ids
    * carrying ANY exact cosine ≥ threshold against the reference set.
    * The reference side is a FIXED benchmark corpus — small by
    * construction — so it broadcasts and the probe side streams
    * through the fused kernel exactly once; same two-phase
    * prune/rescore contract as [[cosinePairsAbove]]. Input frames:
    * (vec_id, embedding). */
  def idsNearAny(probe: DataFrame, refSet: DataFrame,
      threshold: Double): DataFrame = {
    val parallelism =
      probe.sparkSession.sparkContext.defaultParallelism
    val a = probe.select(col("vec_id"), col("embedding").as("pa"))
      .repartition(parallelism)
    val b = refSet.select(col("vec_id").as("ref_id"),
      col("embedding").as("pb"))
    a.join(broadcast(b),
        cosine(col("pa"), col("pb")) >= threshold - 1e-6)
      .withColumn("cosine",
        asNondetBarrier(exactCosine(col("pa"), col("pb"))))
      .filter(col("cosine") >= threshold)
      .select("vec_id").distinct()
  }

  /** Random-hyperplane LSH bucketing: `nBits` sign bits from fixed
    * pseudo-random hyperplanes (deterministic, seeded by dimension
    * index — no RNG state to ship to executors). Vectors that share a
    * bucket signature are candidate neighbors; at scale the exact
    * scoring then runs per-bucket instead of all-pairs. */
  /** Hyperplane weight (h, i): fixed pseudo-random constants — computed
    * at plan-build time so the identical literals can be embedded in an
    * oracle query. */
  def lshWeight(h: Int, dim: Int, i: Int): Double =
    math.sin((h * dim + i + 1).toDouble)

  def lshBuckets(emb: DataFrame, idCol: String, vecCol: String,
      nBits: Int, dim: Int): DataFrame = {
    // One native [[graft.expressions.DotProduct]] kernel per hyperplane:
    // a left-to-right double sum, the same association order the infix
    // SQL oracle parses to, so the sign bits match exactly. (The
    // expression-tree alternative — dim × nBits element_at terms — blows
    // codegen method sizes at 64 dims × 16 bits.)
    val bits = (0 until nBits).map { h =>
      val w = Array.tabulate(dim)(i => lshWeight(h, dim, i))
      val dot = graft.expressions.DotProduct.dot(col(vecCol), lit(w))
      when(dot >= 0, lit("1")).otherwise(lit("0"))
    }
    emb.select(col(idCol), concat(bits: _*).as("bucket"))
  }

  /** Banded-LSH-pruned near-duplicate pairs: candidates share at least
    * one band of `bandBits` consecutive sign bits (OR-amplification over
    * `nBits / bandBits` bands), then survivors are exactly rescored with
    * the decimal cosine and kept at ≥ `threshold`.
    *
    * This is the 100 TB replacement for [[cosinePairsAbove]]'s quadratic
    * broadcast loop: the band join is an equi-join keyed on (band,
    * signature) — it shuffles, it never crosses buckets, and its cost is
    * Σ bucket² instead of N². Recall is the standard
    * 1 − (1 − p^r)^b curve (p = 1 − θ/π); at near-dup thresholds
    * (cos ≥ 0.9) it is ≈ 1. Returned pairs are always a subset of the
    * brute-force result (the rescore is exact). */
  def cosinePairsAboveLsh(emb: DataFrame, threshold: Double,
      nBits: Int, dim: Int, bandBits: Int): DataFrame = {
    require(nBits % bandBits == 0)
    val nBands = nBits / bandBits
    val sig = lshBuckets(emb, "vec_id", "embedding", nBits, dim)
    val bands = sig.select(col("vec_id"),
        explode(array((0 until nBands).map { b =>
          struct(lit(b).as("band"),
            substring(col("bucket"), b * bandBits + 1, bandBits).as("key"))
        }: _*)).as("bk"))
      .select(col("vec_id"), col("bk.band"), col("bk.key"))
    val pairs = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    val ea = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val eb = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    // candidate volume can be large when bands are coarse — prune with
    // the codegen'd kernel first, pay the decimal rescore only on
    // survivors (same two-phase shape as cosinePairsAbove)
    pairs.join(ea, "id_a").join(eb, "id_b")
      .filter(cosine(col("ea"), col("eb")) >= threshold - 1e-6)
      .withColumn("cosine",
        asNondetBarrier(exactCosine(col("ea"), col("eb"))))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Size-thresholded ANN dispatch — the routing layer that keeps the
    * v0 brute-force path from ever running at corpus scale (the same
    * discipline as `SpatialJoin.nearestJoin`): at or below
    * `broadcastThreshold` candidates, exact [[bruteForceTopK]]
    * (broadcast queries, one full scan — optimal for dimension-sized
    * collections); above it, the [[ivfTopK]] cell-probe index on the
    * supplied coarse quantizer. Identical output contract either way
    * — and with `nProbe` ≥ |centroids| the IVF path is exhaustive, so
    * the two branches agree exactly (ScaleSpec-proven). Routing uses
    * the scan-free probe (stats or bounded take —
    * [[graft.sources.ParquetStats.exceedsRows]]), never a count()
    * over the collection being routed. */
  def annTopK(queries: DataFrame, candidates: DataFrame, k: Int,
      centroids: DataFrame, nProbe: Int,
      broadcastThreshold: Long = 100000L): DataFrame =
    if (!graft.sources.ParquetStats.exceedsRows(candidates, broadcastThreshold))
      bruteForceTopK(queries, candidates, k)
    else ivfTopK(candidates, queries, centroids, k, nProbe)

  /** IVF (inverted-file) cell-probe ANN: vectors are assigned to their
    * nearest coarse-quantizer centroid once; a query scores only the
    * vectors in its `nProbe` nearest cells instead of the whole
    * collection.
    *
    * `centroids` is the coarse quantizer — any small (vec_id, embedding)
    * frame; a k-means fit in production, a deterministic data sample
    * here. Both assignment and scoring use the oracle-exact decimal
    * cosine so the whole index is DuckDB-checkable; at 100 TB the
    * assignment would use the codegen'd [[graft.expressions.CosineSimilarity]]
    * kernel and the structure is unchanged: centroids broadcast, one
    * shuffle keyed on cell id, per-cell scan instead of full scan. */
  def ivfTopK(emb: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nProbe: Int): DataFrame = {
    val cent = centroids.select(
      col("vec_id").as("cid"), col("embedding").as("cemb"))
    // nearest cells via the two-phase pattern of bruteForceTopK: fast
    // codegen'd kernel ranks all centroids, only the top n+3 pay the
    // decimal rescore — the +3 buffer absorbs the ~1e-7 kernel-vs-
    // decimal jitter at the rank boundary, keeping the final ranking
    // oracle-exact.
    def nearestCells(side: DataFrame, id: String, vec: String, n: Int) = {
      val wFast = Window.partitionBy(id)
        .orderBy(col("_cfast").desc, col("cid"))
      val wExact = Window.partitionBy(id)
        .orderBy(col("_ccos").desc, col("cid"))
      side.join(broadcast(cent))
        .withColumn("_cfast", cosine(col(vec), col("cemb")))
        .withColumn("_cfrn", row_number().over(wFast))
        .filter(col("_cfrn") <= n + 3)
        .withColumn("_ccos",
          asNondetBarrier(exactCosine(col(vec), col("cemb"))))
        .withColumn("_crn", row_number().over(wExact))
        .filter(col("_crn") <= n)
        .drop("_cfast", "_cfrn", "_ccos", "_crn", "cemb")
    }
    val assigned = nearestCells(
      emb.select(col("vec_id").as("cand_id"), col("embedding").as("ce")),
      "cand_id", "ce", 1)
    val probes = nearestCells(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qe")),
      "query_id", "qe", nProbe)
    val wFast = Window.partitionBy("query_id")
      .orderBy(col("_fast").desc, col("cand_id"))
    val wExact = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("cand_id"))
    probes.join(assigned, Seq("cid"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("_fast", cosine(col("qe"), col("ce")))
      .withColumn("_frn", row_number().over(wFast))
      .filter(col("_frn") <= k + 3)
      .withColumn("cosine",
        asNondetBarrier(exactCosine(col("qe"), col("ce"))))
      .withColumn("rank", row_number().over(wExact).cast(LongType))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "rank", "cosine")
  }

  /** Product-quantization ANN with asymmetric-distance scoring
    * (IVF-PQ's compression half): each vector is encoded as `m`
    * sub-codes — the nearest codeword per subspace under squared-L2 —
    * and a query scores a candidate as the sum of its per-subspace
    * query→codeword distances (ADC): m table lookups instead of a
    * `dim`-long scan per pair, and the collection stores m bytes per
    * vector instead of 4·dim.
    *
    * `codebookSrc` is the codebook seed — any small (vec_id, embedding)
    * frame whose sub-vectors become the codewords (k-means-trained in
    * production, a deterministic data sample here; same convention as
    * [[ivfTopK]]'s coarse quantizer). All distances are decimal-exact
    * (per-term double product, DECIMAL partial sums; ADC terms rounded
    * to DECIMAL(28,12) before the final sum so the total is
    * order-free), making encode, lookup tables and ranking
    * DuckDB-checkable end-to-end. At 100 TB the encode step would use a
    * codegen'd kernel; the structure — codebook broadcast, one
    * shuffle on (vec, sub) for encode, lookup-table join on (sub,
    * code) — is unchanged. */
  def pqTopK(emb: DataFrame, queries: DataFrame, codebookSrc: DataFrame,
      m: Int, dim: Int, k: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    // long form with 0-based subspace id
    def explodeSub(df: DataFrame, id: String, e: String) =
      df.select(col("vec_id").as(id),
          posexplode(col("embedding")).as(Seq("pos", "val")))
        .select(col(id), col("pos"),
          col("val").cast("double").as(e),
          floor(col("pos") / subDim).cast("int").as("sub"))
    // pos determines the subspace, so the codeword side drops its copy
    val cw = explodeSub(codebookSrc, "cid", "ce").drop("sub")
    // squared-L2 to every codeword, per (vector, subspace): position
    // equality implies subspace equality, so the join key is pos alone
    def subDistances(side: DataFrame, id: String): DataFrame =
      explodeSub(side, id, "e")
        .join(broadcast(cw), Seq("pos"))
        .groupBy(col(id), col("sub"), col("cid"))
        .agg(sum(((col("e") - col("ce")) * (col("e") - col("ce")))
          .cast(DecimalType(18, 9))).cast(DoubleType).as("d"))
    // Encode is the collection-sized stage, so it runs two-phase like
    // bruteForceTopK: a plain double aggregation prunes each (vector,
    // subspace) to the codewords within 1e-6 of the minimum — the
    // double-vs-decimal divergence is ≤ subDim·5e-10 (per-term
    // quantization) + O(1e-13) (summation order), so the decimal argmin
    // winner always survives — then only survivors (≈1 codeword per
    // group instead of all |codebook|) pay the BigDecimal-backed exact
    // rescore that makes codes oracle-checkable.
    val fastDist = explodeSub(emb, "cand_id", "e")
      .join(broadcast(cw), Seq("pos"))
      .groupBy(col("cand_id"), col("sub"), col("cid"))
      .agg(sum((col("e") - col("ce")) * (col("e") - col("ce"))).as("_fd"))
    val wMin = Window.partitionBy("cand_id", "sub")
    val nearMin = fastDist
      .withColumn("_fmin", min(col("_fd")).over(wMin))
      .filter(col("_fd") <= col("_fmin") + 1e-6)
      .select("cand_id", "sub", "cid")
    val cwR = cw.select(col("pos").as("_cpos"), col("cid").as("_ccid"),
      col("ce"))
    val rescored = explodeSub(emb, "cand_id", "e")
      .join(nearMin, Seq("cand_id", "sub"))
      .join(broadcast(cwR),
        col("pos") === col("_cpos") && col("cid") === col("_ccid"))
      .groupBy(col("cand_id"), col("sub"), col("cid"))
      .agg(sum(((col("e") - col("ce")) * (col("e") - col("ce")))
        .cast(DecimalType(18, 9))).cast(DoubleType).as("d"))
    // argmin as a lexicographic struct-min — an aggregate with map-side
    // partials instead of a second sort+exchange for a row_number
    // window; (d asc, cid asc) tie-break is identical
    val codes = rescored
      .groupBy("cand_id", "sub")
      .agg(min(struct(col("d"), col("cid"))).as("_m"))
      .select(col("cand_id"), col("sub"), col("_m.cid").as("cid"))
    // |queries|×m×|codebook| rows — a probe set by construction, so the
    // lookup table broadcasts; the collection-sized codes never shuffle
    val qd = subDistances(queries, "query_id")
    val wRank = Window.partitionBy("query_id")
      .orderBy(col("adc_dist"), col("cand_id"))
    codes.join(broadcast(qd), Seq("sub", "cid"))
      .filter(col("query_id") =!= col("cand_id"))
      .groupBy("query_id", "cand_id")
      .agg(sum(col("d").cast(DecimalType(28, 12)))
        .cast(DoubleType).as("adc_dist"))
      .withColumn("rank", row_number().over(wRank).cast(LongType))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "rank", "adc_dist")
  }

  /** ±1 sign for the Johnson–Lindenstrauss projection matrix, derived
    * from the parity of md5("rp|j|i")'s first hex digit — any engine
    * with md5 reproduces the identical matrix, so the projection is
    * oracle-checkable without shipping weights. */
  def jlSign(j: Int, i: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = (md.digest(s"rp|$j|$i".getBytes("UTF-8"))(0) >> 4) & 0xf
    if (d % 2 == 0) 1 else -1
  }

  /** Q2.30 fixed-point scale for [[randomProject]]: float32 terms
    * scaled by 2^30 floor to exact longs, so sums are integer-exact
    * and 64 unit-magnitude terms stay far inside 2^53 for the final
    * double division. */
  val JlScale = 1073741824.0 // 2^30

  /** Johnson–Lindenstrauss random projection: compress `dim`-d float
    * vectors to `outDims` coordinates against the md5-derived ±1 sign
    * matrix (Achlioptas 2003's database-friendly projection — ±1
    * entries preserve pairwise distances within the JL bound, no
    * gaussian sampling needed). Terms are fixed-point exact:
    * floor(double(e)·2^30·s) summed as longs — floor (not cast) on
    * both engines, because SQL engines ROUND on double→int casts
    * while the JVM truncates — so projections and their sign-bit
    * sketch hash-match any engine. Measured 4× faster than the
    * DECIMAL(18,9) formulation at sf0.1.
    *
    * Scale shape: ONE explode shuffle; all outDims projections in ONE
    * map-side-combinable hash aggregate (sign lookup is a
    * literal-array element_at — codegen'd, no join, no outDims× row
    * blowup; measured 2.5 s → 0.6 s vs the broadcast-join form). */
  def randomProject(emb: DataFrame, idCol: String, vecCol: String,
      outDims: Int, dim: Int): DataFrame = {
    val aggs = (0 until outDims).map { j =>
      val signsJ = lit(Array.tabulate(dim)(i => jlSign(j, i).toLong))
      sum(floor(col("e").cast(DoubleType) * JlScale *
        element_at(signsJ, col("pos") + 1))).as(s"p$j")
    }
    val wide = emb
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("pos", "e")))
      .groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
    val cols = (0 until outDims).map(j =>
      struct(lit(j.toLong).as("j"),
        (col(s"p$j") / JlScale).as("proj"),
        (col(s"p$j") > 0).as("bit")))
    wide
      .select(col(idCol), explode(array(cols: _*)).as("o"))
      .select(col(idCol), col("o.j"), col("o.proj"), col("o.bit"))
  }
}
