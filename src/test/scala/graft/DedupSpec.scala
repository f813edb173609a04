package graft

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "spark window merge sort hash join filter group order scan " +
      "table row batch stream value key small fast slow data"

  private def docs = Seq(
    (0L, base),
    (1L, base + " extra"), // near-dup of 0 (shares almost all shingles)
    (2L, "completely different words about cats dogs birds fish " +
      "lions tigers bears wolves foxes deer moose elk bison goats"))
    .toDF("doc_id", "text")

  test("ngramJaccardPairs: near-dup pair scores high, disjoint absent") {
    val pairs = Dedup.ngramJaccardPairs(docs, 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) > 0.8)
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)))
  }

  test("minHashLsh surfaces the planted near-dup with high estimate") {
    val cand = Dedup.minHashLsh(docs, 3, 8, 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(cand.contains((0L, 1L)) && cand((0L, 1L)) >= 0.75)
    assert(!cand.contains((0L, 2L)))
  }

  test("minHash signature stable across partitioning") {
    val one = Dedup.minHashSignatures(
      Dedup.shingleSets(docs.repartition(1), 3), 8).orderBy("doc_id")
    val four = Dedup.minHashSignatures(
      Dedup.shingleSets(docs.repartition(4), 3), 8).orderBy("doc_id")
    assert(one.collect().toSeq == four.collect().toSeq)
  }

  // ---- skew guards (VERDICT r3: wire SkewJoin/df-cap into dedup) ----

  test("ngramJaccardPairs df-cap drops hot-shingle pairs, keeps real near-dups") {
    // 40 docs all sharing ONE boilerplate shingle ("common header text")
    // plus unique tails, and a planted near-dup pair (100, 101).
    val hot = (0 until 40).map { i =>
      (i.toLong, s"common header text unique$i tail$i word$i")
    }
    val nd = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "alpha beta gamma delta epsilon zeta eta iota"))
    val corpus = (hot ++ nd).toDF("doc_id", "text")
    // uncapped: the hot shingle alone pairs all 40 docs → ≥ C(40,2) pairs
    val uncapped = Dedup.ngramJaccardPairs(corpus, 3).count()
    assert(uncapped >= 40L * 39 / 2)
    // capped at df≤8: boilerplate-only pairs vanish; the near-dup
    // pair survives with its jaccard over the capped universe
    val capped = Dedup.ngramJaccardPairs(corpus, 3, maxDocFreq = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(capped.contains((100L, 101L)) && capped((100L, 101L)) > 0.5)
    assert(capped.keys.forall { case (a, b) => a >= 100L && b >= 100L },
      s"boilerplate-only pairs leaked through the cap: ${capped.keys}")
    // the reducer bound the cap buys: no shingle group wider than cap
    // remains in the capped pair universe (Σ f² per key ≤ cap²)
    assert(uncapped > capped.size)
  }

  test("minHashLsh bucket-width cap skips degenerate clusters, keeps pairs") {
    // 30 IDENTICAL docs (every band bucket has width 30 — the
    // boilerplate-cluster degenerate case) with vocabulary disjoint
    // from the near-dup pair, so the pair's buckets stay narrow. The
    // pair itself is the (base, base+" extra") duo the LSH test above
    // already proves collides in ≥1 band.
    val cloneText = "completely different words about cats dogs birds " +
      "fish lions tigers bears wolves foxes deer moose elk bison goats"
    val clones = (0 until 30).map(i => (i.toLong, cloneText))
    val nd = Seq((100L, base), (101L, base + " extra"))
    val corpus = (clones ++ nd).toDF("doc_id", "text")
    val uncapped = Dedup.minHashLsh(corpus, 3, 8, 4).count()
    assert(uncapped >= 30L * 29 / 2) // clone cluster is quadratic
    val capped = Dedup.minHashLsh(corpus, 3, 8, 4, maxBucketWidth = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // clone-cluster buckets (width 30 or 32 > 10) are skipped wholesale;
    // the near-dup pair shares its own narrow buckets and survives
    assert(capped.contains((100L, 101L)))
    assert(capped.forall { case (a, b) => a >= 100L || b >= 100L },
      s"oversized-bucket pairs leaked: $capped")
  }

  test("caps above all frequencies leave results bit-identical") {
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_a", "doc_b").collect().toSeq
    assert(norm(Dedup.ngramJaccardPairs(docs, 3)) ==
      norm(Dedup.ngramJaccardPairs(docs, 3, maxDocFreq = 1 << 20)))
    assert(norm(Dedup.minHashLsh(docs, 3, 8, 4)) ==
      norm(Dedup.minHashLsh(docs, 3, 8, 4, maxBucketWidth = 1 << 20)))
  }

  test("dupSpans finds maximal shared spans at any offset, incl. intra-doc") {
    val common = "one two three four five six seven eight"
    val spanDocs = Seq(
      (0L, s"x1 x2 $common y1 y2"),    // shared run at word offset 2
      (1L, s"z1 $common w1 w2 w3"),    // same run at word offset 1
      (2L, "all unique words here with nothing repeated anywhere at all"),
      (3L, "p q r s t u1 u2 p q r s t")) // 5-word run repeated WITHIN one doc
      .toDF("doc_id", "text")
    val spans = Dedup.dupSpans(spanDocs, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // docs 0/1: exactly the 8-word common run, merged into ONE maximal
    // span each despite being 4 overlapping duplicated 5-grams
    // doc 3: the intra-doc repeat yields two disjoint 5-word spans
    assert(spans == Set(
      (0L, 2L, 9L, 8L), (1L, 1L, 8L, 8L),
      (3L, 0L, 4L, 5L), (3L, 7L, 11L, 5L)))
  }

  test("bestCopyPerGroup keeps highest score, min id on ties, singletons self") {
    val rows = Seq(
      ("g1", 10L, 1L), ("g1", 90L, 2L), ("g1", 90L, 3L), // tie at 90 → id 2
      ("g2", 5L, 7L),                                    // singleton
      ("g3", -4L, 9L), ("g3", -2L, 8L))                  // negatives fine
      .toDF("fp", "score", "doc_id")
    val out = Dedup.bestCopyPerGroup(rows, "fp", "score", "doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("keeper_id"))).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 7L -> 7L,
      9L -> 8L, 8L -> 8L))
  }

  test("jaccardPrefixFiltered: equals exact ≥ 1/2, and the prefix prunes") {
    // equivalence: same pairs and values as the full inverted-index
    // join filtered at the threshold
    val exact = Dedup.ngramJaccardPairs(docs, 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .filter(_._2 >= 0.5).toMap
    val pf = Dedup.jaccardPrefixFiltered(docs, 3, 1, 2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5))).toMap
    assert(pf == exact && pf.nonEmpty)
    // pruning: 6 docs share ONE common shingle (df=6) and are unique
    // otherwise — every pair collides in the inverted index (15
    // pairs) but none can reach J ≥ 1/2, and the rarity-ordered
    // prefix (3 of 5 shingles, all df=1) generates ZERO candidates
    val pruneDocs = (0 until 6).map(i =>
      (i.toLong, s"alpha beta gamma u${i}a u${i}b u${i}c u${i}d"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingleSets(pruneDocs, 3)
    val fullCollisions = sh.as("a").join(sh.as("b"),
      $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id").distinct().count()
    assert(fullCollisions == 15L)
    val pref = Dedup.prefixShingles(sh, 1, 2)
    val prefCollisions = pref.as("a").join(pref.as("b"),
      $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id").count()
    assert(prefCollisions == 0L)
    assert(Dedup.jaccardPrefixFiltered(pruneDocs, 3, 1, 2).count() == 0L)
  }

  test("derivativeScores: repeated grams raise the rate, unique docs score 0") {
    val common = "one two three four five"
    val d = Seq(
      (0L, s"$common a1 a2 a3"),   // shares the 5-gram with doc 1
      (1L, s"b1 $common b2 b3"),
      (2L, "c1 c2 c3 c4 c5 c6 c7")) // all grams unique
      .toDF("doc_id", "text")
    val out = Dedup.derivativeScores(d, 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(0L) == ((4L, 1L))) // 4 grams, 1 repeated (the common run)
    assert(out(1L) == ((4L, 1L)))
    assert(out(2L) == ((3L, 0L)))
  }

  test("stripDupSpans keeps the canonical occurrence, rebuilds the rest") {
    val common = "one two three four five six seven eight"
    val spanDocs = Seq(
      (0L, s"x1 x2 $common y1 y2"),     // canonical owner (lowest doc_id)
      (1L, s"z1 $common w1 w2 w3"),     // loses the span
      (3L, "p q r s t u1 u2 p q r s t"), // intra-doc: first kept, second stripped
      (4L, "tiny doc"))                  // < k words: verbatim passthrough
      .toDF("doc_id", "text")
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val out = Dedup.stripDupSpans(spanDocs, 5).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == ((md5(s"x1 x2 $common y1 y2"), 12L, 0L)))
    assert(out(1L) == ((md5("z1 w1 w2 w3"), 4L, 8L)))
    assert(out(3L) == ((md5("p q r s t u1 u2"), 7L, 5L)))
    assert(out(4L) == ((md5("tiny doc"), 2L, 0L)))
  }

  test("simHash: identical docs share signature, near-dups are close") {
    val sigs = Dedup.simHash(docs, 32).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def hamming(a: String, b: String) =
      a.zip(b).count { case (x, y) => x != y }
    assert(sigs(0L).length == 32)
    // near-dup distance is noisy on 20-token docs (many bit-sums sit at
    // ±1), so assert the relative ordering, not a tight absolute bound
    assert(hamming(sigs(0L), sigs(1L)) <= 12)
    assert(hamming(sigs(0L), sigs(2L)) > hamming(sigs(0L), sigs(1L)))
  }

  test("label propagation separates bridged communities CC would merge") {
    import spark.implicits._
    // two triangles joined by one bridge edge: a single weakly
    // connected component, but two dense communities
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L),
      (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L), (7L, 8L))
      .toDF("u", "v")
    val nodes = (0L to 8L).toDF("id")
    val out = graft.operators.LabelPropagation
      .run(edges, "u", "v", nodes, "id", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // deterministic 3-round fixpoint, worked by hand: triangle A
    // settles on 0, triangle B on 2, and the two stay distinct
    assert(Seq(0L, 1L, 2L).map(out) == Seq(0L, 0L, 0L))
    assert(Seq(3L, 4L, 5L).map(out).distinct == Seq(2L))
    // isolated node keeps its own label; the 7-8 pair swaps to a
    // shared stable pairing
    assert(out(6L) == 6L)
    assert(out(7L) == out(8L) || Set(out(7L), out(8L)) == Set(7L, 8L))
    // CC on the same graph merges both triangles into one component
    val cc = graft.operators.ConnectedComponents
      .components(edges, "u", "v",
        nodes = Some(nodes.select($"id".as("node"))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 5L).map(cc).distinct.size == 1)
  }

  test("q291 winnowing: every reported pair shares at least 2 " +
      "selected fingerprints, ids ordered, and the fixture's " +
      "near-dup stripe is detected") {
    val out = queries.Registry.queries("q291_winnowing_pairs")(
      spark, sf).collect()
    assert(out.nonEmpty, "near-dup fixture must yield winnowing pairs")
    out.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("n_shared") >= 2L)
    }
  }

  test("q292 hash-space sampling: censuses consistent (sample within " +
      "full), rates in [0,1], the estimator lands near the truth on " +
      "a 16% slice") {
    val r = queries.Registry.queries("q292_sampled_dup_rate")(
      spark, sf).collect().head
    val n = r.getAs[Long]("n_docs")
    val ns = r.getAs[Long]("n_sample_docs")
    val fr = r.getAs[Double]("full_dup_rate")
    val sr = r.getAs[Double]("sample_dup_rate")
    assert(n == 500L && ns > 0L && ns < n)
    assert(fr >= 0.0 && fr <= 1.0 && sr >= 0.0 && sr <= 1.0)
    // group-preserving sampling is unbiased; on this fixture the 16%
    // slice estimates the 10.8% true rate within a wide-but-real band
    assert(math.abs(sr - fr) < 0.25,
      s"estimator far off: sample $sr vs full $fr")
  }

  test("q294 per-source census: redundancy counted against the WHOLE " +
      "corpus (canonical copies live where they live), totals add up") {
    val out = queries.Registry.queries("q294_source_dup_census")(
      spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val d = r.getAs[Long]("n_redundant")
      assert(d >= 0L && d < n, "a source cannot be 100% redundant " +
        "against itself unless empty")
      val sh = r.getAs[Double]("dup_share")
      assert(sh >= 0.0 && sh < 1.0)
    }
    // corpus-level invariant: total redundant docs == docs - groups
    val totalDocs = out.map(_.getAs[Long]("n_docs")).sum
    val totalRedundant = out.map(_.getAs[Long]("n_redundant")).sum
    assert(totalDocs == 500L)
    assert(totalRedundant == totalDocs -
      Tables.load(spark, sf, "documents")
        .select(org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.concat_ws(" ",
            org.apache.spark.sql.functions.array_sort(
              org.apache.spark.sql.functions.array_distinct(
                org.apache.spark.sql.functions.split(
                  org.apache.spark.sql.functions.col("text"), " "))))))
        .distinct().count())
  }

  test("verify-stage shingle cap bites on a planted mega-doc without " +
      "changing sub-cap results (r15 verdict #6)") {
    import graft.operators.CapMetrics
    def await(pred: () => Boolean, ms: Long = 10000): Boolean = {
      val deadline = System.currentTimeMillis() + ms
      while (!pred() && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      pred()
    }
    // two sub-cap near-dup docs + a mega-doc PAIR (identical, so LSH
    // recall is 1 and truncated KMV sketches still verify at J=1.0)
    val mega = (0 until 300).map(i => s"m$i").mkString(" ")
    val corpus = Seq(
      (0L, base), (1L, base + " extra"),
      (10L, mega), (11L, mega)).toDF("doc_id", "text")
    def run(cap: Int) = Dedup.nearDupPairsAuto(corpus, 3,
        minJaccard = 0.5, exactThreshold = 0L, maxShinglesPerDoc = cap)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    CapMetrics.reset()
    val uncapped = run(Int.MaxValue)
    val capped = run(32)
    // identical result set: sub-cap pair (0,1) byte-identical; the
    // mega pair survives because both truncated sketches are equal
    assert(uncapped == capped, s"\nuncapped=$uncapped\ncapped=$capped")
    assert(capped.map(p => (p._1, p._2)).toSet ==
      Set((0L, 1L), (10L, 11L)))
    // and the cap ENGAGED: telemetry recorded the two truncated docs
    // (298 shingles each, 266 excess rows apiece; the sub-cap docs
    // carry 18/19 shingles, safely under the 32 cap) on the capped run
    assert(await(() => CapMetrics.snapshot().exists { case (k, m) =>
      k.startsWith("graft.cap.verify_shingles") &&
        m.getAs[Long]("capped_groups") == 2L &&
        m.getAs[Long]("dropped_rows") == 2L * (298 - 32) &&
        m.getAs[Long]("max_width") == 298L
    }), s"cap telemetry missing/wrong: ${CapMetrics.snapshot()}")
  }
}
