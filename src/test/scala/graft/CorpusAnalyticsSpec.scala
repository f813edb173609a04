package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder
import graft.operators.{Dedup, TextRank}

/** Semantics the round-6 oracles can't stress: containment vs Jaccard
  * asymmetry and its skew cap, PageRank structure on a known graph,
  * Z-order bit placement, and binned-range-join completeness against a
  * naive theta join. */
class CorpusAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val long =
    "spark window merge sort hash join filter group order scan " +
      "table row batch stream value key small fast slow data"
  // a verbatim excerpt of `long` (its first eight words)
  private val excerpt = "spark window merge sort hash join filter group"

  test("containmentPairs: embedded excerpt scores 1.0 where Jaccard is low") {
    val docs = Seq((0L, long), (1L, excerpt)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, 3, minContainment = 0.5)
      .collect()
    assert(cont.length == 1)
    val r = cont.head
    assert(r.getAs[Long]("doc_a") == 0L && r.getAs[Long]("doc_b") == 1L)
    assert(r.getAs[Double]("containment") == 1.0)
    // the symmetric measure misses the same pair at the same bar
    assert(Dedup.ngramJaccardPairs(docs, 3, minJaccard = 0.5).isEmpty)
  }

  test("containmentPairs: maxDocFreq drops pairs linked only by hot shingles") {
    // `hot` appears in every doc; pairs 0-1 share ONLY hot shingles
    val hot = "hot hot hot hot"
    val docs = Seq(
      (0L, hot + " alpha beta gamma"),
      (1L, hot + " delta epsilon zeta"),
      (2L, hot + " alpha beta gamma")) // real dup of 0 beyond the hot run
      .toDF("doc_id", "text")
    val capped = Dedup.containmentPairs(docs, 3, minContainment = 0.3,
        maxDocFreq = 2)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((0L, 2L)))
    assert(!capped.contains((0L, 1L)) && !capped.contains((1L, 2L)))
  }

  test("pageRank: sink of a star graph outranks its sources; base rank floor holds") {
    // a,b,c,d all point at z
    val edges = Seq(("a", "z", 1L), ("b", "z", 1L), ("c", "z", 1L),
      ("d", "z", 1L)).toDF("src", "dst", "c")
    val nodes = Seq("a", "b", "c", "d", "z").toDF("node")
    val pr = TextRank.pageRank(edges, nodes, iterations = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // sources have no in-edges: exactly the damped base
    assert(Seq("a", "b", "c", "d").forall(pr(_) == 150000L))
    // the sink holds ~ base + 0.85 * 4 * base after convergence
    assert(pr("z") > 4 * pr("a"))
    assert(pr.values.forall(_ >= 150000L))
  }

  test("pageRank: weighted edges split contribution by weight") {
    // s has out-weight 3: two-thirds to x, one-third to y
    val edges = Seq(("s", "x", 2L), ("s", "y", 1L)).toDF("src", "dst", "c")
    val nodes = Seq("s", "x", "y").toDF("node")
    val pr = TextRank.pageRank(edges, nodes, iterations = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // one iteration from pr0=1e6: x gets (1e6*2)/3=666666, y 333333
    assert(pr("x") == 150000L + 85L * 666666L / 100L)
    assert(pr("y") == 150000L + 85L * 333333L / 100L)
  }

  test("ZOrder.interleave16 matches a bit-twiddling reference on random points") {
    def ref(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(50)((rnd.nextInt(65536).toLong,
      rnd.nextInt(65536).toLong)) :+ (0L, 0L) :+ (65535L, 65535L)
    val got = pts.toDF("x", "y")
      .withColumn("z", ZOrder.interleave16("x", "y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    pts.foreach { case (x, y) => assert(got((x, y)) == ref(x, y)) }
  }

  test("TopKAggregate: truncation commutes with merge under any partitioning") {
    import graft.expressions.TopKAggregate
    val rnd = new scala.util.Random(11)
    val rows = (0L until 500L).map(i =>
      ("g" + (i % 3), rnd.nextInt(40).toDouble, i))
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3))
        .sorted(Ordering.Tuple2(Ordering.Double.TotalOrdering,
          Ordering.Long).reverse).take(5)
    }
    for (parts <- Seq(1, 7, 64)) {
      val got = rows.toDF("g", "value", "id").repartition(parts)
        .groupBy("g")
        .agg(TopKAggregate.topK(col("value"), col("id"), 5).as("top"))
        .collect()
        .map(r => r.getString(0) ->
          r.getSeq[org.apache.spark.sql.Row](1)
            .map(t => (t.getDouble(0), t.getLong(1))))
        .toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("binned range join equals the naive theta join") {
    // periods [p*100, p*100+250) on an integer axis, bin width 50
    val periods = Seq(0L, 1L, 2L).toDF("pid")
      .withColumn("lo", col("pid") * 100L)
      .withColumn("hi", col("pid") * 100L + 250L)
    val points = (0L until 400L by 7L).toDF("v")
    val naive = points.join(periods,
        col("v") >= col("lo") && col("v") < col("hi"))
      .select("v", "pid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val binned = points.withColumn("bin", expr("v DIV 50"))
      .join(periods.withColumn("bin",
        explode(sequence(expr("lo DIV 50"), expr("(hi - 1) DIV 50")))),
        Seq("bin"))
      .filter(col("v") >= col("lo") && col("v") < col("hi"))
      .select("v", "pid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive && naive.nonEmpty)
  }

  test("BpeTrain: greedy run parity, tie-break, learned merge order") {
    import graft.operators.BpeTrain
    // greedy left-to-right on overlapping runs: "aaaa" under (a,a)
    // merges positions 1 and 3, never the middle overlap
    assert(BpeTrain.applyMerge(Seq("a", "a", "a"), "a", "a") ==
      Seq("aa", "a"))
    assert(BpeTrain.applyMerge(Seq("a", "a", "a", "a"), "a", "a") ==
      Seq("aa", "aa"))
    assert(BpeTrain.applyMerge(Seq("x", "a", "a", "a", "y"), "a", "a") ==
      Seq("x", "aa", "a", "y"))
    // merged symbols participate in later merges
    assert(BpeTrain.applyMerge(Seq("aa", "b"), "aa", "b") == Seq("aab"))
    // corpus: "ab" x3, "ba" x3 — (a,b) and (b,a) tie at 3; the
    // lexicographically smaller pair (a,b) must win round 1
    val docs = Seq((0L, "ab ab ba"), (1L, "ba ba ab"))
      .toDF("doc_id", "text")
    val rounds = BpeTrain.train(docs, "text", 2).collect()
      .sortBy(_.round)
    assert(rounds(0).lhs == "a" && rounds(0).rhs == "b" &&
      rounds(0).pair_count == 3L)
    // after round 1: "ab"->["ab"] (3 uses, 3 syms), "ba"->["b","a"]
    // (3 uses, 6 syms) => 9
    assert(rounds(0).corpus_syms_after == 9L)
    assert(rounds(1).lhs == "b" && rounds(1).rhs == "a" &&
      rounds(1).pair_count == 3L)
    assert(rounds(1).corpus_syms_after == 6L)
    // inference side applies the learned list in order
    val words = BpeTrain.wordFreq(docs, "text")
    val tok = BpeTrain
      .tokenize(words, rounds.map(r => (r.lhs, r.rhs)).toSeq)
      .collect().map(w => w.word -> w.syms).toMap
    assert(tok("ab") == Seq("ab") && tok("ba") == Seq("ba"))
  }

  test("Itemsets.frequentPairs: a-priori prune bites before pairing; " +
      "lift is exact") {
    import graft.operators.Itemsets
    // 10 baskets: x,y in all 10 (always together), z in 4 (below 50%),
    // w in 5 baskets that also hold x — so (w,x) pair support 5
    val rows = (0 until 10).flatMap { b =>
      Seq((b.toLong, "x"), (b.toLong, "y")) ++
        (if (b < 4) Seq((b.toLong, "z")) else Nil) ++
        (if (b < 5) Seq((b.toLong, "w")) else Nil)
    }
    val df = rows.toDF("bid", "item")
    val out = Itemsets.frequentPairs(df, "bid", "item", 50)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(5))).toMap
    // z is infrequent: no pair may mention it
    assert(!out.keySet.exists { case (a, b) => a == "z" || b == "z" })
    // (x,y) support 10, lift = 10*10/(10*10) = 1.0
    assert(out(("x", "y")) == (10L, 1.0))
    // (w,x) support 5, lift = 5*10/(5*10) = 1.0; (w,y) same
    assert(out(("w", "x")) == (5L, 1.0))
    // pair threshold: nothing below 50% of 10 baskets
    assert(out.values.forall(_._1 >= 5L))
  }
}
