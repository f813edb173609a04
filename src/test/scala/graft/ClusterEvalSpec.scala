package graft

import org.apache.spark.sql.functions._

import graft.operators.{KCenter, KMeans}

/** KMeans.fitAssignTop2 (the centroid-silhouette input) and
  * KCenter.select (Gonzalez farthest-point traversal) on hand-
  * computable fixtures. */
class ClusterEvalSpec extends SparkSpec {
  import spark.implicits._

  test("fitAssignTop2 agrees with fitAssign and orders its distances") {
    val emb = Tables.load(spark, sf, "embeddings").limit(64).cache()
    val a1 = KMeans.fitAssign(emb, k = 4, iters = 2)
      .select("vec_id", "cluster", "dist").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val a2 = KMeans.fitAssignTop2(emb, k = 4, iters = 2).collect()
    assert(a2.length == a1.size)
    a2.foreach { r =>
      val id = r.getLong(0)
      val (c1, d1) = a1(id)
      assert(r.getLong(1) == c1, s"vec $id cluster")
      assert(r.getDouble(2) == d1, s"vec $id dist bit-equal")
      assert(r.getDouble(2) <= r.getDouble(4), s"vec $id dist <= dist2")
      assert(r.getLong(1) != r.getLong(3), s"vec $id distinct clusters")
    }
    emb.unpersist()
  }

  test("silhouette separates tight clusters from a sliced blob") {
    // two tight, far-apart clusters; ids 0/1 seed k=2 one in each
    val tight = Seq(
      (0L, Array(0f, 0f)), (2L, Array(0.1f, 0f)), (4L, Array(0f, 0.1f)),
      (1L, Array(50f, 50f)), (3L, Array(50.1f, 50f)), (5L, Array(50f, 50.1f))
    ).toDF("vec_id", "embedding")
    val t2 = KMeans.fitAssignTop2(tight, k = 2, iters = 2)
      .withColumn("sil",
        when(sqrt(col("dist2")) === 0d, lit(0d))
          .otherwise((sqrt(col("dist2")) - sqrt(col("dist"))) /
            sqrt(col("dist2"))))
      .collect()
    assert(t2.forall(_.getAs[Double]("sil") > 0.99),
      "tight well-separated clusters have silhouette near 1")

    // one blob sliced in two: silhouettes collapse toward 0
    val blob = (0L to 19L).map(i =>
      (i, Array((i % 7).toFloat, (i % 5).toFloat))).toDF("vec_id", "embedding")
    val b2 = KMeans.fitAssignTop2(blob, k = 2, iters = 2)
      .withColumn("sil",
        when(sqrt(col("dist2")) === 0d, lit(0d))
          .otherwise((sqrt(col("dist2")) - sqrt(col("dist"))) /
            sqrt(col("dist2"))))
      .agg(avg("sil")).head().getDouble(0)
    assert(b2 < 0.8, s"sliced blob mean silhouette $b2 well below tight case")
  }

  test("k-center walks the farthest-point trajectory with radii") {
    // a line: 0@0, 1@1, 2@10, 3@11, 4@30 (1-d embeddings)
    val pts = Seq((0L, Array(0f)), (1L, Array(1f)), (2L, Array(10f)),
      (3L, Array(11f)), (4L, Array(30f))).toDF("vec_id", "embedding")
    val rounds = KCenter.select(pts, k = 3)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // seed = lowest id (0). round 1: farthest from 0 is 30 (d²=900).
    // round 2: min-dists to {0,30}: 1→1, 10→100, 11→121 → pick id 3.
    assert(rounds.toSeq == Seq((0L, 0L, 0.0), (1L, 4L, 900.0),
      (2L, 3L, 121.0)), rounds.mkString(", "))
  }

  test("k-center breaks exact distance ties by lowest vec_id") {
    // 1 and 2 are symmetric about the seed at 0: both d² = 25
    val pts = Seq((0L, Array(0f)), (1L, Array(5f)), (2L, Array(-5f)))
      .toDF("vec_id", "embedding")
    val rounds = KCenter.select(pts, k = 2).orderBy("round").collect()
    assert(rounds(1).getLong(1) == 1L, "tie → lowest id")
    assert(rounds(1).getDouble(2) == 25.0)
  }

  test("radii are non-increasing on the driver testdata") {
    val emb = Tables.load(spark, sf, "embeddings")
    val radii = KCenter.select(emb, k = 5)
      .orderBy("round").collect().map(_.getDouble(2)).drop(1)
    radii.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"coverage radius grew: $a -> $b")
    }
  }

  test("q304 reach: exact ball bounds, register monotonicity, " +
      "isolated nodes estimate ~1") {
    val out = queries.Registry.queries("q304_reach_sketch")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val n = Tables.load(spark, sf, "embeddings").count()
    assert(out.length == n, "every node gets a ball row (self-loops)")
    out.foreach { case (id, exact, nRegs, est) =>
      assert(exact >= 1L && exact <= n, s"node $id ball $exact")
      assert(nRegs >= 1L && nRegs <= 16L)
      assert(est > 0.0)
    }
    // an isolated node's 2-ball is exactly {v}: one register, and the
    // raw estimator of a 1-element set is a fixed constant
    val iso = out.filter(_._2 == 1L)
    assert(iso.nonEmpty, "the 0.35 graph leaves isolated nodes")
    iso.foreach { case (_, _, nRegs, est) =>
      assert(nRegs == 1L)
      // 1-element raw estimate: z = 2^-m + 15, so αm·m²/z lives in
      // (0.673·256/16, 0.673·256/15] ≈ (10.77, 11.48] depending on
      // the element's rank — the small-range band the q168 contract
      // leaves uncorrected
      assert(est > 10.7 && est < 11.5, s"1-element estimate $est")
    }
    // sketch vs exact correlate: mean estimate over the densest decile
    // exceeds the mean over isolated nodes (HyperBall's whole point)
    val dense = out.sortBy(-_._2).take(out.length / 10)
    val meanDense = dense.map(_._4).sum / dense.length
    val meanIso = iso.map(_._4).sum / iso.length
    assert(meanDense > meanIso,
      s"dense-ball estimates $meanDense must exceed isolated $meanIso")
  }

  test("q306 conductance: volume/cut identities against the raw edges") {
    import org.apache.spark.sql.functions._
    val out = queries.Registry.queries("q306_cell_conductance")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val emb = Tables.load(spark, sf, "embeddings")
    val nEdges = graft.operators.Similarity.cosinePairsAbove(emb, 0.35)
      .count()
    val n = emb.count()
    assert(out.map(_._2).sum == n, "members partition the corpus")
    assert(out.map(_._3).sum == 2L * nEdges, "Σ volume = 2|E|")
    // each cut edge contributes 1 to BOTH sides' cut counters
    assert(out.map(_._4).sum % 2 == 0, "Σ cut is even")
    out.foreach { case (c, _, vol, cut, phi) =>
      assert(cut <= vol, s"cell $c: cut $cut > volume $vol")
      assert(phi >= 0.0, s"cell $c: negative conductance")
      if (vol > 0 && cut == 0) assert(phi == 0.0)
    }
  }
}
