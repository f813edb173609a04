package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.CosineSimilarity
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    dot / (na * nb)
  }

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f)))

  test("CosineSimilarity expression matches reference computation") {
    val df = vecs.toDF("vec_id", "embedding")
    val pairs = df.as("a").crossJoin(df.as("b"))
      .select($"a.vec_id".as("ia"), $"b.vec_id".as("ib"),
        CosineSimilarity.cosine($"a.embedding", $"b.embedding").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for {
      (ia, va) <- vecs
      (ib, vb) <- vecs
    } assert(math.abs(pairs((ia, ib)) - cos(va, vb)) < 1e-12,
      s"pair ($ia,$ib)")
  }

  test("CosineSimilarity interpreted eval matches codegen result") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val lit1 = Literal.create(
      ArrayData.toArrayData(Array(0.3f, -0.4f, 0.5f)),
      ArrayType(FloatType))
    val lit2 = Literal.create(
      ArrayData.toArrayData(Array(0.1f, 0.2f, 0.9f)),
      ArrayType(FloatType))
    val interpreted = graft.expressions.CosineSimilarity(lit1, lit2)
      .eval(null).asInstanceOf[Double]
    val expected = cos(Array(0.3f, -0.4f, 0.5f), Array(0.1f, 0.2f, 0.9f))
    assert(math.abs(interpreted - expected) < 1e-12)
  }

  test("exactCosine agrees with kernel cosine to float-sum precision") {
    val emb = Tables.load(spark, sf, "embeddings").limit(50)
    val diffs = emb.as("a").crossJoin(emb.as("b"))
      .filter($"a.vec_id" < $"b.vec_id")
      .select(abs(
        Similarity.exactCosine($"a.embedding", $"b.embedding") -
          CosineSimilarity.cosine($"a.embedding", $"b.embedding"))
        .as("d"))
      .agg(max($"d")).as[Double].head()
    assert(diffs < 1e-7)
  }

  test("bruteForceTopK returns k ranked neighbors, rank 1 is the max") {
    val emb = Tables.load(spark, sf, "embeddings")
    val top = Similarity.bruteForceTopK(
      emb.filter($"vec_id" === 0), emb, 5).orderBy("rank").collect()
    assert(top.length == 5)
    assert(top.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    val cosines = top.map(_.getDouble(3))
    assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
  }

  test("cosinePairsAbove finds exactly the pairs over threshold") {
    val emb = Tables.load(spark, sf, "embeddings").limit(100)
    val got = Similarity.cosinePairsAbove(emb, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: exact pairwise via collect
    val local = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val want = (for {
      (ia, va) <- local; (ib, vb) <- local
      if ia < ib && cos(va, vb) >= 0.3
    } yield (ia, ib)).toSet
    assert(got == want)
  }

  test("cosinePairsAboveLsh: subset of brute force, exact scores, " +
      "full recall on planted near-dups") {
    val emb = Tables.load(spark, sf, "embeddings").limit(100)
    val brute = Similarity.cosinePairsAbove(emb, 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pruned = Similarity.cosinePairsAboveLsh(emb, 0.35,
        nBits = 16, dim = 64, bandBits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact rescore ⇒ precision 1.0: every returned pair is a true pair
    assert(pruned.subsetOf(brute))
    // planted near-identical vectors (the actual near-dup regime,
    // cos ≈ 1): band collision probability ≈ 1, recall must be total
    val base = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val planted = Seq(
      (1000L, base),
      (1001L, base.map(x => x * 1.001f + 1e-4f)),
      (1002L, base.map(x => x * 0.999f - 1e-4f))).toDF(
      "vec_id", "embedding").select(col("vec_id"), col("embedding"),
      lit(999).as("label"))
    val withDups = emb.unionByName(planted)
    val prunedDups = Similarity.cosinePairsAboveLsh(withDups, 0.99,
        nBits = 16, dim = 64, bandBits = 4)
      .filter($"id_a" >= 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prunedDups == Set((1000L, 1001L), (1000L, 1002L),
      (1001L, 1002L)))
  }

  test("ivfTopK: probed-cell top-k matches brute force within cells") {
    val emb = Tables.load(spark, sf, "embeddings")
    val queries = emb.filter($"vec_id" < 10)
    val cent = emb.filter($"vec_id" < 16)
    val got = Similarity.ivfTopK(emb, queries, cent, k = 5, nProbe = 4)
      .orderBy("query_id", "rank").collect()
    assert(got.length == 50)
    // ranks are 1..5 per query, cosines descending
    got.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      val cs = sorted.map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    // with nProbe = all cells, IVF degrades to exact brute force
    val full = Similarity.ivfTopK(emb, queries, cent, k = 5, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(queries, emb, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1))).toSet
    assert(full == brute)
  }

  test("ivfTopK: fast-kernel and exact-decimal cell assignment agree") {
    // ivfTopK prunes centroid candidates with the double kernel (top
    // n+3) before the exact decimal rescore picks the cell; the oracle
    // ranks by exact cosine only. Guard against drift: for every vector
    // the double-kernel argmax centroid must equal the exact-cosine
    // argmax, so the +3 buffer is never what saves the assignment.
    val emb = Tables.load(spark, sf, "embeddings")
    val cent = emb.filter($"vec_id" < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    val wFast = Window.partitionBy("vec_id")
      .orderBy(col("_fast").desc, col("cid"))
    val wExact = Window.partitionBy("vec_id")
      .orderBy(col("_exact").desc, col("cid"))
    val mismatch = emb.join(broadcast(cent))
      .withColumn("_fast", CosineSimilarity.cosine($"embedding", $"cemb"))
      .withColumn("_exact", Similarity.exactCosine($"embedding", $"cemb"))
      .withColumn("_rf", row_number().over(wFast))
      .withColumn("_re", row_number().over(wExact))
      .filter(($"_rf" === 1 || $"_re" === 1) && $"_rf" =!= $"_re")
      .count()
    assert(mismatch == 0L)
  }

  test("pqTopK: codebook members encode to themselves; ADC respects k/ranks") {
    val emb = Tables.load(spark, sf, "embeddings")
    val queries = emb.filter($"vec_id" < 10)
    val book = emb.filter($"vec_id" < 16)
    val got = Similarity.pqTopK(emb, queries, book, m = 8, dim = 64, k = 5)
      .orderBy("query_id", "rank").collect()
    assert(got.length == 50)
    got.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      val ds = sorted.map(_.getDouble(3))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b },
        "ADC distances must be ascending with rank")
    }
    // a codebook vector's nearest codeword in every subspace is its own
    // sub-vector (distance 0), so its ADC distance to itself-as-query
    // is the query's own lookup sum — and a codebook member queried
    // against the collection must rank its exact duplicate (if any) by
    // true distance 0. Weaker invariant that must always hold: ADC of
    // (q, q) over codebook members is 0, so any q<16 query's top hits
    // can't have negative distance and all distances are finite.
    assert(got.forall(r => r.getDouble(3) >= 0 &&
      !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
  }

  test("lshBuckets: deterministic signatures, buckets nonempty") {
    val emb = Tables.load(spark, sf, "embeddings")
    val b1 = Similarity.lshBuckets(emb, "vec_id", "embedding", 8, 64)
      .orderBy("vec_id").collect().map(_.getString(1)).toSeq
    val b2 = Similarity.lshBuckets(emb.repartition(7), "vec_id",
      "embedding", 8, 64).orderBy("vec_id").collect()
      .map(_.getString(1)).toSeq
    assert(b1 == b2)
    assert(b1.forall(_.length == 8))
    assert(b1.distinct.size > 1)
  }

  test("randomProject: basis vectors read off the sign matrix; " +
      "projection preserves relative distances roughly") {
    import spark.implicits._
    // e_i projects to exactly the i-th column of signs: pins the md5
    // derivation and the join orientation
    val basis = (0 until 4).map(i =>
      (i.toLong, Array.tabulate(64)(k => if (k == i) 1.0f else 0.0f)))
    val p = Similarity
      .randomProject(basis.toDF("vec_id", "embedding"), "vec_id",
        "embedding", outDims = 16, dim = 64)
      .collect()
    assert(p.length == 4 * 16)
    p.foreach { r =>
      assert(r.getDouble(2) ==
        Similarity.jlSign(r.getLong(1).toInt, r.getLong(0).toInt).toDouble)
    }
    // identical vectors stay identical after projection; a far vector
    // stays far (sanity JL check, not a tight bound)
    val rnd = new scala.util.Random(7)
    val v = Array.fill(64)(rnd.nextFloat())
    val far = v.map(x => -x)
    val trio = Seq((0L, v), (1L, v.clone()), (2L, far))
    val q = Similarity
      .randomProject(trio.toDF("vec_id", "embedding"), "vec_id",
        "embedding", outDims = 16, dim = 64)
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.sortBy(_.getLong(1)).map(_.getDouble(2)) }
    assert(q(0L).sameElements(q(1L)))
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    assert(d2(q(0L).toSeq, q(2L).toSeq) > 0.0)
  }

  test("q285 decontamination census: shares in [0,1], counts " +
      "consistent, and the fixture actually carries contamination") {
    val out = queries.Registry.queries("q285_embed_decontaminate")(
      spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_train")
      val c = r.getAs[Long]("n_contaminated")
      assert(c >= 0L && c <= n)
      val s = r.getAs[Double]("contam_share")
      assert(s >= 0.0 && s <= 1.0)
    }
    // probed against DuckDB: 15 of 475 train vectors sit within
    // cosine >= 0.35 of an eval vector on this corpus
    assert(out.map(_.getAs[Long]("n_contaminated")).sum == 15L)
    assert(out.map(_.getAs[Long]("n_train")).sum == 475L)
  }

  test("q285 plan: the benchmark side broadcasts (a documented " +
      "bounded BNLJ — the eval set is fixed-size); the train side " +
      "is never replicated") {
    val p = queries.Registry.queries("q285_embed_decontaminate")(
      spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the kernel prune must run inside the broadcast join:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("q288 topic balance: totals preserved, keep probabilities in " +
      "(0,1], and under-target buckets keep every member") {
    val out = queries.Registry.queries("q288_cluster_balance")(
      spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("n")).sum == 500L)
    out.foreach { r =>
      val n = r.getAs[Long]("n")
      val kept = r.getAs[Long]("n_kept")
      val p = r.getAs[Double]("keep_prob")
      assert(kept >= 0L && kept <= n)
      assert(p > 0.0 && p <= 1.0)
      // keep_prob == 1 means thresh == 2^32: the hash can never miss
      if (p == 1.0) assert(kept == n,
        s"under-target bucket must keep all: $kept of $n")
    }
    // the balance must actually flatten: the kept-count spread is no
    // wider than the input spread
    val ns = out.map(_.getAs[Long]("n"))
    val ks = out.map(_.getAs[Long]("n_kept"))
    assert(ks.max - ks.min <= ns.max - ns.min)
  }

  test("q290 streaming decontamination: the drained per-vector " +
      "verdicts match the batch gate exactly, and their census " +
      "equals q285 row for row") {
    val stream = queries.Registry.queries("q290_stream_decontaminate")(
      spark, sf).collect()
    val emb = Tables.load(spark, sf, "embeddings")
    val ev = emb.filter(col("vec_id") % 20 === 0)
    val tr = emb.filter(col("vec_id") % 20 =!= 0)
    val batchHits = Similarity.idsNearAny(tr, ev, 0.35)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val streamHits = stream.filter(_.getAs[Boolean]("contaminated"))
      .map(_.getAs[Long]("vec_id")).toSet
    assert(streamHits == batchHits,
      s"verdicts diverged: only-batch=${batchHits -- streamHits} " +
        s"only-stream=${streamHits -- batchHits}")
    assert(stream.length == tr.count().toInt,
      "every train vector must receive a verdict row")
    // census roll-up equals the batch q285 output
    val census = stream.groupBy(_.getAs[Int]("label"))
      .map { case (l, rs) =>
        (l, rs.length.toLong,
          rs.count(_.getAs[Boolean]("contaminated")).toLong) }
      .toSet
    val batch = queries.Registry.queries("q285_embed_decontaminate")(
      spark, sf).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Long]("n_train"),
        r.getAs[Long]("n_contaminated"))).toSet
    assert(census == batch,
      s"census diverged: only-batch=${batch -- census} " +
        s"only-stream=${census -- batch}")
  }

  test("q305 PQ recall: bounds, top-1 consistency, and the exact arm " +
      "agrees with a driver-side L2 recompute") {
    val out = queries.Registry.queries("q305_pq_recall")(spark, sf)
      .collect()
    assert(out.length == 10)
    out.foreach { r =>
      val rec = r.getDouble(1)
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getBoolean(2) == (r.getLong(3) == r.getLong(4)))
    }
    // exact_top1 for query 0 recomputed imperatively
    val vecs = Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val q0 = vecs(0L)
    val best = vecs.filter(_._1 != 0L).map { case (id, v) =>
      val d = v.zip(q0).map { case (a, b) =>
        (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble) }.sum
      (d, id)
    }.min
    assert(out.head.getLong(3) == best._2,
      s"exact arm top-1 ${out.head.getLong(3)} != recompute ${best._2}")
  }
}
