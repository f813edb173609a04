package graft

import org.apache.spark.sql.functions._

import graft.queries.Registry

/** Properties of the round-8 sampling / evaluation / maintenance
  * operators that the DuckDB hash-compare can't express: estimator
  * contracts, partitioning-invariance of the priority sample, and the
  * compaction plan's packing invariants. */
class EvalOpsSpec extends SparkSpec {

  private def run(name: String) =
    Registry.queries(name)(spark, sf)

  test("priority sample: k rows, est_weight >= weight, repartition-invariant") {
    val rows = run("q201_priority_sample").collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getAs[Double]("est_weight") >=
        r.getAs[Long]("w").toDouble)
    }
    // the same top-(k+1) aggregate over a hostile partitioning must
    // pick the identical sample (truncation commutes with merge)
    val base = rows.map(_.getAs[Long]("doc_id")).toSeq
    val shuffled = Tables.load(spark, sf, "documents")
      .repartition(17, col("doc_id"))
      .select(col("doc_id"), col("n_chars").as("w"),
        (((col("doc_id") * 2246822519L) % 4294967296L) + 1).as("h"))
      .withColumn("priority",
        (col("w") * 4294967296L).cast("double") / col("h").cast("double"))
      .agg(graft.expressions.TopKAggregate
        .topK(col("priority"), col("doc_id"), 51).as("top"))
      .select(explode(slice(col("top"), 1, 50)).as("e"))
      .select(col("e._2").as("doc_id"))
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(base.sorted == shuffled)
  }

  test("priority sample estimator sums close to the true total weight") {
    // DLT subset-sum estimator: E[Σ est] = Σ w. One fixed sample can't
    // verify unbiasedness, but it must land within a loose band and
    // never below the sampled docs' own weight mass.
    val est = run("q201_priority_sample").agg(sum("est_weight"))
      .collect()(0).getDouble(0)
    val total = Tables.load(spark, sf, "documents")
      .agg(sum("n_chars")).collect()(0).getLong(0).toDouble
    assert(est > total * 0.3 && est < total * 3.0,
      s"estimate $est implausible vs true total $total")
  }

  test("token-mass median: crossing row covers at least half the mass") {
    val rows = run("q202_token_mass_median").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cum = r.getAs[Long]("cum_tokens")
      val total = r.getAs[Long]("total_tokens")
      assert(cum * 2 >= total)
      assert(cum <= total)
    }
  }

  test("lsh recall metrics are consistent counts") {
    val r = run("q203_lsh_recall").collect()(0)
    val (t, c, h) = (r.getAs[Long]("n_true"), r.getAs[Long]("n_cand"),
      r.getAs[Long]("n_hit"))
    assert(h <= t && h <= c)
    assert(r.getAs[Double]("recall") >= 0.0 &&
      r.getAs[Double]("recall") <= 1.0)
    assert(r.getAs[Double]("precision") >= 0.0 &&
      r.getAs[Double]("precision") <= 1.0)
  }

  test("compaction plan: offsets are consecutive and groups dense") {
    val rows = run("q204_compaction_plan").collect()
      .groupBy(_.getAs[String]("event_type"))
    rows.foreach { case (_, cells) =>
      var expect = 0L
      cells.sortBy(_.getAs[java.sql.Timestamp]("day").getTime)
        .foreach { r =>
          assert(r.getAs[Long]("start_offset") == expect)
          expect += r.getAs[Long]("n_rows")
          // group id is the packing invariant, not an accident
          assert(r.getAs[Long]("file_group") ==
            r.getAs[Long]("start_offset") / 4096L)
        }
    }
  }

  test("calibration bins partition the corpus") {
    val rows = run("q205_score_calibration").collect()
    val n = rows.map(_.getAs[Long]("n")).sum
    val total = Tables.load(spark, sf, "documents").count()
    assert(n == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pos") <= r.getAs[Long]("n"))
    }
  }

  test("lift table: marginals and total are consistent, flag matches lift") {
    val rows = run("q211_source_lang_lift").collect()
    val n = rows.map(_.getAs[Long]("nxy")).sum
    // every row carries the same grand total by construction; the
    // per-source marginal must equal the sum of that source's cells
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, cells) =>
      assert(cells.map(_.getAs[Long]("nxy")).sum ==
        cells.head.getAs[Long]("nx"))
    }
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, cells) =>
      assert(cells.map(_.getAs[Long]("nxy")).sum ==
        cells.head.getAs[Long]("ny"))
    }
    rows.foreach { r =>
      assert(r.getAs[Double]("lift") > 0.0)
      assert(r.getAs[Boolean]("over_represented") ==
        (r.getAs[Double]("lift") > 1.0))
    }
    assert(n == Tables.load(spark, sf, "documents").count())
  }

  test("quantile normalization: ranks in range, monotone within source") {
    val rows = run("q212_quantile_normalize").collect()
    val total = Tables.load(spark, sf, "documents").count()
    assert(rows.length == total)
    rows.foreach { r =>
      val q = r.getAs[Long]("q")
      assert(q >= 1L && q <= total)
    }
    // within a source, a higher raw score can never map to a lower
    // normalized score (the empirical CDF is monotone)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, cells) =>
      val bySRaw = cells.sortBy(r => (r.getAs[Long]("s"),
        r.getAs[Long]("doc_id")))
      bySRaw.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("s_norm") <= b.getAs[Long]("s_norm"))
        case _ =>
      }
    }
    // the top-ranked doc overall maps to the global max score
    val globalMax = rows.map(_.getAs[Long]("s")).max
    assert(rows.filter(_.getAs[Long]("q") == total)
      .forall(_.getAs[Long]("s_norm") == globalMax))
  }

  test("auc matches the brute-force pair count on the fixture") {
    val r = run("q206_auc").collect()(0)
    val auc = r.getAs[Double]("auc")
    // brute force: P(score_pos > score_neg) + 0.5 P(tie)
    val sc = Tables.load(spark, sf, "documents")
      .select(graft.queries.TextOps.qualityLogit.as("s"),
        (col("lang") === "en").as("y")).collect()
      .map(x => (x.getLong(0), x.getBoolean(1)))
    val pos = sc.filter(_._2).map(_._1)
    val neg = sc.filterNot(_._2).map(_._1)
    var num = 0.0
    for (p <- pos; q <- neg)
      num += (if (p > q) 1.0 else if (p == q) 0.5 else 0.0)
    val brute = num / (pos.length.toDouble * neg.length.toDouble)
    assert(math.abs(auc - brute) < 1e-12, s"$auc vs brute $brute")
  }
}
