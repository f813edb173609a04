package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.LinearProbe

/** The quality-probe trainer (q256): surrogate-sigmoid contract,
  * learning on a separable toy problem, and the property the whole
  * design exists for — bit-identical weights regardless of data
  * partitioning (decimal gradient sums are order-free, so a cluster
  * re-shard can never move the model). */
class LinearProbeSpec extends SparkSpec {

  private def toy(parts: Int) = {
    import spark.implicits._
    // y = 1 iff x1 > 1.0 (plus a distractor feature)
    (1 to 400).map { i =>
      val x1 = (i % 20) / 10.0             // 0.0 .. 1.9
      val x2 = ((i * 7) % 13) / 13.0       // noise
      (i.toLong, x1, x2, if (x1 > 1.0) 1.0 else 0.0)
    }.toDF("id", "x1", "x2", "y").repartition(parts)
  }

  test("surrogate sigmoid: range, midpoint, monotone") {
    import spark.implicits._
    val xs = Seq(-100.0, -1.0, -0.1, 0.0, 0.1, 1.0, 100.0)
    val ps = xs.toDF("m").select(LinearProbe.sigmoid(col("m")))
      .collect().map(_.getDouble(0))
    assert(ps.head > 0.0 && ps.last < 1.0)
    assert(ps(3) == 0.5)
    assert(ps.sliding(2).forall { case Array(a, b) => a < b })
  }

  test("GD learns a separable rule: accuracy improves over iterations " +
      "and beats the majority class") {
    val f = toy(4).persist()
    def acc(w: Array[Double]): Double = {
      val scored = LinearProbe.score(f, w.toSeq, Seq("x1", "x2"))
      scored.filter((col("score") >= 0.5) === (col("y") === 1.0))
        .count().toDouble / scored.count()
    }
    val w0 = Array(0.0, 0.0, 0.0)
    val w8 = LinearProbe.train(f, Seq("x1", "x2"), "y", 8, 1.0)
    assert(acc(w8) > acc(w0) && acc(w8) >= 0.8,
      s"acc ${acc(w8)} after 8 iters")
    // the signal feature dominates the distractor
    assert(math.abs(w8(1)) > math.abs(w8(2)))
    f.unpersist()
  }

  test("weights are BIT-IDENTICAL across re-partitionings (the " +
      "order-free decimal gradient reduction)") {
    val a = LinearProbe.train(toy(1), Seq("x1", "x2"), "y", 5, 0.5)
    val b = LinearProbe.train(toy(7), Seq("x1", "x2"), "y", 5, 0.5)
    val c = LinearProbe.train(toy(4).sort(desc("id")),
      Seq("x1", "x2"), "y", 5, 0.5)
    assert(a.toSeq == b.toSeq && a.toSeq == c.toSeq,
      s"partitioning moved the model: ${a.toSeq} vs ${b.toSeq} vs ${c.toSeq}")
  }

  test("q257 canonicalization collapses all planted URL variants of " +
      "one page and keeps the minimum doc_id") {
    val out = queries.Registry.queries("q257_url_canonical_dedup")(
      spark, sf).collect()
    // variants differ only in path spelling / tracking params /
    // fragment when (id%8, id%6, id%12) agree — every group keeper
    // is its minimum member, and groups do merge across variants
    val byCanon = out.groupBy(_.getAs[String]("canonical_url"))
    assert(byCanon.exists(_._2.length > 1), "no URL group merged")
    byCanon.foreach { case (cu, rows) =>
      assert(!cu.contains("utm_") && !cu.contains("fbclid") &&
        !cu.contains("#") && !cu.contains(":443") &&
        !cu.contains("index.html"), cu)
      // scheme+host lowercased (the synthesized paths are lowercase
      // already, so the whole canonical form must be)
      assert(cu == cu.toLowerCase, s"not lowercased: $cu")
      val keeper = rows.map(_.getAs[Long]("keeper_id")).distinct.toSeq
      assert(keeper == Seq(rows.map(_.getAs[Long]("doc_id")).min))
    }
    // canonical key space is lcm(8,6,12)=24 id-classes, so even the
    // 50-doc sf0.001 fixture has multi-member groups whose members
    // span different variant spellings; all rule classes exercised
    assert(out.exists(r => r.getAs[String]("url").contains("#sec")))
    assert(out.exists(r => r.getAs[String]("url").contains("index.html")))
    assert(out.exists(r => r.getAs[String]("url").contains("utm_source")))
    assert(out.exists(r => r.getAs[String]("url").contains("fbclid")))
  }

  test("q261 FIM splits are LOSSLESS: prefix+middle+suffix reassemble " +
      "the original token stream, boundaries at 40%/70%") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val out = queries.Registry.queries("q261_fim_split")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val fim = r.getAs[String]("fim_text")
      val n = r.getAs[Long]("n_tokens")
      val (p1, p2) = (r.getAs[Long]("p1"), r.getAs[Long]("p2"))
      assert(p1 == n * 2 / 5 && p2 == n * 7 / 10 && p1 >= 1 && p2 < n)
      // reassemble PSM → original
      val Array(pre, rest) = fim.stripPrefix("<PRE>").split("<SUF>", 2)
      val Array(suf, mid) = rest.split("<MID>", 2)
      val orig = docs(r.getAs[Long]("doc_id")).split(" ", -1)
      assert((pre.split(" ", -1) ++ mid.split(" ", -1) ++
        suf.split(" ", -1)).toSeq == orig.toSeq,
        s"doc ${r.getAs[Long]("doc_id")} did not reassemble")
    }
  }
}
