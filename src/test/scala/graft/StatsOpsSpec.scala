package graft

import org.apache.spark.sql.functions._

import graft.queries.{Registry, StatsOps}

/** Properties of the round-6 stats/linkage operators that the DuckDB
  * hash-compare can't express: partitioning-invariance of the
  * bounded-state aggregates and the skyline's dominance contract. */
class StatsOpsSpec extends SparkSpec {

  private def run(name: String) =
    Registry.queries(name)(spark, sf)

  test("stratified sample is invariant under repartitioning") {
    val base = run("q115_stratified_sample").collect().toSeq
    val shuffled = Tables.load(spark, sf, "documents")
      .repartition(17, col("doc_id"))
      .select(col("lang"), col("source"), col("doc_id"),
        ((col("doc_id") * 2246822519L) % 4294967296L).as("h"))
      .groupBy("lang", "source")
      .agg(graft.expressions.TopKAggregate.bottomK(
        col("h").cast("double"), col("doc_id"), 3).as("picks"))
      .select(col("lang"), col("source"),
        posexplode(col("picks")).as(Seq("p", "t")))
      .select(col("lang"), col("source"),
        (col("p") + 1).cast("long").as("rank"), col("t._2").as("doc_id"))
      .orderBy("lang", "source", "rank")
      .collect().toSeq
    assert(base == shuffled)
  }

  test("KMV estimate is positive and carries the true k-th minimum") {
    val rows = run("q114_kmv_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("est_distinct") > 0d)
      assert(r.getAs[Long]("exact_distinct") >= 8L)
    }
  }

  test("skyline output is mutually non-dominated") {
    val pts = run("q118_skyline").collect()
      .map(r => (r.getAs[Double]("x"), r.getAs[Double]("y")))
    assert(pts.nonEmpty)
    for (a <- pts; b <- pts if a != b)
      assert(!(b._1 >= a._1 && b._2 >= a._2 &&
        (b._1 > a._1 || b._2 > a._2)))
  }

  test("ewma equals the direct per-row recomputation on a slice") {
    val got = run("q116_ewma")
      .filter(col("user_id") === 1L).orderBy("event_id").collect()
    // recompute from raw events
    val raw = Tables.load(spark, sf, "events")
      .filter(col("user_id") === 1L)
      .select(col("event_id"), col("ts"), col("value"))
      .orderBy("ts", "event_id")
      .collect()
      .map(r => (r.getAs[Long]("event_id"),
        math.floor(r.getAs[Double]("value") * 100d + 0.5d).toLong))
    val byId = got.map(r => r.getAs[Long]("event_id") -> (
      r.getAs[Long]("num"), r.getAs[Long]("den"))).toMap
    raw.zipWithIndex.foreach { case ((id, _), i) =>
      val taps = raw.slice(math.max(0, i - 15), i + 1).reverse
      val num = taps.zipWithIndex.map { case ((_, c), j) =>
        c * (1L << (15 - j)) }.sum
      val den = taps.indices.map(j => 1L << (15 - j)).sum
      assert(byId(id) == ((num, den)))
    }
  }

  test("fuzzy join pairs share a block and respect the cutoff") {
    val rows = run("q113_fuzzy_block_join").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("name_a"), r.getAs[String]("name_b"))
      assert(a.split(' ').last == b.split(' ').last)
      assert(r.getAs[Long]("dist") <= 3L && a < b)
    }
  }

  test("count-min never underestimates (one-sided guarantee)") {
    val rows = run("q171_countmin_heavy_hitters").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_estimate") >= r.getAs[Long]("exact_count"),
        s"CMS underestimated key ${r.getAs[Long]("user_id")}")
    }
  }

  test("bloom filter has no false negatives") {
    val rows = run("q172_bloom_semi_join").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (r.getAs[Boolean]("actual_member"))
        assert(r.getAs[Boolean]("bloom_member"),
          s"false negative for key ${r.getAs[Long]("user_id")}")
    }
  }
}
