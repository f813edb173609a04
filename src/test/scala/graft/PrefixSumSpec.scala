package graft

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.PrefixSum

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("matches the single-partition global window on sparse keys") {
    val rnd = new Random(7)
    // sparse, shuffled order keys → empty buckets, bucket boundaries
    // inside and between partitions
    val rows = rnd.shuffle((0L until 400L).map(_ * 3 + 1))
      .map(k => (k, rnd.nextInt(50).toLong))
    val df = rows.toDF("k", "v").repartition(7)
    val got = PrefixSum.exclusiveCumsum(df, col("k"), col("v"), "c",
        bucketSize = 37L)
      .orderBy("k").select("k", "c").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = df.withColumn("c",
        coalesce(sum(col("v")).over(Window.orderBy("k")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy("k").select("k", "c").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == naive.toSeq)
  }

  test("first row gets zero and totals telescope") {
    val df = Seq((0L, 5L), (1L, 7L), (2L, 11L)).toDF("k", "v")
    val got = PrefixSum.exclusiveCumsum(df, col("k"), col("v"), "c", 2L)
      .orderBy("k").select("c").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(0L, 5L, 12L))
  }

  test("globalRank matches the single-partition global row_number on " +
      "random composite keys, at several partition counts") {
    val rnd = new Random(11)
    // composite (string, long) keys, shuffled arrival, duplicates in
    // the first component so ranking spans range-boundary ties
    val rows = rnd.shuffle((0L until 500L).map { i =>
      (s"s${rnd.nextInt(7)}", i, rnd.nextInt(100))
    })
    val df = rows.toDF("grp", "id", "x").repartition(9)
    val naive = df.withColumn("r",
        row_number().over(Window.orderBy("grp", "id")) - 1)
      .orderBy("grp", "id").select("grp", "id", "r")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2).toLong))
    // fewer, comparable, more than keys/rows — 2048 exercises the
    // binary-search splitter expression at a fan-in where the legacy
    // when-chain's generated code would have been ~2048 branches
    for (parts <- Seq(1, 4, 64, 2048)) {
      val got = PrefixSum.globalRank(df, Seq(col("grp"), col("id")),
          "r", partitions = parts)
        .orderBy("grp", "id").select("grp", "id", "r")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq == naive.toSeq, s"partitions=$parts diverged")
    }
  }

  test("globalRank: null order keys rank first (orderBy semantics), " +
      "through null-valued splitter comparisons") {
    // nulls in the first order component: the splitter comparison
    // struct >= struct is NULL for these rows, so they all land in
    // bucket 0 — which is exactly where nulls-first ordering puts
    // them; a sampled splitter can itself carry the null
    val rows = (0L until 200L).map { i =>
      (if (i % 5 == 0) null else s"g${i % 11}", i)
    }
    val df = rows.toDF("grp", "id").repartition(5)
    val want = df.withColumn("r",
        row_number().over(Window.orderBy("grp", "id")) - 1)
      .orderBy("r").select("grp", "id")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)))
    for (parts <- Seq(8, 2048)) {
      val got = PrefixSum.globalRank(df, Seq(col("grp"), col("id")),
          "r", partitions = parts)
        .orderBy("r").select("grp", "id")
        .collect().map(r => (Option(r.getString(0)), r.getLong(1)))
      assert(got.toSeq == want.toSeq, s"partitions=$parts diverged")
      // nulls occupy the first ranks
      assert(got.take(40).forall(_._1.isEmpty))
    }
  }

  test("orderBuckets is order-consistent: monotone in key order, ties " +
      "never split, bounded by the requested fan-in") {
    val rnd = new Random(23)
    val rows = rnd.shuffle((0L until 600L).map { i =>
      (s"k${rnd.nextInt(40)}", rnd.nextInt(12).toLong)
    })
    val df = rows.toDF("a", "b").repartition(7)
    for (parts <- Seq(4, 64, 2048)) {
      val bucket = PrefixSum.orderBuckets(df, Seq(col("a"), col("b")), parts)
      val got = df.withColumn("_bk", bucket)
        .orderBy("a", "b").select("a", "b", "_bk")
        .collect().map(r => ((r.getString(0), r.getLong(1)), r.getInt(2)))
      // monotone non-decreasing along the key order
      got.sliding(2).foreach {
        case Array((k1, b1), (k2, b2)) =>
          assert(b1 <= b2, s"parts=$parts: bucket decreased $k1->$k2")
        case _ =>
      }
      // equal keys always share a bucket
      got.groupBy(_._1).foreach { case (k, g) =>
        assert(g.map(_._2).distinct.length == 1,
          s"parts=$parts: key $k split across buckets")
      }
      val ids = got.map(_._2).distinct
      assert(ids.length <= parts, s"parts=$parts produced ${ids.length} buckets")
    }
  }

  test("orderBuckets on a non-parquet frame sizes its sample in ONE " +
      "reservoir pass — no count() pre-scan (r17 verdict #5)") {
    val df = spark.range(5000)
      .select(col("id"), (col("id") % 97).as("k")).repartition(16)
    df.count() // materialize the shuffle before listening
    val jobs = new java.util.concurrent.atomic.AtomicLong()
    val tasks = new java.util.concurrent.atomic.AtomicLong()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(
          e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val bucket = PrefixSum.orderBuckets(df, Seq(col("k"), col("id")), 32)
      assert(bucket != null)
      // deterministic drain (no polling/sleep): orderBuckets' sampling
      // jobs have completed synchronously by now — only their listener
      // events may still be in flight on the async bus
      assert(org.apache.spark.graft.ListenerBridge
        .drain(spark.sparkContext, 10000), "listener bus drain timed out")
      // ONE pass: AQE materializes the repartition shuffle as its own
      // job, so the reservoir collect shows as ≤2 jobs / ≤33 tasks
      // (16 shuffle-map + 16 reservoir + merge). The old fallback ran
      // df.count() AND a sample scan on top — ≥4 jobs, ≥49 tasks.
      assert(jobs.get() <= 2, s"splitter sampling ran ${jobs.get()} jobs")
      // strictly below the old fallback's ≥49 (count() pre-scan adds a
      // 16-task scan job) but loose enough that a retried/speculative
      // task can't flake the suite — the jobs bound above is the
      // primary one-pass discriminator
      assert(tasks.get() < 49,
        s"splitter sampling ran ${tasks.get()} tasks — count() pre-scan?")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("SearchSortedCount equality is content-based: two independently " +
      "built orderBuckets columns over the same data compare equal, so " +
      "subexpression reuse survives callers that don't share the one " +
      "Column object (r18 verdict #4)") {
    val df = spark.range(2000)
      .select((col("id") % 53).as("k"), col("id"))
      .repartition(6, col("k"))
    // sampling is deterministic (seeded reservoir), so two independent
    // builds carry identical splitter CONTENT in distinct arrays —
    // exactly the case reference equality silently defeats. Compare the
    // RESOLVED expressions (how a fused plan sees them): unresolved
    // column nodes carry construction-site Origins that never compare
    // equal, which is Column-wrapper noise, not splitter semantics.
    def resolved(cols: org.apache.spark.sql.Column*) = df
      .select(cols.zipWithIndex.map { case (c, i) => c.as(s"b$i") }: _*)
      .queryExecution.analyzed.expressions
      .flatMap(_.collect {
        case s: graft.expressions.SearchSortedCount => s })
    val Seq(e1, e2) = resolved(
      PrefixSum.orderBuckets(df, Seq(col("k"), col("id")), 32),
      PrefixSum.orderBuckets(df, Seq(col("k"), col("id")), 32))
    assert(e1 == e2, "independently built buckets columns must be equal")
    assert(e1.hashCode == e2.hashCode, "equal expressions must hash equal")
    assert(e1.semanticEquals(e2),
      "semanticEquals must see through independently built splitters")
    // different splitter content (different fan-in) must NOT be equal
    val Seq(f1, f3) = resolved(
      PrefixSum.orderBuckets(df, Seq(col("k"), col("id")), 32),
      PrefixSum.orderBuckets(df, Seq(col("k"), col("id")), 8))
    assert(f1 != f3, "different splitter sets must not compare equal")
  }
}
