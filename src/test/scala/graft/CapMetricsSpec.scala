package graft

import org.apache.spark.sql.functions._

import graft.operators.{CapMetrics, Dedup}

/** The LSH hot-key caps must TELL the user what they dropped: at
  * 100 TB a silently-capped bucket is an operability hazard. The cap
  * telemetry rides the width pass as an observe() aggregate (zero
  * extra jobs) and surfaces via a QueryExecutionListener. */
class CapMetricsSpec extends SparkSpec {

  import spark.implicits._

  private def await(pred: () => Boolean, ms: Long = 10000): Boolean = {
    val deadline = System.currentTimeMillis() + ms
    while (!pred() && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    pred()
  }

  test("capDocFreq emits exact dropped-row / capped-group counts") {
    CapMetrics.reset()
    val rows = (1 to 10).map(i => (i.toLong, "hot")) ++
      Seq((11L, "cold"), (12L, "cold"))
    val df = rows.toDF("doc_id", "h")
    val kept = Dedup.capDocFreq(df, cap = 3, keyCol = "h")
    assert(kept.count() === 2) // only the two 'cold' rows survive
    // match the planted observation by its full signature, not by tag
    // alone: suites share one session and run concurrently, so a
    // registry query's docfreq observation (q332 et al. in
    // QueriesSmokeSpec) can land in the same global snapshot
    assert(await(() => CapMetrics.snapshot().exists { case (k, m) =>
        k.startsWith("graft.cap.docfreq") &&
          m.getAs[Long]("input_rows") == 12L &&
          m.getAs[Long]("dropped_rows") == 10L &&
          m.getAs[Long]("capped_groups") == 1L &&
          m.getAs[Long]("max_width") == 10L
      }), "planted docfreq observation never arrived: " +
        CapMetrics.snapshot().take(5))
    // the cumulative per-tag totals the bench harness delta-samples
    // (r16 verdict #7): keyed by tag with the sequence suffix
    // stripped, monotone across observations
    val before = CapMetrics.cumulativeTotals().getOrElse("docfreq",
      (0L, 0L, 0L))
    assert(before._1 >= 12L && before._2 >= 10L && before._3 >= 1L,
      s"cumulative docfreq totals: $before")
    assert(Dedup.capDocFreq(df, cap = 3, keyCol = "h").count() === 2)
    assert(await(() => CapMetrics.cumulativeTotals()("docfreq")._1 >=
      before._1 + 12L), "second observation did not accumulate")
    // >= not ==: a concurrent suite's docfreq observation may have
    // accumulated between the two samples (shared global registry)
    val after = CapMetrics.cumulativeTotals()("docfreq")
    assert(after._2 >= before._2 + 10L && after._3 >= before._3 + 1L,
      s"delta: $before -> $after")
  }

  test("minHashLsh bucket cap reports through the same channel and " +
      "a pass-through cap observes nothing") {
    CapMetrics.reset()
    // 6 near-identical docs (one shared template) collapse to band
    // buckets of width 6 — cap 4 drops them — plus a width-2 bucket
    // (docs 7/8 identical) that SURVIVES the cap. The survivor matters
    // beyond realism: if the cap empties the join entirely, AQE's
    // empty-relation propagation deletes the subtree INCLUDING the
    // CollectMetrics node, and no observation ever fires (a Spark
    // behavior this spec documents). Docs need >= 3 words for
    // 3-shingles.
    val template = "the quick brown fox jumps over the lazy dog"
    val dup = "alpha beta gamma delta epsilon"
    val docs = ((1 to 6).map(i => (i.toLong, template)) ++
      Seq((7L, dup), (8L, dup))).toDF("doc_id", "text")
    val pairs = Dedup.minHashLsh(docs, k = 3, numHashes = 8, bands = 4,
      maxBucketWidth = 4)
    pairs.count()
    // planted signature (8 docs × 4 bands = 32 band rows, template
    // bucket width 6), not any-minhash: q334 and DedupSpec emit
    // concurrent minhash observations into the shared registry
    assert(await(() => CapMetrics.snapshot().exists { case (k, m) =>
        k.startsWith("graft.cap.minhash") &&
          m.getAs[Long]("input_rows") == 32L &&
          m.getAs[Long]("dropped_rows") > 0L &&
          m.getAs[Long]("max_width") == 6L
      }), "planted minhash observation never arrived")

    // Int.MaxValue = cap off: no width pass, no observation — checked
    // by the planted fixture's signature never re-appearing after the
    // reset (global emptiness cannot be asserted while other suites
    // observe into the same registry); drain the bus so an in-flight
    // observation of the UNCAPPED run (if one wrongly existed) would
    // have landed before the assertion
    CapMetrics.reset()
    Dedup.minHashLsh(docs, k = 3, numHashes = 8, bands = 4).count()
    org.apache.spark.graft.ListenerBridge
      .drain(spark.sparkContext, 5000)
    assert(!CapMetrics.snapshot().exists { case (k, m) =>
      k.startsWith("graft.cap.minhash") &&
        m.getAs[Long]("input_rows") == 32L
    }, "uncapped minHashLsh ran a width pass")
  }

  test("a planted hot key flows END-TO-END through the bench wiring: " +
      "delta-sampled totals render as nonzero dropped_rows in the " +
      "caps JSON (r17 verdict #3)") {
    // the exact per-query sequence Bench.main runs: sample cumulative
    // totals, execute the query, sample again, delta, render — so a
    // real truncation provably reaches the BENCH_metrics artifact
    // (three rounds of committed caps showed only dropped_rows=0;
    // q332 now engages on the real corpus, this pins the wiring on a
    // planted one)
    val boiler = "subscribe to our newsletter for updates today"
    val docs = ((1 to 9).map(i => (i.toLong, s"$boiler extra$i")) ++
      Seq((10L, "one unique document body here"))).toDF("doc_id", "text")
    val caps0 = CapMetrics.cumulativeTotals()
    // q332's exact operator chain at its cap of 6: the boilerplate
    // shingles hit doc-freq 9 and every one of their rows drops
    Dedup.capDocFreq(Dedup.shingleSets(docs, 3), cap = 6,
      keyCol = "shingle").count()
    assert(await(() => Bench.capsDelta(caps0,
        CapMetrics.cumulativeTotals()).get("docfreq").exists(_._2 > 0)),
      "docfreq truncation never reached the cumulative totals")
    val delta = Bench.capsDelta(caps0, CapMetrics.cumulativeTotals())
    val json = Bench.renderCaps(delta)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val dropped = om.readTree(json).get("docfreq").get("dropped_rows")
      .asLong()
    assert(dropped > 0L, s"rendered caps carry no truncation: $json")
    assert(om.readTree(json).get("docfreq").get("capped_groups")
      .asLong() > 0L)
  }
}
