package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's phase-proofing logic (round-14 item #1).
  *
  * Round 13's official BENCH capture failed the 2× gate at 2.74×
  * purely on a host co-tenancy phase — 12 queries blew >10× in the
  * driver's single capture while four same-code runs measured
  * 1.14–1.60×. The fix re-measures outliers at suite end and computes
  * the gate ratio from per-query mins; these tests pin the selection
  * rule so the re-run path provably triggers on an r13-shaped blowup
  * and provably stays quiet on a healthy run.
  */
class BenchSpec extends AnyFunSuite {

  test("r13-shaped blowup triggers the re-run: >2x-of-reference and >1s") {
    // the actual r13 capture-vs-r7 shape: q71 125.5s vs ref 2.7s
    val measured = Map(
      "q71_decontaminate" -> 125.5,
      "q29_spatial" -> 11.1,
      "q1_time_bucket_agg" -> 0.9, // fast and close to ref: not selected
      "q2_wide_agg" -> 1.4) // 1.4 < 2*0.8: not selected
    val ref = Map(
      "q71_decontaminate" -> 2.7,
      "q29_spatial" -> 0.31,
      "q1_time_bucket_agg" -> 0.8,
      "q2_wide_agg" -> 0.8)
    val out = Bench.selectOutliers(measured, ref)
    assert(out === Seq("q71_decontaminate", "q29_spatial")) // slowest first
  }

  test("healthy run selects nothing (ratios inside 2x or under 1s)") {
    val measured = Map("a" -> 0.5, "b" -> 1.9, "c" -> 0.05)
    val ref = Map("a" -> 0.4, "b" -> 1.0, "c" -> 0.01)
    // c is 5x its ref but under the 1s absolute floor — re-measuring
    // sub-second noise would just thrash; b is 1.9 < 2*1.0
    assert(Bench.selectOutliers(measured, ref).isEmpty)
  }

  test("the 1s floor is a floor, not a gate: slow AND >2x selects") {
    assert(Bench.selectOutliers(Map("q" -> 2.1), Map("q" -> 1.0)) ===
      Seq("q"))
    // exactly at the threshold: NOT an outlier (strict >)
    assert(Bench.selectOutliers(Map("q" -> 2.0), Map("q" -> 1.0)).isEmpty)
  }

  test("queries without any reference recording are never selected") {
    assert(Bench.selectOutliers(Map("new_q" -> 99.0), Map.empty).isEmpty)
  }

  test("cap bounds the re-run set, keeping the slowest") {
    val measured = (1 to 30).map(i => s"q$i" -> i.toDouble).toMap
    val ref = (1 to 30).map(i => s"q$i" -> 0.1).toMap
    val out = Bench.selectOutliers(measured, ref, cap = 20)
    assert(out.size === 20)
    assert(out.head === "q30") // slowest first
    assert(!out.contains("q10")) // the 10 fastest outliers dropped
  }

  test("loadRefMap parses a BENCH_full-shaped file; missing file is empty") {
    val f = java.nio.file.Files.createTempFile("bench_ref", ".json")
    java.nio.file.Files.write(f,
      """{"metric":"total","value":3.1,"queries":{"q1":1.25,"q2":0.5},"sf":"x"}"""
        .getBytes("UTF-8"))
    val m = Bench.loadRefMap(f.toString)
    assert(m === Map("q1" -> 1.25, "q2" -> 0.5))
    assert(Bench.loadRefMap("/nonexistent/BENCH.json") === Map.empty)
    java.nio.file.Files.delete(f)
  }

  test("shuffle drift selects >1.5x growth on >=1MB priors, largest " +
      "first; small priors and missing priors never select") {
    val prior = Map("big" -> 10.0, "grew" -> 4.0, "tiny" -> 0.2,
      "shrank" -> 8.0)
    val current = Map(
      "big" -> 16.0,    // 1.6x on a 10MB prior -> selected
      "grew" -> 20.0,   // 5x on a 4MB prior -> selected, largest
      "tiny" -> 5.0,    // 25x but prior under 1MB -> excluded
      "shrank" -> 2.0,  // shrank -> excluded
      "fresh" -> 99.0)  // no prior recording -> excluded
    val drift = Bench.selectDrift(current, prior)
    assert(drift == Seq(("grew", 4.0, 20.0), ("big", 10.0, 16.0)),
      s"drift selection: $drift")
    // exactly-1.5x is NOT drift (strict >): the alarm can't flap on
    // a boundary value
    assert(Bench.selectDrift(Map("q" -> 1.5), Map("q" -> 1.0)).isEmpty)
  }

  test("wall drift: phase-normalized >1.5x on >=1s priors; faster box " +
      "never amplifies; fast-query jitter and phase slowdowns excluded") {
    val prior = Map("slow" -> 4.0, "fast" -> 0.4, "steady" -> 10.0,
      "phased" -> 4.0)
    val current = Map(
      "slow" -> 7.0,    // 1.75x at phase 1.0 -> selected
      "fast" -> 1.2,    // 3x but prior under 1s -> excluded
      "steady" -> 12.0, // 1.2x -> excluded
      "fresh" -> 50.0)  // no prior -> excluded
    val out = Bench.selectWallDrift(current, prior, phaseFactor = 1.0)
    assert(out == Seq(("slow", 4.0, 7.0)), s"wall drift: $out")
    // a 1.3x-slower box forgives a 1.7x wall ratio (1.7/1.3 < 1.5)...
    assert(Bench.selectWallDrift(Map("phased" -> 6.8), prior, 1.3).isEmpty)
    // ...but a FASTER box (factor <1) is clamped to 1.0, not divided
    // through — 1.6x wall on a 0.5x box must still trigger, and must
    // report the same pair as at factor 1.0
    assert(Bench.selectWallDrift(Map("phased" -> 6.4), prior, 0.5) ==
      Seq(("phased", 4.0, 6.4)))
    // exactly-1.5x is NOT drift (strict >, no boundary flap)
    assert(Bench.selectWallDrift(Map("slow" -> 6.0), prior, 1.0).isEmpty)
  }

  test("wall drift is corroborated: the real r17 trio (flat shuffle, " +
      "flat task-mem, ~1s moves) is a non-trigger; planted real " +
      "regressions still fire (r17 verdict #2)") {
    def res(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/graft/bench/$name")
      assert(in != null, s"missing fixture $name")
      try in.readAllBytes() finally in.close()
    }
    val priorB = res("BENCH_metrics_r16.json")
    val curB = res("BENCH_metrics_r17.json")
    val shufOf = (b: Array[Byte]) => {
      val rd = Bench.parseMetricsField(b, "shuffle_read_mb")
      val wr = Bench.parseMetricsField(b, "shuffle_write_mb")
      rd.map { case (k, v) => k -> (v + wr.getOrElse(k, 0.0)) }
    }
    val (shufPrior, shufCur) = (shufOf(priorB), shufOf(curB))
    val tmPrior = Bench.parseMetricsField(priorB, "peak_task_mem_mb")
    val tmCur = Bench.parseMetricsField(curB, "peak_task_mem_mb")
    // the official BENCH_r17 artifact (committed stderr tail): three
    // wall flags at phase factor 0.97, every one with BYTE-IDENTICAL
    // shuffle and task-mem telemetry across the rounds — the third
    // consecutive round of adjudicated-as-noise ratio-only flags
    val wallPrior = Map("q237_frequent_pairs" -> 1.16,
      "q108_rolling_range_window" -> 1.12, "q225_pagerank" -> 1.2)
    val wallCur = Map("q237_frequent_pairs" -> 2.19,
      "q108_rolling_range_window" -> 1.95, "q225_pagerank" -> 1.91)
    // pin that the fixture is the 3-flag scenario under the old rule
    val raw = Bench.selectWallDrift(wallCur, wallPrior, 0.97)
    assert(raw.size == 3, s"fixture no longer reproduces: $raw")
    // ...and the corroborated alarm clears all three
    val out = Bench.selectWallDrift(wallCur, wallPrior, 0.97,
      shufCur, shufPrior, tmCur, tmPrior)
    assert(out.isEmpty, s"trio still alarms: $out")
    // full-suite replay on the committed metrics recordings (main-
    // pass seconds): the corroborated rule is silent end to end
    val secPrior = Bench.parseMetricsField(priorB, "sec")
    val secCur = Bench.parseMetricsField(curB, "sec")
    val full = Bench.selectWallDrift(secCur, secPrior, 0.97,
      shufCur, shufPrior, tmCur, tmPrior)
    assert(full.isEmpty, s"full replay alarms: $full")
    // planted regression 1 — big CPU-only move, plan telemetry flat:
    // a 2x slowdown on a 3s query moves 3s, far past the ~1s noise
    // window, so flat shuffle/task-mem must NOT exonerate it
    val k = "q238_incremental_components"
    val cpuOnly = Bench.selectWallDrift(
      secCur + (k -> secPrior(k) * 2.0), secPrior, 0.97,
      shufCur, shufPrior, tmCur, tmPrior)
    assert(cpuOnly.map(_._1) == Seq(k), s"planted CPU blowup: $cpuOnly")
    // planted regression 2 — a short-query move INSIDE the noise
    // window but with grown shuffle (a plan change): fires
    val j = "q237_frequent_pairs"
    val planChange = Bench.selectWallDrift(wallCur, wallPrior, 0.97,
      shufCur + (j -> shufPrior(j) * 2.5), shufPrior, tmCur, tmPrior)
    assert(planChange.map(_._1) == Seq(j), s"planted plan change: $planChange")
    // planted regression 3 — same, but the working set grew instead
    val memChange = Bench.selectWallDrift(wallCur, wallPrior, 0.97,
      shufCur, shufPrior, tmCur + (j -> 200.0), tmPrior)
    assert(memChange.map(_._1) == Seq(j), s"planted mem change: $memChange")
    // missing telemetry fails OPEN: with no corroborating maps at
    // all, the trio flags exactly as the old rule did
    assert(Bench.selectWallDrift(wallCur, wallPrior, 0.97).size == 3)
  }

  test("heap ceiling: a driver-side blowup (>12x AND >4GiB) fires " +
      "with task memory flat — the corroboration blind spot is " +
      "bounded (r17 ADVICE)") {
    val prior = Map("a" -> 250.0, "b" -> 250.0, "c" -> 250.0,
      "blow" -> 300.0)
    val tm = Map("a" -> 100.0, "b" -> 100.0, "c" -> 100.0,
      "blow" -> 100.0)
    // oversized collected splitters / broadcast blowup signature:
    // retained heap 15x to 4.5 GiB, execution memory untouched
    val blowup = Map("a" -> 250.0, "b" -> 250.0, "c" -> 250.0,
      "blow" -> 4500.0)
    assert(Bench.selectHeapDrift(blowup, prior, tm, tm) ==
      Seq(("blow", 300.0, 4500.0)))
    // under either bound the task-mem exoneration still applies:
    // 10x to 3 GiB with flat task-mem stays quiet (collector regime)
    assert(Bench.selectHeapDrift(
      blowup + ("blow" -> 3000.0), prior, tm, tm).isEmpty)
  }

  test("heap drift: paired growth ratio >4x AND >2x the suite median; " +
      "session shifts, ramps and collector clusters never alarm") {
    val prior = Map("a" -> 250.0, "b" -> 250.0, "c" -> 250.0,
      "small" -> 20.0, "blow" -> 250.0)
    // failure mode 1 (r16 session 2): EVERY query ~3.5x higher
    // (collector plateau) — the median moves with it, zero alarms
    val plateau = Map("a" -> 880.0, "b" -> 880.0, "c" -> 880.0,
      "small" -> 70.0, "blow" -> 880.0)
    assert(Bench.selectHeapDrift(plateau, prior).isEmpty,
      "uniform plateau shift must not alarm")
    // failure mode 2 (session 3): session-wide SHRINK — flat queries
    // are not drift (growth-only + absolute gate)
    val shrink = Map("a" -> 80.0, "b" -> 80.0, "c" -> 80.0,
      "small" -> 6.0, "blow" -> 250.0)
    assert(Bench.selectHeapDrift(shrink, prior).isEmpty)
    // failure mode 3 (session 5): a CONTIGUOUS positional cluster at
    // ~3.3x while the rest sit at 1x — late-collection noise, under
    // the 4x absolute gate, no alarm
    val cluster = Map("a" -> 825.0, "b" -> 820.0, "c" -> 250.0,
      "small" -> 20.0, "blow" -> 250.0)
    assert(Bench.selectHeapDrift(cluster, prior).isEmpty,
      "3.3x collector cluster must not alarm")
    // the q203 class: one query 9x above an unchanged suite -> fires
    val blowup = Map("a" -> 250.0, "b" -> 250.0, "c" -> 250.0,
      "small" -> 180.0, "blow" -> 2250.0)
    val out = Bench.selectHeapDrift(blowup, prior)
    // 'small' grew 9x too but its prior is under the 64MB floor
    assert(out == Seq(("blow", 250.0, 2250.0)), s"heap drift: $out")
    // the blowup survives a simultaneous plateau shift (31x vs 3.5x)
    val both = Map("a" -> 880.0, "b" -> 880.0, "c" -> 880.0,
      "small" -> 70.0, "blow" -> 7920.0)
    assert(Bench.selectHeapDrift(both, prior) ==
      Seq(("blow", 250.0, 7920.0)))
    // ...and a 5x grower still fires during a session-wide shrink
    assert(Bench.selectHeapDrift(shrink ++ Map("blow" -> 1250.0), prior)
      == Seq(("blow", 250.0, 1250.0)))
    // exactly-4x is NOT drift (strict >)
    assert(Bench.selectHeapDrift(
      Map("a" -> 100.0, "b" -> 100.0, "q" -> 400.0),
      Map("a" -> 100.0, "b" -> 100.0, "q" -> 100.0)).isEmpty)
  }

  test("heap drift is task-mem corroborated: flat execution memory " +
      "exonerates a retained-heap flag; growth or absence does not") {
    val prior = Map("a" -> 250.0, "b" -> 250.0, "c" -> 250.0,
      "blow" -> 250.0)
    val blowup = Map("a" -> 250.0, "b" -> 250.0, "c" -> 250.0,
      "blow" -> 2250.0)
    val tmPrior = Map("a" -> 100.0, "b" -> 100.0, "c" -> 100.0,
      "blow" -> 100.0)
    // a real q203-class regression allocates in execution memory:
    // task-mem grew 9x alongside heap -> fires
    assert(Bench.selectHeapDrift(blowup, prior,
      tmPrior ++ Map("blow" -> 900.0), tmPrior) ==
      Seq(("blow", 250.0, 2250.0)))
    // collector plateau signature: heap 9x but task-mem FLAT -> quiet
    assert(Bench.selectHeapDrift(blowup, prior, tmPrior, tmPrior).isEmpty,
      "flat task memory must exonerate a retained-heap flag")
    // near-zero task-mem prior (control-plane query): corroborated
    // only by a material absolute footprint
    assert(Bench.selectHeapDrift(blowup, prior,
      tmPrior ++ Map("blow" -> 8.0), tmPrior ++ Map("blow" -> 0.0))
      .isEmpty)
    assert(Bench.selectHeapDrift(blowup, prior,
      tmPrior ++ Map("blow" -> 128.0), tmPrior ++ Map("blow" -> 0.0)) ==
      Seq(("blow", 250.0, 2250.0)))
    // no task-mem telemetry at all -> fail OPEN (a format regression
    // in the metrics writer must not silently disarm the alarm)
    assert(Bench.selectHeapDrift(blowup, prior) ==
      Seq(("blow", 250.0, 2250.0)))
  }

  test("the real r16 86-flag plateau metrics are a non-trigger " +
      "(committed driver capture replayed verbatim)") {
    // the r16 artifact of record carried heap_drift_count=86: one
    // alphabetically-contiguous collector plateau (uniform
    // 2245-2363 MB band, suite median growth 0.99) covering 26% of
    // the suite — too narrow for the >2x-median cancel, task-mem and
    // wall drift both 0 on the same capture. These are the two
    // committed BENCH_metrics files that produced it, verbatim.
    def res(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/graft/bench/$name")
      assert(in != null, s"missing fixture $name")
      try in.readAllBytes() finally in.close()
    }
    val priorB = res("BENCH_metrics_r15.json")
    val curB = res("BENCH_metrics_r16.json")
    val heapPrior = Bench.parseMetricsField(priorB, "heap_after_gc_mb")
    val heapCur = Bench.parseMetricsField(curB, "heap_after_gc_mb")
    val tmPrior = Bench.parseMetricsField(priorB, "peak_task_mem_mb")
    val tmCur = Bench.parseMetricsField(curB, "peak_task_mem_mb")
    assert(heapPrior.size > 300 && tmPrior.size > 300,
      s"fixture shrank: ${heapPrior.size}/${tmPrior.size} entries")
    // pin that the fixture really is the 86-flag scenario: the
    // UNCORROBORATED rule (what ran in r16) flags exactly 86
    val raw = Bench.pairedGrowthDrift(heapCur, heapPrior,
      floor = 64.0, minRatio = 4.0)
    assert(raw.size == 86, s"fixture no longer reproduces: ${raw.size}")
    // ...and the corroborated alarm clears every one of them
    val out = Bench.selectHeapDrift(heapCur, heapPrior, tmCur, tmPrior)
    assert(out.isEmpty, s"plateau still alarms: ${out.take(5)}")
    // the same fixture must NOT mask a real regression: plant the
    // q203-class blowup (9x heap, 9x task-mem) on top of the plateau
    val k = "q203_lsh_recall"
    val planted = Bench.selectHeapDrift(
      heapCur + (k -> heapPrior(k) * 9.0), heapPrior,
      tmCur + (k -> (tmPrior(k) max 32.0) * 9.0), tmPrior)
    assert(planted.map(_._1) == Seq(k), s"planted blowup: $planted")
  }

  test("the real r18 133-flag ceiling plateau replays: old rule 133 " +
      "per-query flags, split rule 0 per-query + 1 session plateau " +
      "(committed driver capture replayed verbatim)") {
    // the r18 artifact of record carried heap_drift_count=133: the
    // r18-added absolute ceiling (>12x AND >4 GiB, calibrated on the
    // r16 plateau max of 2363 MB) fired on a suite-wide collector
    // plateau — a 5332-5798 MB band over alphabetical positions
    // 101-251 (max positional gap 7), task-mem dead flat, values
    // recovering to ~2 GB later in the suite. These are the two
    // committed BENCH_metrics files that produced it, verbatim:
    // the prior the driver compared against is the BUILDER'S closing
    // bench of the r18 tree (commit d2c78dc — NOT the r17 driver
    // capture, which is the separate BENCH_metrics_r17.json fixture
    // the wall-trio test replays), the current is what the driver
    // wrote (commit 0f0d31a).
    def res(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/graft/bench/$name")
      assert(in != null, s"missing fixture $name")
      try in.readAllBytes() finally in.close()
    }
    val priorB = res("BENCH_metrics_r18_prior.json")
    val curB = res("BENCH_metrics_r18.json")
    val heapPrior = Bench.parseMetricsField(priorB, "heap_after_gc_mb")
    val heapCur = Bench.parseMetricsField(curB, "heap_after_gc_mb")
    val tmPrior = Bench.parseMetricsField(priorB, "peak_task_mem_mb")
    val tmCur = Bench.parseMetricsField(curB, "peak_task_mem_mb")
    assert(heapPrior.size >= 333 && tmPrior.size >= 333,
      s"fixture shrank: ${heapPrior.size}/${tmPrior.size} entries")
    // pin that the fixture really is the 133-flag scenario, and that
    // every flag took the uncorroborated CEILING path (task-mem was
    // flat — the corroborated ratio path fired on none of them)
    val flags = Bench.selectHeapDrift(heapCur, heapPrior, tmCur, tmPrior)
    assert(flags.size == 133, s"fixture no longer reproduces: ${flags.size}")
    assert(flags.forall { case (_, p, c) => Bench.heapCeiling(p, c) },
      "a flag passed the corroborated path — not the r18 scenario")
    // the split rule: run order is alphabetical (Bench sorts selected
    // queries by name) — the 133 collapse to ONE session plateau
    val order = heapCur.keys.toSeq.sorted
    val (perQuery, plateaus) = Bench.splitHeapPlateau(flags, order)
    assert(perQuery.isEmpty, s"per-query flags survive: ${perQuery.take(5)}")
    assert(plateaus.size == 1, s"plateau runs: ${plateaus.size}")
    assert(plateaus.head.size == 133)
    // the same fixture must NOT mask a real driver blowup: plant a
    // 13x/12 GiB retained-heap regression (task-mem flat — the
    // driver-side signature) on a query INSIDE the plateau's
    // positional stretch but far off its value band. It chains with
    // no neighbor (5798*0.85 > 5332*1.15 fails against 12288) and
    // fires individually while the 133 still cancel.
    val k = "q21_dedup_exact"
    assert(flags.exists(_._1 == k), "planted key must sit in the plateau")
    val plantedFlags = Bench.selectHeapDrift(
      heapCur + (k -> 12288.0), heapPrior, tmCur, tmPrior)
    val (perQ2, plat2) = Bench.splitHeapPlateau(plantedFlags, order)
    assert(perQ2.map(_._1) == Seq(k), s"planted blowup: $perQ2")
    assert(plat2.size >= 1 && plat2.map(_.size).sum == 132,
      s"plateau broke: ${plat2.map(_.size)}")
  }

  test("heap plateau split: a lone 13x/5GiB ceiling flag fires " +
      "individually; >=8 tight-band contiguous flags cancel to one " +
      "session plateau; corroborated flags never join a plateau") {
    val order = (0 until 40).map(i => f"q$i%02d")
    def flat(v: Double) = order.map(_ -> v).toMap
    // a single driver blowup among flat neighbors: 13x to 5.2 GiB
    val lone = Seq(("q17", 400.0, 5200.0))
    val (p1, runs1) = Bench.splitHeapPlateau(lone, order)
    assert(p1 == lone && runs1.isEmpty,
      "an isolated ceiling flag must still fire per-query")
    // eight contiguous flags in a +-4% band -> one plateau, zero
    // per-query
    val plateau = (10 until 18).map { i =>
      (f"q$i%02d", 400.0, 5300.0 + 40 * (i - 10)) }
    val (p2, runs2) = Bench.splitHeapPlateau(plateau, order)
    assert(p2.isEmpty && runs2.map(_.size) == Seq(8), s"$p2 / $runs2")
    // seven is below minRun: still per-query
    val (p3, runs3) = Bench.splitHeapPlateau(plateau.take(7), order)
    assert(p3.size == 7 && runs3.isEmpty)
    // a value >18% off the band splits the chain and fires alone
    val mixed = plateau :+ (("q18", 500.0, 12000.0))
    val (p4, runs4) = Bench.splitHeapPlateau(mixed, order)
    assert(p4.map(_._1) == Seq("q18") && runs4.map(_.size) == Seq(8),
      s"$p4 / $runs4")
    // a positional gap past maxGap (20) splits the chain even inside
    // the band: 6 + 6 tight flags 25 positions apart stay per-query
    val farApart = (0 until 6).map(i => (f"q$i%02d", 400.0, 5300.0)) ++
      (31 until 37).map(i => (f"q$i%02d", 400.0, 5300.0))
    val orderLong = (0 until 40).map(i => f"q$i%02d")
    val (p5, runs5) = Bench.splitHeapPlateau(farApart, orderLong)
    assert(p5.size == 12 && runs5.isEmpty, s"$p5 / $runs5")
    // a CORROBORATED flag (under the ceiling) inside the band's
    // positions never joins the plateau — task-mem growth is a
    // query-attributable signature
    val withCorrob = plateau :+ (("q19", 800.0, 3300.0))
    val (p6, runs6) = Bench.splitHeapPlateau(withCorrob, order)
    assert(p6.map(_._1) == Seq("q19") && runs6.map(_.size) == Seq(8))
    // a flag with no position in the order fails open to per-query
    val (p7, runs7) = Bench.splitHeapPlateau(
      plateau :+ (("q_unknown", 400.0, 5400.0)), order)
    assert(p7.map(_._1) == Seq("q_unknown") && runs7.map(_.size) == Seq(8))
    assert(flat(0.0).size == order.size) // keep helper used
  }

  test("task-mem drift: query-attributable 2x paired gate on >=32MB " +
      "priors; uniform partition-count shifts cancel") {
    // the r16 observation: a uniform 0.5x shift (prior round ran at
    // different parallelism) with per-query noise within 10%
    val prior = Map("a" -> 100.0, "b" -> 200.0, "c" -> 64.0,
      "tiny" -> 16.0)
    val uniform = Map("a" -> 52.0, "b" -> 104.0, "c" -> 33.0,
      "tiny" -> 8.0)
    assert(Bench.selectTaskMemDrift(uniform, prior).isEmpty)
    // a real working-set regression: one query 4x while others flat
    val blown = Map("a" -> 400.0, "b" -> 200.0, "c" -> 64.0,
      "tiny" -> 160.0)
    // 'tiny' is 10x but under the 32MB floor
    assert(Bench.selectTaskMemDrift(blown, prior) ==
      Seq(("a", 100.0, 400.0)))
    // exactly-2x is NOT drift
    assert(Bench.selectTaskMemDrift(
      Map("a" -> 200.0, "b" -> 200.0, "c" -> 64.0),
      Map("a" -> 100.0, "b" -> 200.0, "c" -> 64.0)).isEmpty)
  }

  test("committed BENCH_metrics carries heap_after_gc_mb (the heap " +
      "alarm's baseline)") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BENCH_metrics.json")))
    var n = 0; var withHeap = 0
    val it = root.fields()
    while (it.hasNext) {
      val e = it.next(); n += 1
      if (e.getValue.has("heap_after_gc_mb")) withHeap += 1
    }
    assert(withHeap == n,
      s"only $withHeap of $n metrics rows carry heap_after_gc_mb")
  }

  test("committed BENCH_metrics carries shuffle fields (the drift " +
      "alarm's baseline)") {
    // the drift alarm compares against the PRIOR round's committed
    // recording; if that file loses its shuffle fields (a format
    // regression in the metrics writer), the alarm silently never
    // fires — fail loudly here instead, like the r7 guard below
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BENCH_metrics.json")))
    var n = 0; var withShuffle = 0
    val it = root.fields()
    while (it.hasNext) {
      val e = it.next(); n += 1
      if (e.getValue.has("shuffle_read_mb") &&
        e.getValue.has("shuffle_write_mb") &&
        e.getValue.has("peak_task_mem_mb")) withShuffle += 1
    }
    assert(n > 300, s"metrics baseline shrank to $n entries")
    assert(withShuffle == n,
      s"only $withShuffle of $n metrics rows carry shuffle fields")
  }

  test("renderCaps: stable tag-sorted JSON; empty map renders {}") {
    assert(Bench.renderCaps(Map.empty) == "{}")
    val json = Bench.renderCaps(Map(
      "minhash" -> ((100L, 3L, 1L)), "docfreq" -> ((12L, 10L, 1L))))
    assert(json ==
      """{"docfreq":{"input_rows":12,"dropped_rows":10,"capped_groups":1},"minhash":{"input_rows":100,"dropped_rows":3,"capped_groups":1}}""")
    // must parse as JSON (the metrics file is machine-read next round)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(om.readTree(json).get("docfreq").get("dropped_rows")
      .asLong() == 10L)
    // a hostile tag (quote/backslash/control) must stay inside its
    // string — corrupt caps JSON would silently break every parse-
    // based gate next round (r17 ADVICE)
    val weird = Bench.renderCaps(Map("a\"b\\c\nd" -> ((1L, 2L, 3L))))
    val node = om.readTree(weird)
    assert(node.get("a\"b\\c\nd").get("dropped_rows").asLong() == 2L)
  }

  test("committed BENCH_metrics carries the caps field (the cap-" +
      "engagement telemetry's baseline)") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BENCH_metrics.json")))
    var n = 0; var withCaps = 0
    val it = root.fields()
    while (it.hasNext) {
      val e = it.next(); n += 1
      if (e.getValue.has("caps")) withCaps += 1
    }
    assert(withCaps == n,
      s"only $withCaps of $n metrics rows carry the caps field")
  }

  test("committed r7 recording actually loads (the gate's reference)") {
    val r7 = Bench.loadRefMap("BENCH_full_r07.json")
    // the r7 overlap gate is defined over ~200 queries; if this file
    // stops parsing, outlier selection silently never triggers — fail
    // loudly here instead
    assert(r7.size > 150, s"r7 reference shrank to ${r7.size} entries")
    assert(r7.contains("q1_time_bucket_agg"))
  }

  test("committed frozen r18 anchor loads and covers the 133 post-r7 " +
      "queries (the second overlap gate's reference)") {
    val r18 = Bench.loadRefMap("BENCH_full_r18.json")
    val r7 = Bench.loadRefMap("BENCH_full_r07.json")
    assert(r18.size >= 333, s"r18 anchor shrank to ${r18.size} entries")
    // the anchor exists precisely for the queries r7 does not cover —
    // their outlier selection and overlap ratio previously tracked a
    // MOVING prior (r18 verdict #7)
    val post = r18.keySet -- r7.keySet
    assert(post.size >= 133, s"post-r7 coverage shrank to ${post.size}")
    assert(r18.contains("q331_feistel_epoch_shuffle") &&
      r18.contains("q250_curation_pipeline"))
  }
}
