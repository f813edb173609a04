package graft

import org.apache.spark.sql.functions._

/** Round-12 training-data curation queries (TrainOps): plan-shape
  * pins for the 100 TB postures the Scaladoc claims, plus semantic
  * range checks the hash oracle can't express (the oracle proves
  * equality, not that the numbers mean anything).
  */
class TrainOpsSpec extends SparkSpec {

  test("q262 novelty audit: keyed equi-join against the train gram " +
      "set — never pairwise, never a corpus broadcast") {
    val p = plan("q262_ngram_novelty")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"novelty membership must ride the gram equi-join:\n$p")
  }

  test("q262 novelty values: held-out docs only, novelty in [0,1], " +
      "and a fully-duplicated doc scores 0") {
    val out = queries.Registry.queries("q262_ngram_novelty")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("doc_id") % 10 >= 8))
    assert(out.forall { r =>
      val n = r.getAs[Double]("novelty"); n >= 0.0 && n <= 1.0 })
  }

  test("q263 Heaps fit is one scan + one hash aggregate: no join, " +
      "no window anywhere in the plan") {
    val p = plan("q263_heaps_fit")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"the moment reduction must stay scan-shaped:\n$p")
  }

  test("q263 fit quality: slopes in (0,1) (vocabulary grows " +
      "sublinearly) and r2 in (0,1]") {
    val out = queries.Registry.queries("q263_heaps_fit")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val slope = r.getAs[Double]("slope")
      val r2 = r.getAs[Double]("r2")
      assert(slope > 0.0 && slope < 1.0, s"Heaps slope $slope")
      assert(r2 > 0.0 && r2 <= 1.0, s"r2 $r2")
    }
  }

  test("q264 RRF rankings are limit-pruned: the rank<=50/10 filters " +
      "keep per-partition top-k, never a full per-source sort") {
    val p = plan("q264_rank_fusion")
    assert(p.contains("WindowGroupLimit") ||
      p.contains("TakeOrderedAndProject"),
      s"rank-limit pushdown did not engage:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"fusion join must stay keyed:\n$p")
  }

  test("q265 DPO pairs come from struct-arg aggregates, not a " +
      "window sort of each group") {
    val p = plan("q265_dpo_pairs")
    assert(!p.contains("Window"),
      s"chosen/rejected must be bounded-state aggregates:\n$p")
    assert(!p.contains("Join"),
      s"one aggregate, no self-join:\n$p")
  }

  test("q265 margins: chosen strictly above rejected by the " +
      "threshold, ids distinct") {
    val out = queries.Registry.queries("q265_dpo_pairs")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("margin") >= 0.05)
      assert(r.getAs[Long]("chosen_id") != r.getAs[Long]("rejected_id"))
    }
  }

  test("q266 token entropy is scan-shaped: two hash aggregates, " +
      "no join, no window") {
    val p = plan("q266_token_entropy")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"entropy must reduce map-side:\n$p")
  }

  test("q266 entropy bounds: 0 <= H <= ln(n_tokens)") {
    val out = queries.Registry.queries("q266_token_entropy")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val n = r.getAs[Long]("n_tokens")
      assert(h >= -1e-9 && h <= math.log(n.toDouble) + 1e-6,
        s"entropy $h outside [0, ln($n)]")
    }
  }

  test("q267 margin criterion: margins positive, best-neighbor " +
      "cosine at or above its own top-4 mean times the margin") {
    val out = queries.Registry.queries("q267_margin_bitext")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    // parity split: queries even, candidates odd
    assert(out.forall(r => r.getAs[Long]("query_id") % 2 == 0))
    assert(out.forall(r => r.getAs[Long]("cand_id") % 2 == 1))
    assert(out.forall(_.getAs[Double]("margin") > 0.0))
    // the margin denominator averages the two endpoints' top-4 means,
    // and cosine is the MAX of the query's top-4 — so margin can only
    // fall below ~cos/1.0 when the candidate side is a hub; sanity:
    // margin never exceeds cos / (cos/2) = 2 by construction here
    assert(out.forall(_.getAs[Double]("margin") < 2.0))
  }

  test("q281 Zipf rank window is limit-pruned (rk<=100 keeps " +
      "per-partition top-k, never each source's full vocabulary)") {
    val p = plan("q281_zipf_fit")
    assert(p.contains("WindowGroupLimit") ||
      p.contains("TakeOrderedAndProject"),
      s"rank-limit pushdown did not engage:\n$p")
  }

  test("q281 Zipf slopes are negative (frequency falls with rank) " +
      "with a strong fit on natural-ish text") {
    val out = queries.Registry.queries("q281_zipf_fit")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("slope") < 0.0,
        s"Zipf slope must be negative: $r")
      val r2 = r.getAs[Double]("r2")
      assert(r2 > 0.0 && r2 <= 1.0)
    }
  }

  test("q282 streaming novelty equals the q262 batch audit row for " +
      "row (train-offline/audit-online == audit-offline)") {
    val batch = queries.Registry.queries("q262_ngram_novelty")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val stream = queries.Registry.queries("q282_stream_novelty")(
      spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"))).toSet
    assert(stream == batch,
      s"stream twin diverged: only-batch=${batch -- stream} " +
        s"only-stream=${stream -- batch}")
  }

  test("q283 DoReMi weights: a proper distribution (sum 1 within " +
      "per-source quantization), every excess KL >= 0 (Gibbs), and " +
      "the update actually moved mass off uniform") {
    val out = queries.Registry.queries("q283_doremi_mix")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    val ws = out.map(_.getAs[Double]("weight"))
    assert(ws.forall(_ > 0.0))
    val tol = 2e-6 * ws.length
    assert(math.abs(ws.sum - 1.0) <= tol,
      s"weights must renormalize to 1, got ${ws.sum}")
    assert(ws.distinct.length > 1,
      "multiplicative update left every weight identical")
    assert(out.forall(_.getAs[Double]("excess_kl") >= 0.0),
      "KL(p_source ‖ p_mixture) must be non-negative")
  }

  test("q283 plan: the MW iteration's outputs are checkpointed " +
      "leaves and the token table reads the cache — the final plan " +
      "executes no fresh corpus scan") {
    val p = plan("q283_doremi_mix")
    // final weights + final KL: two ExistingRDD leaves (the plan
    // STRING still renders the InMemoryRelation's cached child, so
    // parquet-absence can't be asserted textually — the executed
    // reads are the checkpoint and the cache)
    assert("Scan ExistingRDD".r.findAllIn(p).length >= 2,
      s"round outputs must be checkpointed leaves:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"the token table must read the persisted aggregate:\n$p")
  }

  test("q287 greedy allocation: epochs are non-increasing in quality " +
      "order, capped at 4, and the budget is spent exactly") {
    val out = queries.Registry.queries("q287_epoch_allocation")(
      spark, sf).collect()
    assert(out.nonEmpty)
    val byQ = out.sortBy(r => (-r.getAs[Double]("quality"),
      r.getAs[String]("source")))
    val eps = byQ.map(_.getAs[Double]("epochs"))
    assert(eps.forall(e => e >= 0.0 && e <= 4.0))
    assert(eps.zip(eps.tail).forall { case (a, b) => a >= b },
      s"greedy fill must allocate top-quality first: ${eps.toSeq}")
    val totTokens = out.map(_.getAs[Long]("tokens")).sum
    val totAlloc = out.map(_.getAs[Long]("alloc_tokens")).sum
    assert(totAlloc == 2L * totTokens,
      s"budget 2x corpus must be spent exactly: $totAlloc vs " +
        s"${2L * totTokens}")
  }

  test("q289 span corruption: mask counts match the closed form, " +
      "every span opens with its numbered sentinel") {
    val out = queries.Registry.queries("q289_span_corruption")(
      spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_tokens").toInt
      val expMasked = (0 until n).count(i => (i / 3) % 7 == 0)
      val expSpans = (0 until n).count(i =>
        (i / 3) % 7 == 0 && i % 21 == 0)
      assert(r.getAs[Long]("n_masked") == expMasked.toLong)
      assert(r.getAs[Long]("n_spans") == expSpans.toLong)
      val inputs = r.getAs[String]("inputs")
      val targets = r.getAs[String]("targets")
      if (n > 0) {
        assert(inputs.startsWith("<extra_id_0>"))
        assert(targets.startsWith("<extra_id_0> "))
      }
      // inputs + targets partition the tokens: every token appears
      // exactly once across the two sides (plus one sentinel pair
      // per span)
      val inToks = inputs.split(" ").count(!_.startsWith("<extra_id_"))
      val tgToks = targets.split(" ")
        .count(!_.startsWith("<extra_id_"))
      assert(inToks + tgToks == n,
        s"tokens must partition: $inToks + $tgToks != $n")
    }
  }

  test("q301 HRW growth moves only onto the NEW shards; mod moves far more") {
    // the provable rendezvous property: argmax over a superset either
    // stays put or lands on an added shard — recompute both argmaxes
    // here and assert containment doc by doc
    def h(doc: Long, s: Int): Long =
      (((doc % 100000007L) + (s + 1L) * 40503L) * 2654435761L) %
        4294967296L
    def hrw(doc: Long, n: Int): Int =
      (0 until n).maxBy(s => (h(doc, s), -s))
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val moved = docs.filter(d => hrw(d, 8) != hrw(d, 10))
    assert(moved.forall(d => hrw(d, 10) >= 8),
      "an HRW-moved doc must land on shard 8 or 9")
    val census = queries.Registry.queries("q301_rendezvous_shards")(
      spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(census("hrw") == moved.length.toDouble / docs.length)
    assert(census("hrw") < 0.5 * census("mod"),
      s"HRW ${census("hrw")} should move far fewer than mod ${census("mod")}")
  }

  test("q300 matryoshka recall is in [0,1]; full-vs-full is exact 1") {
    import org.apache.spark.sql.functions._
    val out = queries.Registry.queries("q300_matryoshka_eval")(spark, sf)
      .collect()
    assert(out.length == 10)
    out.foreach { r =>
      val rec = r.getDouble(1)
      assert(rec >= 0.0 && rec <= 1.0)
      // top1_match implies the top-1 ids agree
      if (r.getBoolean(2)) assert(r.getLong(3) == r.getLong(4))
    }
    // control: truncating to the FULL 64 dims must reproduce the
    // full-dim retrieval exactly (recall 1, top-1 agreement)
    val emb = Tables.load(spark, sf, "embeddings")
    val full = graft.operators.Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 5), emb, k = 5)
      .select("query_id", "cand_id", "rank").collect().toSet
    val slice64 = emb.select(col("vec_id"),
      slice(col("embedding"), 1, 64).as("embedding"))
    val again = graft.operators.Similarity.bruteForceTopK(
      slice64.filter(col("vec_id") < 5), slice64, k = 5)
      .select("query_id", "cand_id", "rank").collect().toSet
    assert(full == again)
  }

  test("q314 streaming chat lint equals the q311 batch census when " +
      "re-aggregated (shared per-doc definition, proven end-to-end)") {
    val stream = queries.Registry.queries("q314_stream_chat_lint")(
      spark, sf)
    val reagg = stream.groupBy("source", "violation")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("assistant_tokens")).cast("long").as("assistant_tokens"),
        sum(col("n_turns")).cast("long").as("n_turns"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val batch = queries.Registry.queries("q311_chat_format_lint")(
      spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(reagg == batch,
      s"twin diverged: only-batch=${(batch -- reagg).take(3)} " +
        s"only-stream=${(reagg -- batch).take(3)}")
    // semantic ranges the hash oracle can't see: every violation class
    // the corruption plan plants must actually occur, and 'ok' docs
    // must carry trainable (assistant) tokens
    val viols = batch.map(_._2)
    assert(Set("ok", "role", "empty", "parity").subsetOf(viols),
      s"planted violation classes missing: $viols")
    assert(batch.filter(_._2 == "ok").forall(_._4 > 0L),
      "an ok transcript with zero assistant tokens is a lint gap")
  }

  test("q312/q316 closed forms equal the TEXTBOOK formulas recomputed " +
      "imperatively (theory check the hash oracle cannot provide)") {
    // the queries compute kappa/alpha as one division of exact
    // integers derived by algebra; both engines agreeing proves
    // nothing if the ALGEBRA is wrong. Recompute from the textbook
    // definitions (P_i mean / P_e for Fleiss; D_o / D_e for
    // Krippendorff) over the same deterministic rater assignment.
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ratings = docs.map { case (id, nc) =>
      Seq(((id * 7 + nc) % 3).toInt, ((id * 13 + nc * 5) % 3).toInt,
        ((id * 29 + 11) % 3).toInt)
    }
    val n = ratings.length
    val counts = ratings.map(r => (0 to 2).map(c => r.count(_ == c)))
    // Fleiss: P_i = (sum n_ic^2 - m) / (m(m-1)), m = 3
    val pBar = counts.map(cs =>
      (cs.map(x => x * x).sum - 3).toDouble / 6.0).sum / n
    val colTot = (0 to 2).map(c => counts.map(_(c)).sum)
    val pE = colTot.map(t => math.pow(t.toDouble / (3.0 * n), 2)).sum
    val kappaText = (pBar - pE) / (1.0 - pE)
    val kappaQ = queries.Registry.queries("q312_fleiss_kappa")(spark, sf)
      .collect().head.getAs[Double]("kappa")
    assert(math.abs(kappaQ - kappaText) < 1e-9,
      s"fleiss algebra drifted: query $kappaQ vs textbook $kappaText")

    // Krippendorff (nominal, complete): D_o over units, D_e over the
    // pooled values without replacement
    val dO = counts.map(cs => cs.map(x => x * (3 - x)).sum.toDouble /
      (3.0 * 2.0)).sum / n
    val t = 3.0 * n
    val dE = colTot.map(c => c.toDouble * (t - c)).sum / (t * (t - 1.0))
    val alphaText = 1.0 - dO / dE
    val alphaQ = queries.Registry
      .queries("q316_krippendorff_alpha")(spark, sf)
      .collect().head.getAs[Double]("alpha")
    assert(math.abs(alphaQ - alphaText) < 1e-9,
      s"alpha algebra drifted: query $alphaQ vs textbook $alphaText")
    // the two statistics must bracket sanely on identical data
    assert(alphaQ > -1.0 && alphaQ < 1.0 && kappaQ > -1.0 && kappaQ < 1.0)
  }

  test("q313 ntile buckets: per-lang thirds differ by <= 1 doc and " +
      "mean log-likelihood is monotone head >= middle >= tail") {
    val rows = queries.Registry.queries("q313_ccnet_buckets")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getAs[Double]("mean_ll")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, bs) =>
      val byBucket = bs.map(b => b._2 -> b).toMap
      val sizes = bs.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$lang ntile sizes: $sizes")
      for (Seq(a, b) <- Seq("head", "middle", "tail").sliding(2)
          if byBucket.contains(a) && byBucket.contains(b)) {
        assert(byBucket(a)._4 >= byBucket(b)._4,
          s"$lang: mean_ll($a) < mean_ll($b)")
      }
    }
  }

  test("SequencePack: exact offsets/spans/head-fill, partition-" +
      "invariant, and conservation of the token stream") {
    import spark.implicits._
    import graft.operators.SequencePack
    // toks [3,2,4] at C=4: starts [0,3,5]; spans [0-0, 0-1, 1-2];
    // head_fill [3, 1, 3]
    val docs = Seq((0L, 3L), (1L, 2L), (2L, 4L)).toDF("doc_id", "toks")
    val out = SequencePack.pack(docs, col("doc_id"), col("toks"),
        contextLen = 4L, bucketSize = 2L)
      .orderBy("doc_id")
      .select("doc_id", "tok_start", "win_start", "win_end",
        "n_windows", "head_fill")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(
      (0L, 0L, 0L, 0L, 1L, 3L),
      (1L, 3L, 0L, 1L, 2L, 1L),
      (2L, 5L, 1L, 2L, 2L, 3L)))
    // partition invariance: the distributed prefix sum must not
    // depend on physical layout
    val big = spark.range(1000).select(col("id").as("doc_id"),
      (col("id") % 37 + 1).as("toks"))
    def run(df: org.apache.spark.sql.DataFrame) =
      SequencePack.pack(df, col("doc_id"), col("toks"), 512L, 64L)
        .orderBy("doc_id").select("doc_id", "tok_start", "win_end")
        .collect().toSeq
    assert(run(big.repartition(1)) == run(big.repartition(13)))
    // conservation: every doc's tokens are accounted for — the last
    // doc's start + its tokens equals the total stream length
    val packed = SequencePack.pack(big, col("doc_id"), col("toks"),
      512L, 64L)
    val total = packed.agg(max(col("tok_start") + col("n_tokens")))
      .head().getLong(0)
    assert(total == big.agg(sum("toks")).head().getLong(0))
    // scale shape: the only unbounded-orderBy window runs over the
    // BUCKET AGGREGATES (one row per bucket), never over documents —
    // doc-level windows are partitioned by the bucket key
    val plan = packed.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(_psb"),
      s"doc-level window must partition by bucket:\n$plan")
  }

  test("explodeWindowSpan: identical to the naive span explode across " +
      "chunk boundaries, with per-row allocation bounded at the chunk") {
    import spark.implicits._
    import graft.operators.SequencePack
    // spans engineered around a chunk of 8: width 1, exactly 8,
    // 8+1 (straddles one boundary), 3 chunks + remainder, and a
    // "mega-doc" of 100 windows (13 chunks)
    val spans = Seq((0L, 0L, 0L), (1L, 5L, 12L), (2L, 16L, 24L),
      (3L, 30L, 55L), (4L, 100L, 199L)).toDF("doc", "ws", "we")
    val chunked = SequencePack.explodeWindowSpan(spans, col("ws"),
        col("we"), "window_id", chunk = 8L)
      .select("doc", "window_id").orderBy("doc", "window_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val naive = spans.select(col("doc"),
        explode(sequence(col("ws"), col("we"))).as("window_id"))
      .orderBy("doc", "window_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(chunked == naive, s"chunked explode diverges")
    assert(naive.size == 1 + 8 + 9 + 26 + 100)
    // the allocation bound: every sequence() in the optimized plan is
    // either the outer chunk-index sequence (span/chunk) or the inner
    // least()-capped chunk — the UNCAPPED sequence(ws, we) form must
    // not appear
    val plan = SequencePack.explodeWindowSpan(spans, col("ws"),
      col("we"), "window_id", chunk = 8L)
      .queryExecution.optimizedPlan.toString
    assert(!plan.matches("(?s).*sequence\\(ws#\\d+L?, we#\\d+.*"),
      s"uncapped full-span sequence survived:\n$plan")
    // columns kept, helpers dropped
    val cols = SequencePack.explodeWindowSpan(spans, col("ws"),
      col("we"), "window_id", chunk = 8L).columns.toSeq
    assert(cols == Seq("doc", "ws", "we", "window_id"), s"cols: $cols")
  }

  test("EpochShuffle: an exact bijection per epoch, epochs differ, " +
      "coprime violation fails fast, and the map is shuffle-free") {
    import spark.implicits._
    import graft.operators.EpochShuffle
    val n = 257L // prime-sized corpus: coprime with the multiplier
    val docs = spark.range(n).toDF("doc_id")
    def positions(epoch: Int) =
      EpochShuffle.assign(docs, col("doc_id"), n, epoch, batchSize = 32L)
        .select("epoch_pos").as[Long].collect().toSeq
    val e0 = positions(0)
    // bijection: every position in [0, n) exactly once
    assert(e0.sorted == (0L until n), "epoch 0 is not a permutation")
    assert(positions(7).sorted == (0L until n))
    // epochs are distinct orders (affine offset rotates with epoch)
    assert(e0 != positions(1))
    // determinism: same (seed, epoch) -> same order
    assert(positions(3) == positions(3))
    // decorrelation from arrival order: the stride walk must not be
    // close to identity — no long run of consecutive ids mapping to
    // consecutive positions
    val byId = EpochShuffle.assign(docs, col("doc_id"), n, 0, 32L)
      .orderBy("doc_id").select("epoch_pos").as[Long].collect()
    val adjacent = byId.sliding(2).count(p => p(1) - p(0) == 1)
    assert(adjacent < 5, s"$adjacent adjacent pairs kept arrival order")
    // gcd(a, n) != 1 would silently lose docs — must refuse instead
    val err = intercept[IllegalArgumentException] {
      EpochShuffle.assign(docs, col("doc_id"), EpochShuffle.DefaultA * 2,
        0, 32L)
    }
    assert(err.getMessage.contains("bijection"), err.getMessage)
    // shuffle-free: the assignment itself adds NO exchange to the plan
    val plan = EpochShuffle.assign(docs, col("doc_id"), n, 0, 32L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"epoch assignment must be row-local:\n$plan")
    // batches: all full except possibly the last
    val sizes = EpochShuffle.assign(docs, col("doc_id"), n, 0, 32L)
      .groupBy("batch_id").count().orderBy("batch_id")
      .select("count").as[Long].collect().toSeq
    assert(sizes.init.forall(_ == 32L) && sizes.last == n % 32)
  }

  test("EpochShuffle Feistel: exact bijection on adversarial n (prime, " +
      "2^k, multiple of the affine default), keyed epochs, zero " +
      "shuffle (r17 verdict #7)") {
    import spark.implicits._
    import graft.operators.EpochShuffle
    // prime (cycle-walking active), power of 4 (no walking at all),
    // and 2 x 1000003 — the n where the affine DEFAULT fails fast;
    // the Feistel map has no coprimality precondition
    for (n <- Seq(257L, 4096L, 2000006L)) {
      val docs = spark.range(n).toDF("doc_id")
      val pos = EpochShuffle.assignFeistel(docs, col("doc_id"), n,
        epoch = 1, batchSize = 64L)
      val row = pos.agg(count(lit(1)), countDistinct(col("epoch_pos")),
        min(col("epoch_pos")), max(col("epoch_pos"))).head()
      assert(row.getLong(0) == n && row.getLong(1) == n &&
        row.getLong(2) == 0L && row.getLong(3) == n - 1,
        s"n=$n: not a bijection of [0, n)")
    }
    // the affine default REFUSES this n; Feistel covers it
    intercept[IllegalArgumentException] {
      EpochShuffle.assign(spark.range(6).toDF("doc_id"), col("doc_id"),
        EpochShuffle.DefaultA * 2, 0, 32L)
    }
    val n = 257L
    val docs = spark.range(n).toDF("doc_id")
    def positions(epoch: Int, seed: Long = 42L) =
      EpochShuffle.assignFeistel(docs, col("doc_id"), n, epoch, 32L, seed)
        .orderBy("doc_id").select("epoch_pos").as[Long].collect().toSeq
    val e1 = positions(1)
    assert(e1.sorted == (0L until n), "epoch 1 is not a permutation")
    // keyed: epoch and seed both change the order; same key repeats
    assert(e1 != positions(2))
    assert(e1 != positions(1, seed = 43L))
    assert(e1 == positions(1))
    // no constant-stride structure: consecutive ids must not map to
    // constant position deltas (the affine map's signature — there,
    // ALL n-1 adjacent deltas are equal)
    val deltas = e1.sliding(2).map(p => p(1) - p(0)).toSeq
    assert(deltas.distinct.size > n / 4,
      s"only ${deltas.distinct.size} distinct strides — affine-like")
    // shuffle-free: row-local arithmetic, no exchange in the plan
    val plan = EpochShuffle.assignFeistel(docs, col("doc_id"), n, 1, 32L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"feistel assignment must be row-local:\n$plan")
    // out-of-domain input (contract: dense [0, n)) is rejected, not
    // walked into an unrelated orbit
    val bad = intercept[Exception] {
      EpochShuffle.assignFeistel(
        spark.range(300L, 400000L).toDF("doc_id"), col("doc_id"),
        257L, 1, 32L).collect()
    }
    assert(bad.getMessage != null)
    // batch_id is INTEGER division (r18 ADVICE: floor(x / y) is double
    // division, lossy past 2^53 while n advertises up to 2^62) — both
    // assignment flavors, value and type pinned
    for (assigned <- Seq(
        EpochShuffle.assign(docs, col("doc_id"), n, 0, 32L),
        EpochShuffle.assignFeistel(docs, col("doc_id"), n, 0, 32L))) {
      assert(assigned.schema("batch_id").dataType ==
        org.apache.spark.sql.types.LongType)
      val mismatch = assigned.filter(
        col("batch_id") * 32L + pmod(col("epoch_pos"), lit(32L))
          =!= col("epoch_pos")).count()
      assert(mismatch == 0L, "batch_id is not the exact integer quotient")
    }
  }

  test("FeistelPermute equality is value-based: independently built " +
      "instances with identical keys compare equal (r18 ADVICE)") {
    import graft.expressions.FeistelPermute
    // a Literal child isolates the keys-field concern (an unresolved
    // Column child carries construction-site Origins that never
    // compare equal — wrapper noise, not keys semantics)
    def mk() = FeistelPermute(
      org.apache.spark.sql.catalyst.expressions.Literal(5L),
      1000L, 5, Array.tabulate(3)(i => (i * 31 + 7).toLong).toIndexedSeq)
    assert(mk() == mk(), "identical keys must give equal expressions")
    assert(mk().hashCode == mk().hashCode)
    assert(mk().semanticEquals(mk()))
    val other = mk().copy(keys = Seq(1L, 2L, 3L))
    assert(mk() != other)
  }

  test("packOrdered: a string-composite corpus order packs correctly " +
      "(rank = global row order), partition-invariant; a raw string " +
      "order FAILS FAST instead of silently mis-bucketing") {
    import spark.implicits._
    import graft.operators.{PrefixSum, SequencePack}
    // (shard, path)-shaped order: shard breaks the tie groups, path
    // unique within — the composite is a unique total order
    val docs = Seq(
      ("s1", "a", 3L), ("s0", "z", 2L), ("s1", "b", 4L),
      ("s0", "a", 5L), ("s2", "a", 1L))
      .toDF("shard", "path", "toks")
    val orderCols = Seq(col("shard"), col("path"))
    def run(df: org.apache.spark.sql.DataFrame) =
      SequencePack.packOrdered(df, orderCols, col("toks"),
          contextLen = 4L, partitions = 3)
        .orderBy("pack_rank")
        .select("shard", "path", "pack_rank", "tok_start", "win_start",
          "win_end")
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // expected order: (s0,a,5) (s0,z,2) (s1,a,3) (s1,b,4) (s2,a,1)
    // starts: 0, 5, 7, 10, 14 at C=4
    val expected = Seq(
      ("s0", "a", 0L, 0L, 0L, 1L),
      ("s0", "z", 1L, 5L, 1L, 1L),
      ("s1", "a", 2L, 7L, 1L, 2L),
      ("s1", "b", 3L, 10L, 2L, 3L),
      ("s2", "a", 4L, 14L, 3L, 3L))
    assert(run(docs) == expected)
    // the rank must not depend on physical layout
    assert(run(docs.repartition(7)) == expected)
    // globalRank at a partition count smaller than distinct keys
    // still yields the dense global order
    val ranked = PrefixSum.globalRank(docs, orderCols, "r",
        partitions = 2)
      .orderBy("r").select("shard", "path")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(ranked == expected.map(e => (e._1, e._2)), s"rank: $ranked")
    // the old failure mode: floor(stringCol / bucket) silently NULLs
    // every bucket — now an immediate, explanatory error
    val err = intercept[IllegalArgumentException] {
      SequencePack.pack(docs, col("path"), col("toks"), 4L, 2L)
    }
    assert(err.getMessage.contains("must be numeric") &&
      err.getMessage.contains("packOrdered"), err.getMessage)
  }

  test("packOrdered plan shape: zero range exchanges, the bucket is " +
      "the binary-search expression, one data-bearing hash exchange") {
    import graft.operators.SequencePack
    val df = spark.range(50000)
      .select((col("id") % 97).cast("string").as("shard"),
        col("id").as("path"), (col("id") % 13 + 1).as("toks"))
    val out = SequencePack.packOrdered(df,
      Seq(col("shard"), col("path")), col("toks"), contextLen = 512L)
    out.write.format("noop").mode("overwrite").save()
    val plan = out.queryExecution.executedPlan.toString
    // the r17 range-exchange-diamond fix must survive the r18 rewrite:
    // the explicit bucket never reintroduces a range partitioner
    assert(!plan.toLowerCase.contains("rangepartitioning"),
      s"range exchange crept back into packOrdered:\n$plan")
    // and the bucket is the broadcast binary search, not a when-chain
    assert(plan.toLowerCase.contains("searchsortedcount"),
      "bucket expression missing from the executed plan")
    val counts = PlanAudit.audit(out.queryExecution.executedPlan)
    // dup<=1: the narrow offsets branch re-scans the same LEAF (two
    // prunes of one scan — cheap by design); anything larger means
    // the rank subtree is being computed twice again (the r17 find)
    assert(counts.hashExchanges <= 2 && counts.largestDupSubtree <= 1,
      s"packOrdered plan regressed: $counts")
  }
}
