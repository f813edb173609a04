package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming forms of the reference's incremental semantics
  * (SURVEY.md §2.9): the crawlers implement batch-with-watermark; the
  * streaming-native equivalent is a file-source stream over a landing
  * zone with event-time watermarking, late-revision dedup, and windowed
  * aggregation — `Trigger.AvailableNow` turns the same pipeline back
  * into an incremental batch run.
  */
object StreamOps {

  /** Cumulative drain-phase telemetry (r18 verdict #6): the streaming
    * twins re-run the full micro-batch lifecycle — query start,
    * offset-log/WAL commits, state-store open/commit per partition,
    * trigger scheduling — inside every timed measurement, and the
    * bench's wall alarm can't tell that overhead from the operator's
    * own work (q122's 1.47× driver-to-driver move with flat shuffle
    * and task-mem was unadjudicable from the artifact alone). Each
    * drain records its total wall (start → termination) and the
    * data-plane portion: the sum of `durationMs("addBatch")` across
    * the drain's micro-batches, which is the time actually spent
    * executing the query's plan on data. `drain_sec − exec_sec` is
    * lifecycle overhead the operator does not control. Sampled as
    * per-query deltas by the bench (same pattern as CapMetrics) into
    * a `stream` field in BENCH_metrics, so a wall move on a streaming
    * twin is adjudicable from the artifact: exec flat + drain moved =
    * trigger/lifecycle noise, exec moved = the plan itself. */
  object DrainStats {
    private val drains = new java.util.concurrent.atomic.LongAdder
    private val wallNs = new java.util.concurrent.atomic.LongAdder
    private val execMs = new java.util.concurrent.atomic.LongAdder

    private[streaming] def record(wallNanos: Long,
        q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      drains.increment()
      wallNs.add(wallNanos)
      // recentProgress holds the last 100 updates — far above any
      // AvailableNow drain's batch count here
      execMs.add(q.recentProgress.map { p =>
        val d = p.durationMs.get("addBatch")
        if (d == null) 0L else d.longValue
      }.sum)
    }

    /** (drains, total wall sec, total addBatch sec) since JVM start —
      * callers diff two samples, so only deltas are meaningful. */
    def cumulative(): (Long, Double, Double) =
      (drains.sum(), wallNs.sum() / 1e9, execMs.sum() / 1e3)
  }

  /** Start a streaming query, await termination, and record the drain
    * in [[DrainStats]] — synchronous, so a per-query telemetry window
    * always contains its own drains. */
  private[graft] def timedDrain(
      start: => org.apache.spark.sql.streaming.StreamingQuery)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val t0 = System.nanoTime()
    val q = start
    q.awaitTermination()
    DrainStats.record(System.nanoTime() - t0, q)
    q
  }

  /** Per-key resume state for [[runningWatermark]]. */
  final case class KeyState(userId: Long, maxTs: Long, n: Long)

  /** File-landing-zone source: every parquet dropped into `dir` becomes
    * a micro-batch (the streaming analog of the crawlers' chunked
    * appends). */
  def landingZone(spark: SparkSession, dir: String, schema: StructType)
      : DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** I5 — late/revised data handling: event-time watermark bounds
    * state, dropDuplicatesWithinWatermark on the primary key suppresses
    * re-crawled rows (the streaming form of the reference's PK-dedup on
    * append). Plain dropDuplicates(pk) would never evict state unless
    * the event-time column were part of pk; the within-watermark variant
    * expires each key's dedup state once the watermark passes it, so
    * state stays bounded on a long-running stream. */
  def dedupRevisions(events: DataFrame, tsCol: String, delay: String,
      pk: Seq[String]): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(pk)

  /** A2/Q1 — continuously maintained time-bucketed aggregate: the
    * streaming twin of the dominant dashboard query. */
  def bucketedAgg(events: DataFrame, tsCol: String, delay: String,
      bucket: String, keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), bucket) +: keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("bucket_start") +:
        keys.map(col) :+ col("n") :+ col("total"): _*)

  /** Per-key running state via mapGroupsWithState: maintains the
    * watermark row (max ts + last value) per entity — the streaming
    * form of the per-entity resume state (e2watch.py:166-179). */
  def runningWatermark(spark: SparkSession, events: DataFrame)
      : DataFrame = {
    import spark.implicits._
    events
      .selectExpr("user_id", "CAST(ts AS LONG) AS ts_s")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Long)],
            state: GroupState[KeyState]) =>
          val prev = state.getOption
            .getOrElse(KeyState(key, Long.MinValue, 0L))
          val (mx, n) = rows.foldLeft((prev.maxTs, prev.n)) {
            case ((m, c), (_, t)) => (math.max(m, t), c + 1)
          }
          val next = KeyState(key, mx, n)
          state.update(next)
          next
      }
      .toDF("user_id", "max_ts_s", "n")
  }

  /** Continuously maintained KMV distinct-count sketch per key via
    * mapGroupsWithState: state is the k smallest distinct hashes seen
    * so far — BOUNDED (k longs per key, forever) where an exact
    * streaming COUNT(DISTINCT) would grow state with every new key
    * member. The k-min merge is idempotent, commutative and
    * associative, so the final state after an AvailableNow drain is
    * independent of how the stream was chunked into batches — which
    * is what lets the batch SQL oracle hash-check it. Emits one row
    * per key per batch (Update semantics); the final batch's emission
    * is the sketch of everything seen. */
  def kmvSketchStream(spark: SparkSession, hashed: DataFrame, k: Int)
      : DataFrame = {
    import spark.implicits._
    hashed
      .selectExpr("grp", "h")
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long)],
            state: GroupState[Seq[Long]]) =>
          val merged = (state.getOption.getOrElse(Seq.empty) ++
            rows.map(_._2)).distinct.sorted.take(k)
          state.update(merged)
          (key, merged)
      }
      .toDF("grp", "mins")
  }

  /** Open-session state for [[sessionizeStream]]: value is accumulated
    * in integer cents so the sum is exact and arrival-order-free (the
    * DuckDB oracle's DECIMAL(28,2) sum rounds identically). `n == 0`
    * marks a closed-session tombstone that only preserves the per-user
    * session counter, so session_id stays unique across an
    * idle-timeout + reactivation cycle (a removed state would restart
    * numbering at 1). Tombstones make state ∝ distinct users — the
    * same bound as any per-key aggregation. */
  final case class SessionState(
      seq: Long, startUs: Long, lastUs: Long, n: Long, cents: Long)

  /** Streaming sessionization via flatMapGroupsWithState + event-time
    * timeout — the custom-state streaming operator the batch q47 twin
    * mirrors. Sessions split on a gap of more than `gapSeconds`
    * (floor-second arithmetic, same as the batch oracle); a session
    * closed by a newer row emits immediately, and each key's final
    * open session emits when the watermark passes `last + gap` (the
    * event-time timeout), which keeps state bounded on an unbounded
    * stream. Emitted rows: (user_id, session_id, n_events,
    * session_start, session_end, session_value). */
  def sessionizeStream(spark: SparkSession, events: DataFrame,
      gapSeconds: Long, delay: String): DataFrame = {
    import spark.implicits._
    val sessions = events.withWatermark("ts", delay)
      .selectExpr("user_id", "ts", "event_id", "value")
      .as[(Long, java.time.Instant, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[(Long, java.time.Instant, Long, Double)],
            state: GroupState[SessionState]) =>
          def micros(i: java.time.Instant): Long =
            i.getEpochSecond * 1000000L + i.getNano / 1000L
          val out = Seq.newBuilder[(Long, Long, Long, Long, Long, Double)]
          def emit(st: SessionState): Unit =
            out += ((uid, st.seq, st.n, st.startUs, st.lastUs,
              st.cents / 100.0))
          if (!rows.hasNext) {
            // event-time timeout: watermark passed last + gap. Emit the
            // open session but keep a counter tombstone (no new timeout
            // is set, so it never fires again) — removing state would
            // restart session_id at 1 when the user reactivates.
            state.getOption.filter(_.n > 0).foreach { st =>
              emit(st)
              state.update(SessionState(st.seq, 0L, 0L, 0L, 0L))
            }
          } else {
            // same total order as the batch twin: (ts, event_id)
            val sorted = rows.toArray.sortBy(r => (micros(r._2), r._3))
            var st = state.getOption.orNull
            for (r <- sorted) {
              val tUs = micros(r._2)
              val cents = math.round(r._4 * 100)
              if (st == null || st.n == 0) {
                val seq = if (st == null) 1L else st.seq + 1
                st = SessionState(seq, tUs, tUs, 1, cents)
              } else if (tUs / 1000000L - st.lastUs / 1000000L > gapSeconds) {
                emit(st)
                st = SessionState(st.seq + 1, tUs, tUs, 1, cents)
              } else {
                st = st.copy(lastUs = tUs, n = st.n + 1,
                  cents = st.cents + cents)
              }
            }
            state.update(st)
            // fires strictly after watermark > deadline (ms precision)
            state.setTimeoutTimestamp(st.lastUs / 1000L + gapSeconds * 1000L)
          }
          out.result().iterator
      }
      .toDF("user_id", "session_id", "n_events", "start_us", "end_us",
        "session_value")
    sessions.select(col("user_id"), col("session_id"), col("n_events"),
      expr("timestamp_micros(start_us)").as("session_start"),
      expr("timestamp_micros(end_us)").as("session_end"),
      col("session_value"))
  }

  /** Runs `f` with `spark.sql.shuffle.partitions` temporarily set to
    * `n`, restoring the previous value afterwards. Streaming state is
    * partitioned by the shuffle-partition count IN EFFECT AT FIRST
    * START and then pinned by the checkpoint — so a streaming job
    * sizes it to its key cardinality and state volume up front rather
    * than inheriting the batch default (each micro-batch pays a
    * per-partition state-store open/commit regardless of data). Use
    * around a whole drain (start + awaitTermination); only for
    * fresh-checkpoint queries — an existing checkpoint's partitioning
    * always wins and must not be contradicted. */
  def withStatePartitions[T](spark: SparkSession, n: Int)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try f finally spark.conf.set(key, prev)
  }

  /** Drain helper for tests/batch parity: runs the streaming query on
    * everything currently in the source and stops (AvailableNow). */
  def drainToMemory(df: DataFrame, name: String,
      outputMode: OutputMode = OutputMode.Append()): Unit = {
    timedDrain(df.writeStream
      .format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start())
    ()
  }

  /** Drain like [[drainToMemory]] but also return, per committed
    * micro-batch, the total state-store row count across all stateful
    * operators (`StateOperatorProgress.numRowsTotal`). This is the
    * observable that proves an interval join's symmetric-hash state is
    * actually evicted as the watermark advances — the property that
    * keeps a stream join bounded at 100 TB/day. Only meaningful when
    * the source is chunked into multiple batches (e.g. a file source
    * with `maxFilesPerTrigger`); a single AvailableNow batch never
    * advances the watermark mid-run, so nothing would evict. */
  def drainToMemoryWithStateCounts(df: DataFrame, name: String,
      outputMode: OutputMode = OutputMode.Append()): Seq[Long] = {
    val q = timedDrain(df.writeStream
      .format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start())
    q.recentProgress.toSeq
      .filter(_.stateOperators.nonEmpty)
      .map(p => p.stateOperators.map(_.numRowsTotal).sum)
  }

  /** K6 streaming form — a `foreachBatch` MERGE sink: each micro-batch
    * upserts "latest row per key" into a parquet state table. The
    * per-batch reduction and the merge are the same struct-max
    * aggregate, so the final state is the global arg-max per key no
    * matter how the stream was chunked into batches — which is what
    * makes the sink batch-oracle-checkable. The state table is
    * rewritten via stage-and-swap (never read and overwritten in one
    * plan); on a real deployment the state table would be a
    * transactional format and this becomes its MERGE INTO. State size
    * is |keys|, not |events|; each batch costs one shuffle of the
    * batch plus a scan of the state table. The checkpoint makes
    * re-runs incremental: an already-drained source adds zero batches
    * and the sink is untouched (idempotent resume, I7). */
  def mergeLatestSink(spark: SparkSession, stream: DataFrame,
      stateDir: String, checkpointDir: String): Unit = {
    def latestPerKey(df: DataFrame): DataFrame =
      df.groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"), col("value")))
          .as("m"))
        .select(col("user_id"), col("m.ts").as("ts"),
          col("m.event_id").as("event_id"), col("m.value").as("value"))
    stateTableSink(stream, stateDir, checkpointDir) {
      case (batch, None) => latestPerKey(batch)
      case (batch, Some(state)) =>
        latestPerKey(state.unionByName(latestPerKey(batch)))
    }
  }

  /** SCD2 streaming sink: each micro-batch's change rows become a
    * batch-local run history (`Scd2.historyFromLog`) and are stitched
    * into the state table with `Scd2.applyBatch` — a run spanning a
    * micro-batch boundary extends instead of fragmenting, so the
    * final state equals the batch history of the full log under ANY
    * chunking, provided batches arrive in event-time order (the CDC
    * contract). Crash-safe swap + checkpointed resume as in
    * [[mergeLatestSink]]; state size is |history rows|, each batch
    * costs one window shuffle of the batch + a state-table scan. */
  def scd2Sink(spark: SparkSession, stream: DataFrame,
      stateDir: String, checkpointDir: String,
      key: String = "user_id", attr: String = "event_type",
      ts: String = "ts", ord: String = "event_id"): Unit =
    stateTableSink(stream, stateDir, checkpointDir) { (batch, state) =>
      val mini = graft.ingest.Scd2.historyFromLog(batch, key, attr, ts, ord)
      state match {
        case None => mini
        case Some(st) => graft.ingest.Scd2.applyBatch(st, mini, key)
      }
    }

  /** Shared foreachBatch parquet-state-table harness: crash-safe
    * stage-and-swap (state survives a crash between any two steps at
    * `.old`, recovered on the next batch), AvailableNow drain,
    * checkpointed idempotent resume. `update(batch, currentState)`
    * computes the replacement state table. */
  private def stateTableSink(stream: DataFrame, stateDir: String,
      checkpointDir: String)(
      update: (DataFrame, Option[DataFrame]) => DataFrame): Unit = {
    val q = stream.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(stateDir)
          .getFileSystem(s.sessionState.newHadoopConf())
        val state = new org.apache.hadoop.fs.Path(stateDir)
        val old = new org.apache.hadoop.fs.Path(stateDir + ".old")
        val staging = new org.apache.hadoop.fs.Path(stateDir + ".staging")
        // Crash recovery: a previous run that died between the two
        // renames left the state at `.old` — restore it before reading.
        // (A leftover `.staging` is an incomplete write; discard it.)
        if (!fs.exists(new org.apache.hadoop.fs.Path(state, "_SUCCESS"))
            && fs.exists(new org.apache.hadoop.fs.Path(old, "_SUCCESS"))) {
          fs.delete(state, true)
          fs.rename(old, state)
        }
        fs.delete(staging, true)
        val cur =
          fs.exists(new org.apache.hadoop.fs.Path(state, "_SUCCESS"))
        val merged = update(batch,
          if (cur) Some(s.read.parquet(stateDir)) else None)
        merged.write.mode("overwrite").parquet(staging.toString)
        // Crash-safe swap: current state stays intact at `.old` until
        // the new state is in place; only then is it deleted.
        fs.delete(old, true)
        if (cur) fs.rename(state, old)
        fs.rename(staging, state)
        fs.delete(old, true)
        ()
      }
    timedDrain(q.start())
    ()
  }
}
