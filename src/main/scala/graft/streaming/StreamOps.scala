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

  /** Drain helper for tests/batch parity: runs the streaming query on
    * everything currently in the source and stops (AvailableNow). */
  def drainToMemory(df: DataFrame, name: String,
      outputMode: OutputMode = OutputMode.Append()): Unit = {
    val q = df.writeStream
      .format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
