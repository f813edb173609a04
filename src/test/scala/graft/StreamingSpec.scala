package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamOps

class StreamingSpec extends SparkSpec {

  private def landing(): String =
    Files.createTempDirectory("stream-landing").toString

  test("landing-zone stream + bucketed agg matches the batch result") {
    val dir = landing()
    val ev = Tables.load(spark, sf, "events")
    ev.write.mode("overwrite").parquet(dir)
    val stream = StreamOps.landingZone(spark, dir, ev.schema)
    val agg = StreamOps.bucketedAgg(stream, "ts", "1 hour", "1 day",
      Seq("event_type"))
    StreamOps.drainToMemory(agg, "bucketed", OutputMode.Append())
    // append mode only emits windows below the final watermark; check
    // emitted rows agree with the batch computation
    val got = spark.table("bucketed")
    val batch = ev
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("total"))
    val joined = got.alias("g").join(batch.alias("b"),
      Seq("bucket_start", "event_type"))
    assert(got.count() > 0)
    assert(joined.filter(col("g.n") =!= col("b.n")).count() == 0)
  }

  test("dedupRevisions drops re-crawled duplicate keys") {
    val dir = landing()
    val ev = Tables.load(spark, sf, "events").limit(200)
    // land the same batch twice (a re-crawl)
    ev.write.mode("append").parquet(dir)
    ev.write.mode("append").parquet(dir)
    val stream = StreamOps.landingZone(spark, dir, ev.schema)
    val dedup = StreamOps.dedupRevisions(stream, "ts", "7 days",
      Seq("event_id"))
    StreamOps.drainToMemory(dedup, "deduped", OutputMode.Append())
    assert(spark.table("deduped").count() == 200)
  }

  test("runningWatermark maintains per-key max/count state") {
    val dir = landing()
    val ev = Tables.load(spark, sf, "events")
    ev.write.mode("overwrite").parquet(dir)
    val out = StreamOps.runningWatermark(spark,
      StreamOps.landingZone(spark, dir, ev.schema))
    StreamOps.drainToMemory(out, "wmstate", OutputMode.Update())
    val got = spark.table("wmstate")
      .groupBy("user_id").agg(max("max_ts_s").as("max_ts_s"))
    val want = ev.selectExpr("user_id", "CAST(ts AS LONG) AS ts_s")
      .groupBy("user_id").agg(max("ts_s").as("want_ts"))
    val bad = got.join(want, Seq("user_id"))
      .filter(col("max_ts_s") =!= col("want_ts"))
    assert(bad.count() == 0)
  }
}
