package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.Tables
import graft.functions.ExactAgg
import graft.streaming.StreamOps

/** Structured-Streaming operators surfaced as batch-checkable queries:
  * the pipeline runs as a real streaming query (file source → event-time
  * watermark → windowed aggregation → append-mode sink) drained with
  * `Trigger.AvailableNow`, and the emitted result is compared against a
  * pure-SQL oracle. Append mode emits exactly the windows whose end is
  * at or below the final watermark (max event time − delay), which is a
  * deterministic function of the data — so even watermark semantics are
  * hash-checked, not just spec-asserted.
  */
object StreamQueries {

  val qs: Seq[Q] = Seq(

    // A2/I5 streaming twin of q1: daily windowed aggregate over the
    // events stream with a 1-hour watermark, append-mode emission.
    Q("q53_stream_bucket_agg",
      (s, dir) => {
        // The file stream source consumes a directory, so the events
        // table is landed into a temp landing zone first — exactly the
        // crawler-drops-files-in shape StreamOps.landingZone models.
        // One FIXED landing dir per dataset STATE, written only when
        // absent: repeated invocations (bench runs each query twice)
        // reuse it instead of growing /tmp by a full events copy per
        // run. Keyed by the sanitized full source path PLUS a content
        // fingerprint (file count + max mtime + total bytes of the
        // source parquet) so a dataset regenerated in place lands
        // fresh instead of silently reusing a stale copy, and two
        // distinct dirs can never collide into one landing zone.
        val ev = Tables.load(s, dir, "events")
        val srcFiles = Option(
          new java.io.File(dir, "events.parquet").listFiles())
          .getOrElse(Array.empty[java.io.File])
          .filter(_.isFile)
        val fingerprint =
          s"${srcFiles.length}-${srcFiles.map(_.lastModified).foldLeft(0L)(math.max)}-${srcFiles.map(_.length).sum}"
        val sanitized = dir.replaceAll("[^A-Za-z0-9._-]", "_")
        val landingDir = new java.io.File(
          sys.props("java.io.tmpdir"),
          s"graft-q53-landing-$sanitized-$fingerprint")
        val landing = landingDir.toString
        if (!new java.io.File(landingDir, "_SUCCESS").exists())
          ev.write.mode("overwrite").parquet(landing)
        val stream = StreamOps.landingZone(s, landing, ev.schema)
        val agg = stream.withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            ExactAgg.dsum(col("value")).as("total"))
          .select(col("window.start").as("bucket_start"),
            col("event_type"), col("n"), col("total"))
        // re-runnable in one session (bench runs every query twice)
        s.catalog.dropTempView("q53_sink")
        StreamOps.drainToMemory(agg, "q53_sink", OutputMode.Append())
        s.table("q53_sink").orderBy("bucket_start", "event_type")
      },
      Some(s"""WITH agg AS (
          SELECT date_trunc('day', ts) AS bucket_start, event_type,
            count(*) AS n, ${ExactAgg.sqlSum("value")} AS total
          FROM events GROUP BY 1, 2),
        wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events)
        SELECT bucket_start, event_type, n, total FROM agg, wm
        WHERE bucket_start + INTERVAL 1 DAY <= w
        ORDER BY bucket_start, event_type"""))
  )
}
