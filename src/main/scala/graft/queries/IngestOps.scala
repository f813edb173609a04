package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ingest.{IngestDataset, Watermark}

/** End-to-end ingest-framework exercises (SURVEY.md §2.9 I1/I5, §2.2
  * K1/K3/K8): each query drives a real multi-batch ingest into a
  * scratch warehouse — watermark resume, schema-evolving append,
  * revision-window overwrite — then returns the final table state,
  * which the oracle derives directly from the source. The framework is
  * correct iff the round-trip is lossless.
  */
object IngestOps {

  private val cut = "2024-01-20 00:00:00"
  private val evCols =
    Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  private def scratch(): String =
    Files.createTempDirectory("graft-ingest").toString

  val qs: Seq[Q] = Seq(

    // I1 — watermark-resume incremental ingest: batch 1 up to a cut,
    // read MAX(ts) back from the table, batch 2 strictly after it.
    // Lossless ⟺ final table == source.
    Q("q31_incremental_ingest",
      (s, dir) => {
        val ds = new IngestDataset(s, scratch(), "events_ds")
        val ev = Tables.load(s, dir, "events")
        ds.append("events",
          ev.filter(col("ts") < to_timestamp(lit(cut))),
          partitionTs = Some("ts"))
        val wm = Watermark.maxTs(ds, "events", "ts").get
        ds.append("events", ev.filter(col("ts") > lit(wm)),
          partitionTs = Some("ts"))
        ds.read("events").select(evCols.map(col): _*).orderBy("event_id")
      },
      Some(s"""SELECT event_id, ts, user_id, event_type, value, props
        FROM events ORDER BY event_id""")),

    // K3 — schema-evolving append: first batch lacks a column that the
    // second batch carries; old rows must surface with nulls.
    Q("q32_evolve_ingest",
      (s, dir) => {
        val ds = new IngestDataset(s, scratch(), "events_ds")
        val ev = Tables.load(s, dir, "events")
        ds.appendEvolve("events",
          ev.filter(col("ts") < to_timestamp(lit(cut)))
            .select("event_id", "ts", "user_id", "value"),
          partitionTs = Some("ts"))
        ds.appendEvolve("events",
          ev.filter(col("ts") >= to_timestamp(lit(cut)))
            .select("event_id", "ts", "user_id", "event_type", "value"),
          partitionTs = Some("ts"))
        ds.read("events")
          .select("event_id", "ts", "user_id", "event_type", "value")
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, ts, user_id,
          CAST(NULL AS VARCHAR) AS event_type, value
        FROM events WHERE ts < TIMESTAMP '$cut'
        UNION ALL
        SELECT event_id, ts, user_id, event_type, value
        FROM events WHERE ts >= TIMESTAMP '$cut'
        ORDER BY event_id""")),

    // I5 — revision-window overwrite: first ingest lands corrupted
    // values for the mutable recent window (upstream revisions), the
    // re-crawl replaces exactly that window. Final state == source ⟺
    // the window replacement neither duplicated nor leaked rows.
    Q("q33_replace_window",
      (s, dir) => {
        val ds = new IngestDataset(s, scratch(), "events_ds")
        val ev = Tables.load(s, dir, "events")
        val from = java.sql.Timestamp.valueOf(cut)
        val until = java.sql.Timestamp.valueOf("2024-12-31 00:00:00")
        val corrupted = ev.withColumn("value",
          when(col("ts") >= lit(from), lit(-1.0)).otherwise(col("value")))
        ds.append("events", corrupted, partitionTs = Some("ts"))
        ds.replaceWindow("events",
          ev.filter(col("ts") >= lit(from)), "ts", from, until)
        ds.read("events").select(evCols.map(col): _*).orderBy("event_id")
      },
      Some(s"""SELECT event_id, ts, user_id, event_type, value, props
        FROM events ORDER BY event_id"""))
  )
}
