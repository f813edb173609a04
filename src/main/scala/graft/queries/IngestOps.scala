package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ingest.{IngestDataset, Scd2, Watermark}

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
        FROM events ORDER BY event_id""")),

    // SCD2 history from a change log: per user, the runs of equal
    // event_type values as validity intervals (valid_from/valid_to/
    // is_current) — change-data-capture → dimension-history, one
    // window shuffle on the key.
    Q("q77_scd2_history",
      (s, dir) => {
        Scd2.historyFromLog(Tables.load(s, dir, "events"),
            "user_id", "event_type", "ts", "event_id")
          .orderBy("user_id", "valid_from", "state")
      },
      Some("""WITH chg AS (
          SELECT user_id, event_type, ts, event_id FROM (
            SELECT user_id, event_type, ts, event_id,
              lag(event_type) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS pv
            FROM events)
          WHERE pv IS NULL OR pv <> event_type)
        SELECT user_id, event_type AS state, ts AS valid_from,
          lead(ts) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS valid_to,
          lead(ts) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) IS NULL AS is_current
        FROM chg ORDER BY user_id, valid_from, state""")),

    // SCD2 MERGE: the nightly dimension merge. History built from the
    // pre-cut log, then ONE update batch (each user's first post-cut
    // event) merged in: changed states close the current row at the
    // update ts and open a new one, unchanged states no-op, unseen
    // keys insert. The oracle recomposes the identical rule set.
    Q("q78_scd2_merge",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val hist = Scd2.historyFromLog(
          ev.filter(col("ts") < to_timestamp(lit(cut))),
          "user_id", "event_type", "ts", "event_id")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val updates = ev.filter(col("ts") >= to_timestamp(lit(cut)))
          .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
          .select(col("user_id"), col("event_type").as("u_state"),
            col("ts").as("u_ts"))
        Scd2.merge(hist, updates, "user_id")
          .orderBy("user_id", "valid_from", "state")
      },
      Some(s"""WITH pre AS (SELECT * FROM events
            WHERE ts < TIMESTAMP '$cut'),
        chg AS (
          SELECT user_id, event_type, ts, event_id FROM (
            SELECT user_id, event_type, ts, event_id,
              lag(event_type) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS pv
            FROM pre)
          WHERE pv IS NULL OR pv <> event_type),
        hist AS (
          SELECT user_id, event_type AS state, ts AS valid_from,
            lead(ts) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS valid_to
          FROM chg),
        upd AS (
          SELECT user_id, event_type AS u_state, ts AS u_ts FROM (
            SELECT user_id, event_type, ts,
              row_number() OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS rn
            FROM events WHERE ts >= TIMESTAMP '$cut')
          WHERE rn = 1),
        cur AS (SELECT * FROM hist WHERE valid_to IS NULL),
        closed AS (SELECT user_id, state, valid_from, valid_to,
            FALSE AS is_current
          FROM hist WHERE valid_to IS NOT NULL),
        still AS (SELECT c.user_id, c.state, c.valid_from,
            CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
          FROM cur c LEFT JOIN upd u ON c.user_id = u.user_id
          WHERE u.u_state IS NULL OR u.u_state = c.state),
        toclose AS (SELECT c.user_id, c.state, c.valid_from,
            u.u_ts AS valid_to, FALSE AS is_current
          FROM cur c JOIN upd u ON c.user_id = u.user_id
          WHERE u.u_state <> c.state),
        newrows AS (SELECT u.user_id, u.u_state AS state,
            u.u_ts AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to,
            TRUE AS is_current
          FROM upd u LEFT JOIN cur c ON u.user_id = c.user_id
          WHERE c.state IS NULL OR c.state <> u.u_state)
        SELECT * FROM (
          SELECT * FROM closed UNION ALL SELECT * FROM still
          UNION ALL SELECT * FROM toclose UNION ALL
          SELECT * FROM newrows)
        ORDER BY user_id, valid_from, state""")),

    // SCD2 POINT-IN-TIME lookup — the consumption side of q77/q78:
    // every purchase joined to the dimension state that was valid AT
    // ITS OWN event time (fact.ts ∈ [valid_from, valid_to)), the
    // temporal join every as-was report needs. One equi-join keyed on
    // the entity with the interval test as the residual condition —
    // the history side is |state changes|, never |facts|, and each
    // fact matches exactly one interval (the intervals partition each
    // key's timeline).
    Q("q138_scd2_lookup",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val hist = Scd2.historyFromLog(ev,
            "user_id", "event_type", "ts", "event_id")
          .select(col("user_id").as("h_user"), col("state"),
            col("valid_from"), col("valid_to"))
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("value"))
          .join(hist, col("user_id") === col("h_user") &&
            col("ts") >= col("valid_from") &&
            (col("valid_to").isNull || col("ts") < col("valid_to")))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("value"), col("state").as("state_at_purchase"),
            col("valid_from"))
          .orderBy("event_id")
      },
      Some("""WITH chg AS (
          SELECT user_id, event_type, ts, event_id FROM (
            SELECT user_id, event_type, ts, event_id,
              lag(event_type) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS pv
            FROM events)
          WHERE pv IS NULL OR pv <> event_type),
        hist AS (
          SELECT user_id AS h_user, event_type AS state,
            ts AS valid_from,
            lead(ts) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS valid_to
          FROM chg)
        SELECT e.event_id, e.user_id, e.ts, e.value,
          h.state AS state_at_purchase, h.valid_from
        FROM events e JOIN hist h ON e.user_id = h.h_user
          AND e.ts >= h.valid_from
          AND (h.valid_to IS NULL OR e.ts < h.valid_to)
        WHERE e.event_type = 'purchase'
        ORDER BY e.event_id""")),

    // Continuous-aggregate lifecycle (the TimescaleDB rollup-refresh
    // shape): ingest batch 1, build the hourly rollup; ingest batch 2
    // past a MID-HOUR cut, refresh ONLY the incremental window (the
    // operator widens it to full bucket boundaries, so the straddled
    // hour is recomputed from both batches). Final rollup ==
    // straight-from-raw rollup ⟺ the widening and the partition swap
    // are both right — a partial-bucket bug or a stale-partition leak
    // breaks the hash. Decimal partials keep the sums exact.
    Q("q166_continuous_aggregate",
      (s, dir) => {
        val ds = new IngestDataset(s, scratch(), "events_ds")
        val ev = Tables.load(s, dir, "events")
        val midHourCut = "2024-01-20 07:30:00"
        val ca = new graft.ingest.ContinuousAggregate(
          ds, "events", "events_hourly", "ts", "hour",
          Seq("event_type"),
          Seq(count(lit(1)).as("n"),
            sum(col("value").cast(
              org.apache.spark.sql.types.DecimalType(28, 2)))
              .as("total")))
        ds.append("events",
          ev.filter(col("ts") < to_timestamp(lit(midHourCut))),
          partitionTs = Some("ts"))
        ca.refresh(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          java.sql.Timestamp.valueOf(midHourCut))
        ds.append("events",
          ev.filter(col("ts") >= to_timestamp(lit(midHourCut))),
          partitionTs = Some("ts"))
        ca.refresh(java.sql.Timestamp.valueOf(midHourCut),
          java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
        ca.read()
          .select(col("event_type"), col("bucket"), col("n"),
            col("total").cast("double").as("total"))
          .orderBy("event_type", "bucket")
      },
      Some("""SELECT event_type, date_trunc('hour', ts) AS bucket,
          count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // K6 — the metadata-catalog MERGE (ON CONFLICT (schema_name) DO
    // UPDATE, reference init.sql:10-23 / base_crawler.py:25-64) as an
    // oracle row instead of a spec-only surface (r14 verdict #5): a
    // three-upsert replay — insert A, insert B, conflict-update A —
    // read back as the final catalog state. The oracle replays the
    // same upsert sequence relationally: last-writer-wins per key over
    // the insertion-ordered VALUES.
    Q("q319_metadata_merge",
      (s, dir) => {
        val cat = new graft.ingest.MetadataCatalog(s, scratch())
        cat.upsert(graft.ingest.MetadataRow("entsoe",
          java.sql.Date.valueOf("2024-01-05"),
          java.sql.Date.valueOf("2024-01-04"),
          "https://transparency.entsoe.eu", "CC-BY-4.0",
          "ENTSO-E transparency", "ops@example.org", 12, 100L))
        cat.upsert(graft.ingest.MetadataRow("mastr",
          java.sql.Date.valueOf("2024-01-06"),
          java.sql.Date.valueOf("2024-01-06"),
          "https://www.marktstammdatenregister.de", "DL-DE-BY-2.0",
          "Marktstammdatenregister", "ops@example.org", 4, 55L))
        cat.upsert(graft.ingest.MetadataRow("entsoe",
          java.sql.Date.valueOf("2024-02-05"),
          java.sql.Date.valueOf("2024-02-04"),
          "https://transparency.entsoe.eu", "CC-BY-4.0",
          "ENTSO-E transparency v2", "ops@example.org", 13, 140L))
        cat.read()
          .select(col("schema_name"),
            // as TIMESTAMP: pandas maps Spark DATE to object vs
            // DuckDB DATE to datetime64 — the dtype gate needs one type
            col("crawl_date").cast("timestamp").as("crawl_ts"),
            col("data_source"), col("description"),
            col("tables").cast("long").as("tables"), col("size"))
          .orderBy("schema_name")
      },
      Some("""SELECT schema_name,
          CAST(crawl_date AS TIMESTAMP) AS crawl_ts,
          data_source, description, tables, size
        FROM (SELECT *, row_number() OVER (PARTITION BY schema_name
            ORDER BY seq DESC) AS rn
          FROM (VALUES
            (1, 'entsoe', DATE '2024-01-05',
             'https://transparency.entsoe.eu',
             'ENTSO-E transparency', CAST(12 AS BIGINT),
             CAST(100 AS BIGINT)),
            (2, 'mastr', DATE '2024-01-06',
             'https://www.marktstammdatenregister.de',
             'Marktstammdatenregister', CAST(4 AS BIGINT),
             CAST(55 AS BIGINT)),
            (3, 'entsoe', DATE '2024-02-05',
             'https://transparency.entsoe.eu',
             'ENTSO-E transparency v2', CAST(13 AS BIGINT),
             CAST(140 AS BIGINT)))
            AS t(seq, schema_name, crawl_date, data_source,
                 description, tables, size))
        WHERE rn = 1 ORDER BY schema_name""")),

    // S9/I3/I4 — the chunked work-list planners as a deterministic
    // TABLE (r14 verdict #5): forward [from, to) in fixed steps with a
    // short tail chunk, and backward from a watermark down to a floor.
    // The oracle recomputes both with generate_series arithmetic — the
    // planner is correct iff the sequence algebra matches exactly.
    Q("q320_chunk_worklists",
      (s, dir) => {
        import s.implicits._
        val step = 36L * 3600 * 1000 // 36 h: forces an uneven tail
        val fwd = Watermark.forwardChunks(
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          java.sql.Timestamp.valueOf("2024-01-10 00:00:00"), step)
        val bwd = Watermark.backwardChunks(
          java.sql.Timestamp.valueOf("2024-01-10 00:00:00"),
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), step)
        (fwd.zipWithIndex.map { case ((a, b), i) =>
          ("forward", i.toLong, a, b) } ++
         bwd.zipWithIndex.map { case ((a, b), i) =>
          ("backward", i.toLong, a, b) })
          .toDF("direction", "chunk_idx", "chunk_start", "chunk_end")
          .orderBy("direction", "chunk_idx")
      },
      Some("""WITH f AS (SELECT 'forward' AS direction,
            CAST(k AS BIGINT) AS chunk_idx,
            TIMESTAMP '2024-01-01 00:00:00' + k * INTERVAL 36 HOUR
              AS chunk_start,
            least(TIMESTAMP '2024-01-01 00:00:00'
                + (k + 1) * INTERVAL 36 HOUR,
              TIMESTAMP '2024-01-10 00:00:00') AS chunk_end
          FROM generate_series(0, 99) t(k)
          WHERE TIMESTAMP '2024-01-01 00:00:00' + k * INTERVAL 36 HOUR
            < TIMESTAMP '2024-01-10 00:00:00'),
        b AS (SELECT 'backward' AS direction,
            CAST(k AS BIGINT) AS chunk_idx,
            greatest(TIMESTAMP '2024-01-10 00:00:00'
                - (k + 1) * INTERVAL 36 HOUR,
              TIMESTAMP '2024-01-01 00:00:00') AS chunk_start,
            TIMESTAMP '2024-01-10 00:00:00' - k * INTERVAL 36 HOUR
              AS chunk_end
          FROM generate_series(0, 99) t(k)
          WHERE TIMESTAMP '2024-01-10 00:00:00' - k * INTERVAL 36 HOUR
            > TIMESTAMP '2024-01-01 00:00:00')
        SELECT direction, chunk_idx, chunk_start, chunk_end
        FROM (SELECT * FROM f UNION ALL SELECT * FROM b)
        ORDER BY direction, chunk_idx"""))
  )
}
