package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables
import graft.functions.ExactAgg._
import graft.functions.Reshape

/** Ingest-side reshape/window operators from SURVEY.md §2 (A7/A8 melt &
  * pivot, W1 sorted-group diff, W2 ffill, W4 keep-first dedup, J5 as-of
  * alignment join, K3/O4 schema-evolving union), each instantiated on the
  * TESTDATA tables with a DuckDB oracle.
  */
object ReshapeOps {

  val qs: Seq[Q] = Seq(

    // A8 — melt / unpivot (reference: regelleistung.py:281-303,
    // vea_industrial_load_profiles.py:122 35k-column melt).
    Q("q10_melt",
      (s, dir) => {
        val part = Tables.load(s, dir, "part")
        Reshape.melt(part, Seq("p_partkey"),
            Seq("p_size", "p_retailprice"))
          .orderBy("p_partkey", "variable")
      },
      Some("""SELECT p_partkey, 'p_size' AS variable,
          CAST(p_size AS DOUBLE) AS value FROM part
        UNION ALL
        SELECT p_partkey, 'p_retailprice' AS variable,
          p_retailprice AS value FROM part
        ORDER BY p_partkey, variable""")),

    // A7 — pivot long→wide with fixed value set (reference:
    // entsoe_crawler.py:359-371 crossborder pair columns). Explicit
    // value list avoids the distinct-discovery scan.
    Q("q11_pivot",
      (s, dir) => {
        val orders = Tables.load(s, dir, "orders")
        Reshape.pivotWide(
            orders.withColumn("month", date_trunc("month", col("o_orderdate"))),
            Seq("month"), "o_orderstatus",
            dsum(col("o_totalprice")), Seq("F", "O", "P"))
          .orderBy("month")
      },
      Some("""SELECT date_trunc('month', o_orderdate) AS month,
        CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(28,2)) END) AS DOUBLE) AS "F",
        CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(28,2)) END) AS DOUBLE) AS "O",
        CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(28,2)) END) AS DOUBLE) AS "P"
        FROM orders GROUP BY 1 ORDER BY 1""")),

    // W1 — ordered diff within group (reference: ecmwf.py:159-166
    // de-accumulation of 24h radiation via sort+diff).
    Q("q12_window_diff",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val w = Window.partitionBy("user_id").orderBy("ts")
        ev.withColumn("diff", col("value") - lag(col("value"), 1).over(w))
          .select("event_id", "user_id", "ts", "diff")
          .orderBy("user_id", "ts")
      },
      Some("""SELECT event_id, user_id, ts,
        value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS diff
        FROM events ORDER BY user_id, ts""")),

    // W4/P8 — keep-first-per-key dedup with explicit order (reference:
    // smard.py:169-171; latest row per entity like e2watch.py:170).
    Q("q13_dedup_latest",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        Reshape.dedupKeepFirst(ev, Seq("user_id"),
            Seq(col("ts").desc, col("event_id").desc))
          .select("user_id", "event_id", "ts", "event_type")
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_id, ts, event_type FROM (
          SELECT user_id, event_id, ts, event_type,
            row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1 ORDER BY user_id""")),

    // W2/P5 — forward-fill over ordered groups (reference: opec.py:82
    // `.bfill().ffill()`, instrat_pl.py:64-65). Gaps simulated by
    // nulling small values.
    Q("q14_ffill",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val w = Window.partitionBy("user_id").orderBy("ts")
        ev.withColumn("gap_value",
            when(col("value") < 50, lit(null).cast(DoubleType))
              .otherwise(col("value")))
          .withColumn("filled", Reshape.ffill(col("gap_value"), w))
          .select("event_id", "user_id", "ts", "filled")
          .orderBy("user_id", "ts")
      },
      Some("""SELECT event_id, user_id, ts,
          last_value(gap_value IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        FROM (SELECT event_id, user_id, ts,
          CASE WHEN value < 50 THEN NULL ELSE value END AS gap_value
          FROM events) ORDER BY user_id, ts""")),

    // J5 — as-of alignment join: for each click, the most recent
    // purchase value by the same user (reference: opec.py:82 FX-rate
    // reindex+ffill alignment). Implemented as the scalable
    // union+ffill pattern — ONE shuffle on user_id, no per-row probe.
    Q("q15_asof_join",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts", "value")
        graft.operators.AsOfJoin.asOf(clicks, purchases,
            Seq("user_id"), "ts", "ts", Seq("value"))
          .withColumnRenamed("asof_value", "last_purchase_value")
          .orderBy("event_id")
      },
      Some("""SELECT c.event_id, c.user_id, c.ts,
          p.value AS last_purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id AND c.ts >= p.ts
        ORDER BY c.event_id""")),

    // J5 completion — as-of join with a TOLERANCE horizon (pandas
    // merge_asof(tolerance=…)): a purchase more than 6 h older than
    // the click no longer counts as "current" and the carried value
    // goes null. Same single-shuffle union+ffill plan as q15; the
    // staleness test is a map-side projection on the floor-epoch
    // difference (whole seconds — the engine-portable comparison).
    Q("q196_asof_tolerance",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts", "value")
        graft.operators.AsOfJoin.asOfTolerance(clicks, purchases,
            Seq("user_id"), "ts", "ts", Seq("value"),
            toleranceSec = 21600L)
          .withColumnRenamed("asof_value", "recent_purchase_value")
          .orderBy("event_id")
      },
      Some("""SELECT c.event_id, c.user_id, c.ts,
          CASE WHEN p.ts IS NOT NULL
              AND CAST(floor(epoch(c.ts)) AS BIGINT)
                - CAST(floor(epoch(p.ts)) AS BIGINT) <= 21600
            THEN p.value END AS recent_purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id AND c.ts >= p.ts
        ORDER BY c.event_id""")),

    // K3/O4 — schema-evolving append: union-by-name with null-fill for
    // columns absent in the old batch (reference:
    // entsoe_crawler.py:196-209 concat-replace fallback).
    Q("q16_union_evolve",
      (s, dir) => {
        val orders = Tables.load(s, dir, "orders")
        val cut = lit("1998-01-01").cast("timestamp")
        val old = orders.filter(col("o_orderdate") < cut)
          .select("o_orderkey", "o_totalprice")
        val fresh = orders.filter(col("o_orderdate") >= cut)
          .select("o_orderkey", "o_totalprice", "o_orderpriority")
        Reshape.unionEvolve(old, fresh).orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice,
          CAST(NULL AS VARCHAR) AS o_orderpriority
        FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
        UNION ALL
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        ORDER BY o_orderkey"""))
  )
}
