package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.Tables
import graft.functions.ExactAgg._

/** The nine query-side SQL templates every reference dashboard/doc query
  * reduces to (SURVEY.md §2.10 Q1–Q9), instantiated on the driver
  * TESTDATA star schema.
  *
  * Scale notes (100 TB posture): every aggregate here shuffles once on
  * its grouping key with map-side partial aggregation; dimension joins
  * broadcast the small side; no driver-side collects.
  */
object CoreTemplates {

  private val dec = DecimalType(28, 2)

  val qs: Seq[Q] = Seq(

    // Q1 — time-bucketed aggregation (reference: entsoe.json:147,
    // refit.json:111 `time_bucket('1 hour', ts) + AVG`).
    Q("q1_time_bucket_agg",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        ev.groupBy(
            date_trunc("hour", col("ts")).as("bucket"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), davg(col("value")).as("avg_value"))
          .orderBy("bucket", "event_type")
      },
      Some("""SELECT date_trunc('hour', ts) AS bucket, event_type,
        count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) / CAST(count(value) AS DOUBLE) AS avg_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Q2 — wide multi-measure aggregate (reference: entsoe.json:1486
    // 15-way avg generation mix; TPC-H Q1 shape).
    Q("q2_wide_agg",
      (s, dir) => {
        val li = graft.sources.ScanSpread
          .spread(Tables.load(s, dir, "lineitem"))
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(col("l_extendedprice").cast(dec) *
              (lit(1).cast(dec) - col("l_discount").cast(dec)))
              .cast(DoubleType).as("sum_disc_price"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2)) * (CAST(1 AS DECIMAL(28,2)) - CAST(l_discount AS DECIMAL(28,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / CAST(count(l_quantity) AS DOUBLE) AS avg_qty,
        CAST(sum(CAST(l_discount AS DECIMAL(28,2))) AS DOUBLE) / CAST(count(l_discount) AS DOUBLE) AS avg_disc,
        count(*) AS count_order
        FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Q3 — scalar math inside aggregation (reference: weather.json:428
    // `AVG(temp_air - 273.15)`, `SQRT(POWER(u,2)+POWER(v,2))`).
    Q("q3_scalar_math_agg",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        ev.groupBy(col("event_type"))
          .agg(
            (davg(col("value")) - lit(273.15)).as("avg_celsius"),
            sqrt(sum((col("value").cast(dec) * col("value").cast(dec)))
              .cast(DoubleType) / count(col("value")).cast(DoubleType))
              .as("rms"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
        CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) / CAST(count(value) AS DOUBLE) - 273.15 AS avg_celsius,
        SQRT(CAST(sum(CAST(value AS DECIMAL(28,2)) * CAST(value AS DECIMAL(28,2))) AS DOUBLE) / CAST(count(value) AS DOUBLE)) AS rms
        FROM events GROUP BY 1 ORDER BY 1""")),

    // Q4 — latest-snapshot scalar subquery (reference: weather.json:189
    // `WHERE "time" = (SELECT MAX("time") FROM t)`).
    Q("q4_latest_snapshot",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val maxTs = ev.agg(max(col("ts")).as("_max_ts"))
        ev.join(broadcast(maxTs), col("ts") === col("_max_ts"))
          .select("event_id", "user_id", "event_type", "value")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, event_type, value FROM events
        WHERE ts = (SELECT max(ts) FROM events) ORDER BY event_id""")),

    // Q5 — fact ⋈ dimension chain with aggregation (reference:
    // open_nrw.json:188 fact⋈nuts geo-dim joins). Dims broadcast.
    Q("q5_dim_join_agg",
      (s, dir) => {
        val orders = Tables.load(s, dir, "orders")
        val cust = Tables.load(s, dir, "customer")
        val nation = Tables.load(s, dir, "nation")
        val region = Tables.load(s, dir, "region")
        orders
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("revenue"))
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r_name, n_name, count(*) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Q6 — DISTINCT dimension pull (reference: gie.json:218 map markers,
    // dashboard template variables).
    Q("q6_distinct",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .select("l_returnflag", "l_linestatus").distinct()
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        ORDER BY 1, 2""")),

    // Q7 — CTE + UNION (dedup) + count (reference: jao.json:297).
    Q("q7_union_cte_count",
      (s, dir) => {
        val orders = Tables.load(s, dir, "orders")
        val a = orders.filter(col("o_totalprice") > 150000)
          .select("o_orderkey", "o_orderstatus")
        val b = orders.filter(col("o_orderpriority") === "1-URGENT")
          .select("o_orderkey", "o_orderstatus")
        a.union(b).distinct()
          .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH u AS (
          SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 150000
          UNION
          SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT')
        SELECT o_orderstatus, count(*) AS n FROM u GROUP BY 1 ORDER BY 1""")),

    // Q8 — integer-bucket histogram (reference: jao.json:384
    // `x/60/24 AS d, COUNT(x) GROUP BY d`).
    Q("q8_histogram",
      (s, dir) => {
        Tables.load(s, dir, "orders")
          .groupBy(floor(col("o_totalprice") / 10000).cast(LongType)
            .as("bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy("bucket")
      },
      Some("""SELECT CAST(floor(o_totalprice / 10000) AS BIGINT) AS bucket,
        count(*) AS n FROM orders GROUP BY 1 ORDER BY 1""")),

    // Q9 — PostgREST URL algebra: projection + predicate + order + limit
    // (reference: http_export_examples.md:17-24).
    Q("q9_select_limit",
      (s, dir) => {
        Tables.load(s, dir, "events")
          .filter(col("event_type") === "purchase" && col("value") >= 100)
          .select("event_id", "ts", "value")
          .orderBy("ts", "event_id")
          .limit(10)
      },
      Some("""SELECT event_id, ts, value FROM events
        WHERE event_type = 'purchase' AND value >= 100
        ORDER BY ts, event_id LIMIT 10""")),

    // A6/I1 — watermark aggregate for incremental resume (reference:
    // entsoe_crawler.py:247 `select max("index") from {table}`).
    Q("q17_watermark",
      (s, dir) => {
        Tables.load(s, dir, "events")
          .agg(max(col("ts")).as("wm"), count(lit(1)).as("n"))
      },
      Some("""SELECT max(ts) AS wm, count(*) AS n FROM events"""))
  )
}
