package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ExactAgg._
import graft.functions.{GrafanaMacros, LocaleFuncs, Reshape, TimeFuncs}
import graft.operators.{RestQuery, RpcRegistry}

/** Scalar-function families and remaining aggregate patterns from
  * SURVEY.md §2.5/§2.8, plus the SQL and PostgREST read surfaces. Each
  * locale/format parser is validated by a round-trip: the query
  * *constructs* the dialect string from clean source values, parses it
  * back, and the oracle derives the expected result from the source
  * directly — lossless round-trip ⟺ parser correct.
  */
object ScalarOps {

  val qs: Seq[Q] = Seq(

    // F2 — German decimal parsing with source null markers
    // (netztransparenz/ladesaeulenregister dialect).
    Q("q35_locale_parse",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val german = when(col("event_id") % 50 === 0, lit("n.a."))
          .otherwise(regexp_replace(col("value").cast("string"), "\\.", ","))
        ev.select(col("event_id"),
            LocaleFuncs.germanDouble(german).as("parsed"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
          CASE WHEN event_id % 50 = 0 THEN NULL ELSE value END AS parsed
        FROM events ORDER BY event_id""")),

    // F3 — date+time+zone-label composition to UTC across the DST
    // boundary (netztransparenz.py:97-106).
    Q("q36_compose_timestamp",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val zone = when(month(col("o_orderdate")).between(4, 9), "CEST")
          .otherwise("CET")
        o.select(col("o_orderkey"),
            LocaleFuncs.composeUtcTimestamp(
              date_format(col("o_orderdate"), "dd.MM.yyyy"),
              lit("12:30"), zone).as("utc_ts"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
          o_orderdate + INTERVAL 12 HOUR + INTERVAL 30 MINUTE
            - (CASE WHEN month(o_orderdate) BETWEEN 4 AND 9
               THEN INTERVAL 2 HOUR ELSE INTERVAL 1 HOUR END) AS utc_ts
        FROM orders ORDER BY o_orderkey""")),

    // A9 — calendar resample + gap fill: daily grid per entity from its
    // own span (sequence+explode), missing days forward-filled
    // (instrat_pl.py:53-65 resample().bfill().ffill()).
    Q("q37_resample_ffill",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .filter(col("user_id") < 15)
        val daily = ev
          .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
          .agg(dsum(col("value")).as("day_sum"))
        val cal = daily.groupBy("user_id")
          .agg(min("day").as("d0"), max("day").as("d1"))
          .select(col("user_id"),
            explode(sequence(col("d0"), col("d1"),
              expr("interval 1 day"))).as("day"))
        val w = Window.partitionBy("user_id").orderBy("day")
        cal.join(daily, Seq("user_id", "day"), "left")
          .withColumn("filled", Reshape.ffill(col("day_sum"), w))
          .select("user_id", "day", "filled")
          .orderBy("user_id", "day")
      },
      Some("""WITH daily AS (
          SELECT user_id, date_trunc('day', ts) AS day,
            CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS day_sum
          FROM events WHERE user_id < 15 GROUP BY 1, 2),
        spans AS (SELECT user_id, min(day) AS d0, max(day) AS d1
          FROM daily GROUP BY 1),
        cal AS (SELECT user_id,
            unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
          FROM spans)
        SELECT c.user_id, c.day,
          last_value(d.day_sum IGNORE NULLS) OVER (
            PARTITION BY c.user_id ORDER BY c.day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        FROM cal c LEFT JOIN daily d
          ON c.user_id = d.user_id AND c.day = d.day
        ORDER BY 1, 2""")),

    // A12 — schema-introspected column-pair algebra (net generation
    // shape, entsoe_crawler.py:80-117): pivot wide, then
    // `net_X = X_agg − X_cons` discovered from column names.
    Q("q38_column_pair_algebra",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .withColumn("day", date_trunc("day", col("ts")))
        val wide = Reshape.pivotWide(ev, Seq("day"), "event_type",
            dsum(col("value")),
            Seq("click", "view", "purchase", "signup"))
          .withColumnsRenamed(Map(
            "click" -> "eng_actual_aggregated",
            "view" -> "eng_actual_consumption",
            "purchase" -> "rev_actual_aggregated",
            "signup" -> "rev_actual_consumption"))
        Reshape.pairDiff(wide, Seq("day"),
            "_actual_aggregated", "_actual_consumption")
          .orderBy("day")
      },
      Some("""SELECT date_trunc('day', ts) AS day,
          coalesce(CAST(sum(CASE WHEN event_type = 'click'
              THEN CAST(value AS DECIMAL(28,2)) END) AS DOUBLE), 0.0)
            - coalesce(CAST(sum(CASE WHEN event_type = 'view'
              THEN CAST(value AS DECIMAL(28,2)) END) AS DOUBLE), 0.0)
            AS net_eng,
          coalesce(CAST(sum(CASE WHEN event_type = 'purchase'
              THEN CAST(value AS DECIMAL(28,2)) END) AS DOUBLE), 0.0)
            - coalesce(CAST(sum(CASE WHEN event_type = 'signup'
              THEN CAST(value AS DECIMAL(28,2)) END) AS DOUBLE), 0.0)
            AS net_rev
        FROM events GROUP BY 1 ORDER BY 1""")),

    // J6 — horizontal concat on index: per-series daily means aligned
    // by full-outer join reduce (pd.concat(axis=1) shape).
    Q("q39_horizontal_concat",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .withColumn("day", date_trunc("day", col("ts")))
        val series = Seq("click", "view", "purchase").map { t =>
          ev.filter(col("event_type") === t)
            .groupBy("day").agg(davg(col("value")).as(s"${t}_avg"))
        }
        Reshape.concatOnIndex(series, "day").orderBy("day")
      },
      Some("""SELECT date_trunc('day', ts) AS day,
          CASE WHEN count(CASE WHEN event_type = 'click' THEN value END) > 0
            THEN CAST(sum(CASE WHEN event_type = 'click'
              THEN CAST(value AS DECIMAL(28,2)) END) AS DOUBLE)
              / CAST(count(CASE WHEN event_type = 'click' THEN value END) AS DOUBLE)
            END AS click_avg,
          CASE WHEN count(CASE WHEN event_type = 'view' THEN value END) > 0
            THEN CAST(sum(CASE WHEN event_type = 'view'
              THEN CAST(value AS DECIMAL(28,2)) END) AS DOUBLE)
              / CAST(count(CASE WHEN event_type = 'view' THEN value END) AS DOUBLE)
            END AS view_avg,
          CASE WHEN count(CASE WHEN event_type = 'purchase' THEN value END) > 0
            THEN CAST(sum(CASE WHEN event_type = 'purchase'
              THEN CAST(value AS DECIMAL(28,2)) END) AS DOUBLE)
              / CAST(count(CASE WHEN event_type = 'purchase' THEN value END) AS DOUBLE)
            END AS purchase_avg
        FROM events
        GROUP BY 1
        HAVING count(CASE WHEN event_type IN ('click','view','purchase')
          THEN 1 END) > 0
        ORDER BY 1""")),

    // SQL read surface: a dashboard-shaped query through spark.sql with
    // the registered time_bucket helper (Grafana/psql surface parity).
    Q("q40_sql_surface",
      (s, dir) => {
        Tables.registerAll(s, dir)
        TimeFuncs.register(s)
        s.sql("""SELECT time_bucket_s(3600, ts) AS bucket, event_type,
            count(*) AS n
          FROM events GROUP BY 1, 2 ORDER BY 1, 2""")
      },
      Some("""SELECT date_trunc('hour', ts) AS bucket, event_type,
          count(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Grafana dashboard surface: the reference's provisioned rawSql
    // panel shape (`entsoe.json` load panel: $__timeGroupAlias +
    // $__interval_ms unit-scaling + $__timeFilter + quoted aliases)
    // runs VERBATIM through GrafanaMacros.expand → spark.sql. max()
    // instead of sum() keeps the aggregate order-independent (double
    // sums aren't; the division itself is per-row bit-exact).
    Q("q61_grafana_dashboard_sql",
      (s, dir) => {
        Tables.registerAll(s, dir)
        TimeFuncs.register(s)
        val rawSql = """SELECT
  $__timeGroupAlias(ts,$__interval),
  max(value/($__interval_ms/1000/3600)) AS "peak_load",
  count(*) AS "n"
FROM events
WHERE
  $__timeFilter(ts) AND
  event_type IN ('click','view')
GROUP BY 1
ORDER BY 1"""
        s.sql(GrafanaMacros.expand(rawSql,
          from = "2024-01-05 00:00:00", to = "2024-01-20 00:00:00",
          interval = "1h"))
      },
      Some("""SELECT date_trunc('hour', ts) AS "time",
          max(value/(3600000/1000/3600)) AS "peak_load",
          count(*) AS "n"
        FROM events
        WHERE ts BETWEEN TIMESTAMP '2024-01-05 00:00:00'
          AND TIMESTAMP '2024-01-20 00:00:00'
          AND event_type IN ('click','view')
        GROUP BY 1 ORDER BY 1""")),

    // TimescaleDB surface surfaced by the dashboard-corpus sweep: the
    // reference's refit.json panel calls time_bucket('1 hour', ts)
    // DIRECTLY (no Grafana macro), plus a template variable in the
    // quoted-literal form. Both run verbatim: substituteVars splices
    // the variable literal-aware, the registered time_bucket parses
    // the spaced pg interval. Oracle is DuckDB's native time_bucket
    // (both engines' 15-min buckets are origin-aligned: the 2000-01-01
    // vs 1970 origin difference is a multiple of 900 s).
    Q("q142_timescale_bucket_sql",
      (s, dir) => {
        Tables.registerAll(s, dir)
        TimeFuncs.register(s)
        val rawSql = """SELECT
  time_bucket('15 minutes', ts) AS bucket_ts,
  CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value,
  count(*) AS n
FROM events
WHERE EXTRACT(YEAR FROM ts) = 2024 AND event_type = '$etype'
GROUP BY bucket_ts
ORDER BY bucket_ts"""
        s.sql(GrafanaMacros.substituteVars(rawSql, Map("etype" -> "click")))
      },
      Some("""SELECT time_bucket(INTERVAL '15 minutes', ts) AS bucket_ts,
          CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value,
          count(*) AS n
        FROM events
        WHERE EXTRACT(YEAR FROM ts) = 2024 AND event_type = 'click'
        GROUP BY 1 ORDER BY 1""")),

    // Q9 — PostgREST URL algebra translated to a DataFrame plan
    // (http_export_examples.md:17-24 shape).
    Q("q41_rest_algebra",
      (s, dir) => {
        RestQuery(Tables.load(s, dir, "events"),
          "select=event_type,event_id.count(),value.max()" +
            "&ts=gte.2024-01-15 00:00:00&order=event_type&limit=3")
      },
      Some("""SELECT event_type, count(event_id) AS event_id_count,
          max(value) AS value_max
        FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
        GROUP BY 1 ORDER BY 1 LIMIT 3""")),

    // Q9 second half — PostgREST stored-procedure surface
    // (`postgrest_stored_procedure.sql:5-33`): a registered named
    // procedure (the reference's year/country/technology/SUM shape over
    // orders), dispatched from the verbatim `/rpc/<name>` URL with a
    // plain function ARGUMENT (min_total) plus PostgREST FILTERS
    // (yr=gte., order, limit) composed onto the result via RestQuery.
    Q("q60_rpc_procedure",
      (s, dir) => {
        RpcRegistry.register("generation_by_year_status",
          (sp, args) => {
            val minTotal = args.getOrElse("min_total", "0").toDouble
            Tables.load(sp, dir, "orders")
              .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
                col("o_orderstatus").as("status"),
                col("o_orderpriority").as("priority"))
              .agg(dsum(col("o_totalprice")).as("total_production"))
              .filter(col("total_production") >= minTotal)
          })
        RpcRegistry.dispatch(s,
          "/rpc/generation_by_year_status?min_total=100000" +
            "&yr=gte.1995&order=yr,status,priority&limit=60")
      },
      Some(s"""SELECT * FROM (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
            o_orderstatus AS status, o_orderpriority AS priority,
            ${sqlSum("o_totalprice")} AS total_production
          FROM orders GROUP BY 1, 2, 3
          HAVING ${sqlSum("o_totalprice")} >= 100000) t
        WHERE yr >= 1995 ORDER BY yr, status, priority LIMIT 60""")),

    // F6 — JSON navigation: extract typed fields from a JSON payload
    // column (reference: smard/e2watch/gie series parsing, SURVEY.md
    // §2.8 F6) and aggregate on them.
    Q("q42_json_extract",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        ev.select(col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy((col("k") % 10).as("k_bucket"))
          .agg(count(lit(1)).as("n"), max(col("k")).as("max_k"))
          .orderBy("k_bucket")
      },
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
            AS k_bucket,
          count(*) AS n,
          max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events GROUP BY 1 ORDER BY 1""")),

    // Q4 through the SQL-text surface: Catalyst scalar subquery
    // (weather.json:189 latest-snapshot shape as raw SQL).
    Q("q50_sql_scalar_subquery",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT event_id, user_id, value FROM events
          WHERE ts = (SELECT max(ts) FROM events) ORDER BY event_id""")
      },
      Some("""SELECT event_id, user_id, value FROM events
        WHERE ts = (SELECT max(ts) FROM events) ORDER BY event_id""")),

    // O1 — null-ordering sort expression (reference:
    // metadata_sql_helpers.sql:173-175 `ORDER BY nuts_id IS NULL, …`).
    Q("q51_null_ordering",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        o.withColumn("prio",
            when(col("o_orderpriority") === "3-MEDIUM",
              lit(null).cast("string"))
              .otherwise(col("o_orderpriority")))
          .orderBy(col("prio").isNull, col("prio"), col("o_orderkey"))
          .select("o_orderkey", "prio")
          .limit(50)
      },
      Some("""SELECT o_orderkey, prio FROM (
          SELECT o_orderkey,
            CASE WHEN o_orderpriority = '3-MEDIUM' THEN NULL
              ELSE o_orderpriority END AS prio
          FROM orders)
        ORDER BY (prio IS NULL), prio, o_orderkey LIMIT 50""")),

    // W5 — per-group cubic spline interpolation onto a regular grid
    // (windmodel turbine-curve shape). The oracle re-derives the
    // natural-spline second derivatives with a recursive-CTE Thomas
    // algorithm mirroring Interpolation.secondDerivatives OP FOR OP
    // (same divisions, same association), so the piecewise cubic
    // evaluates bit-identically in DuckDB — flipping this entry from
    // rows-only to a full hash check. HullInterpSpec still pins the
    // numerics independently.
    Q("q44_spline_grid",
      (s, dir) => {
        val sup = Tables.load(s, dir, "supplier")
        val curves = sup
          .withColumn("x", (col("s_suppkey") % 10).cast("double"))
          .groupBy(col("s_nationkey").cast("string").as("nation"),
            col("x"))
          .agg(davg(col("s_acctbal")).as("y"))
        graft.functions.Interpolation.splineOnGrid(
            curves, "nation", "x", "y",
            (0 to 18).map(_ * 0.5))
          .orderBy("group", "x")
      },
      Some(s"""WITH RECURSIVE
        pts AS (
          SELECT CAST(s_nationkey AS VARCHAR) AS nation,
            CAST(s_suppkey % 10 AS DOUBLE) AS x,
            ${sqlAvg("s_acctbal")} AS y
          FROM supplier GROUP BY 1, 2),
        curves AS (
          SELECT nation, x, y,
            CAST(row_number() OVER (PARTITION BY nation ORDER BY x) - 1
              AS INT) AS i,
            CAST(count(*) OVER (PARTITION BY nation) AS INT) AS n
          FROM pts),
        -- tridiagonal rows: a=h0, b=2(h0+h1), c=h1, d=6*(slope diff)
        -- interior; b=1, a=c=d=0 at the natural-boundary rows (exactly
        -- the arrays secondDerivatives builds)
        coef AS (
          SELECT c.nation, c.i, c.n,
            CASE WHEN c.i >= 1 AND c.i <= c.n - 2
              THEN c.x - xp.x ELSE 0.0 END AS a,
            CASE WHEN c.i = 0 OR c.i = c.n - 1 THEN 1.0
              ELSE 2 * ((c.x - xp.x) + (xn.x - c.x)) END AS b,
            CASE WHEN c.i >= 1 AND c.i <= c.n - 2
              THEN xn.x - c.x ELSE 0.0 END AS cc,
            CASE WHEN c.i >= 1 AND c.i <= c.n - 2
              THEN 6 * ((xn.y - c.y) / (xn.x - c.x)
                - (c.y - xp.y) / (c.x - xp.x))
              ELSE 0.0 END AS d
          FROM curves c
          LEFT JOIN curves xp ON xp.nation = c.nation AND xp.i = c.i - 1
          LEFT JOIN curves xn ON xn.nation = c.nation AND xn.i = c.i + 1),
        -- Thomas forward sweep: w=a(i)/b'(i-1); b'=b-w*c(i-1); d'=d-w*d'(i-1)
        fwd AS (
          SELECT nation, i, n, b AS bp, d AS dp, cc FROM coef WHERE i = 0
          UNION ALL
          SELECT c.nation, c.i, c.n,
            c.b - (c.a / f.bp) * f.cc,
            c.d - (c.a / f.bp) * f.dp,
            c.cc
          FROM fwd f JOIN coef c ON c.nation = f.nation AND c.i = f.i + 1),
        -- back substitution: m(last)=d'/b'; m(i)=(d'(i)-c(i)*m(i+1))/b'(i)
        bwd AS (
          SELECT nation, i, dp / bp AS m FROM fwd WHERE i = n - 1
          UNION ALL
          SELECT f.nation, f.i, (f.dp - f.cc * b.m) / f.bp
          FROM bwd b JOIN fwd f ON f.nation = b.nation AND f.i = b.i - 1),
        stats AS (
          SELECT c.nation, max(c.n) AS n, min(c.x) AS xmin, max(c.x) AS xmax,
            max(CASE WHEN c.i = 0 THEN c.y END) AS y_first,
            max(CASE WHEN c.i = c.n - 1 THEN c.y END) AS y_last
          FROM curves c GROUP BY 1),
        gq AS (
          SELECT st.nation, t.k * 0.5 AS q FROM stats st, range(0, 19) t(k)),
        -- left knot of q's interval (only needed strictly inside the range)
        k0 AS (
          SELECT gq.nation, gq.q, max(c.i) AS i
          FROM gq JOIN curves c ON c.nation = gq.nation AND c.x <= gq.q
          GROUP BY 1, 2)
        SELECT gq.nation AS "group", gq.q AS x,
          CASE
            WHEN st.n = 1 OR gq.q <= st.xmin THEN st.y_first
            WHEN gq.q >= st.xmax THEN st.y_last
            ELSE kl.y
              + (gq.q - kl.x) * ((kr.y - kl.y) / (kr.x - kl.x)
                - (kr.x - kl.x) / 6 * (2 * ml.m + mr.m))
              + (gq.q - kl.x) * (gq.q - kl.x) * ml.m / 2
              + (gq.q - kl.x) * (gq.q - kl.x) * (gq.q - kl.x)
                * (mr.m - ml.m) / (6 * (kr.x - kl.x))
          END AS y
        FROM gq
        JOIN stats st ON st.nation = gq.nation
        LEFT JOIN k0 ON k0.nation = gq.nation AND k0.q = gq.q
        LEFT JOIN curves kl ON kl.nation = gq.nation AND kl.i = k0.i
        LEFT JOIN curves kr ON kr.nation = gq.nation AND kr.i = k0.i + 1
        LEFT JOIN bwd ml ON ml.nation = gq.nation AND ml.i = k0.i
        LEFT JOIN bwd mr ON mr.nation = gq.nation AND mr.i = k0.i + 1
        ORDER BY "group", x""")),

    // Per-group z-score outlier flagging (data-cleaning primitive:
    // the statistical generalization of the reference's clamp ops).
    // Group moments via fixed-scale DECIMAL sums — associative, so
    // bit-identical under any partitioning and in the oracle; the
    // per-row z itself is plain IEEE double arithmetic (deterministic
    // on both engines). Stats broadcast back onto the fact rows.
    Q("q82_zscore_outliers",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val stats = ev.groupBy("event_type").agg(
            count(lit(1)).as("n"),
            sum(col("value").cast(org.apache.spark.sql.types
              .DecimalType(28, 2))).cast("double").as("s1"),
            sum((col("value") * col("value"))
              .cast(org.apache.spark.sql.types.DecimalType(28, 4)))
              .cast("double").as("s2"))
          .withColumn("mean", col("s1") / col("n"))
          .withColumn("variance",
            col("s2") / col("n") - col("mean") * col("mean"))
          .filter(col("variance") > 0)
          .withColumn("std", sqrt(col("variance")))
          .select("event_type", "mean", "std")
        ev.join(broadcast(stats), "event_type")
          .withColumn("zscore",
            (col("value") - col("mean")) / col("std"))
          .select(col("event_id"), col("event_type"), col("value"),
            col("zscore"), (abs(col("zscore")) > 3).as("is_outlier"))
          .orderBy("event_id")
      },
      Some("""WITH stats AS (SELECT event_type, count(*) AS n,
            CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS s1,
            CAST(sum(CAST(value * value AS DECIMAL(28,4))) AS DOUBLE)
              AS s2
          FROM events GROUP BY 1),
        st2 AS (SELECT event_type, s1 / n AS mean,
            s2 / n - (s1 / n) * (s1 / n) AS variance
          FROM stats),
        st3 AS (SELECT event_type, mean, sqrt(variance) AS std
          FROM st2 WHERE variance > 0)
        SELECT e.event_id, e.event_type, e.value,
          (e.value - mean) / std AS zscore,
          abs((e.value - mean) / std) > 3 AS is_outlier
        FROM events e JOIN st3 USING (event_type)
        ORDER BY event_id""")),

    // ROLLUP with grouping id: per-(flag, status) measures plus flag
    // subtotals plus the grand total in ONE pass — Spark expands the
    // grouping sets before the hash aggregation, so at 100 TB this is
    // still a single shuffle (vs three scans + a union). The grouping
    // bitmask (first column = MSB) matches DuckDB's GROUPING();
    // subtotal rows carry NULL group keys, ordered NULLS FIRST
    // explicitly on both sides (the engines' ASC defaults differ).
    Q("q84_rollup_agg",
      (s, dir) => {
        graft.sources.ScanSpread.spread(Tables.load(s, dir, "lineitem"))
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(grouping_id().cast("long").as("gid"),
            count(lit(1)).as("n"),
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_price"))
          .select("gid", "l_returnflag", "l_linestatus", "n", "sum_qty",
            "sum_price")
          .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
      },
      Some(s"""SELECT
          CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
          l_returnflag, l_linestatus, count(*) AS n,
          ${sqlSum("l_quantity")} AS sum_qty,
          ${sqlSum("l_extendedprice")} AS sum_price
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY gid, l_returnflag ASC NULLS FIRST,
          l_linestatus ASC NULLS FIRST""")),

    // Soundex phonetic keys over the part-name vocabulary — the
    // blocking function record linkage reaches for when spellings
    // drift (F-layer: completes sanitizeIdentifier/germanDouble with
    // the phonetic normalizer). The oracle replays the NARA algorithm
    // step-for-step in window SQL: h/w dropped (transparent), codes,
    // run heads kept, the first letter's slot removed, vowel zeros
    // dropped, three digits zero-padded. Group sizes per key show the
    // phonetic blocking structure.
    Q("q243_soundex",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val words = Tables.load(s, dir, "part")
          .select(explode(split(col("p_name"), " ")).as("word"))
          .filter(col("word") =!= "").distinct()
          .as[String]
          .map(w => (w, LocaleFuncs.soundex(w)))
          .toDF("word", "sx")
        val groups = words.groupBy("sx")
          .agg(count(lit(1)).as("group_n"))
        words.join(groups, Seq("sx"))
          .select(col("word"), col("sx"), col("group_n"))
          .orderBy("word")
      },
      Some("""WITH words AS (SELECT DISTINCT w AS word FROM (
            SELECT unnest(string_split(p_name, ' ')) AS w FROM part)
          WHERE w <> ''),
        norm AS (SELECT word,
            regexp_replace(lower(word), '[^a-z]', '', 'g') AS nw
          FROM words),
        chars AS (SELECT word, t.i, substr(nw, t.i, 1) AS ch
          FROM norm, UNNEST(range(1, strlen(nw) + 1)) t(i)),
        kept AS (SELECT word, i, ch FROM chars
          WHERE i = 1 OR (ch <> 'h' AND ch <> 'w')),
        coded AS (SELECT word, i,
            CASE WHEN ch IN ('b','f','p','v') THEN '1'
                 WHEN ch IN ('c','g','j','k','q','s','x','z') THEN '2'
                 WHEN ch IN ('d','t') THEN '3'
                 WHEN ch = 'l' THEN '4'
                 WHEN ch IN ('m','n') THEN '5'
                 WHEN ch = 'r' THEN '6'
                 ELSE '0' END AS cd
          FROM kept),
        runs AS (SELECT word, i, cd,
            lag(cd) OVER (PARTITION BY word ORDER BY i) AS pc,
            row_number() OVER (PARTITION BY word ORDER BY i) AS rn
          FROM coded),
        digits AS (SELECT word, cd,
            row_number() OVER (PARTITION BY word ORDER BY i) AS dn
          FROM runs
          WHERE (pc IS NULL OR cd <> pc) AND rn > 1 AND cd <> '0'),
        sx0 AS (SELECT n.word,
            CASE WHEN n.nw = '' THEN ''
              ELSE upper(substr(n.nw, 1, 1)) ||
                coalesce(string_agg(d.cd, '' ORDER BY d.dn)
                  FILTER (d.dn <= 3), '') END AS raw
          FROM norm n LEFT JOIN digits d ON d.word = n.word
          GROUP BY n.word, n.nw),
        sx AS (SELECT word,
            CASE WHEN raw = '' THEN ''
              ELSE raw || repeat('0', 4 - strlen(raw)) END AS sx
          FROM sx0),
        groups AS (SELECT sx, CAST(count(*) AS BIGINT) AS group_n
          FROM sx GROUP BY 1)
        SELECT s.word, s.sx, g.group_n
        FROM sx s JOIN groups g ON g.sx = s.sx
        ORDER BY s.word"""))
  )
}
