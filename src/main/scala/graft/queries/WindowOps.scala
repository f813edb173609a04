package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.Tables
import graft.expressions.TopKAggregate
import graft.functions.ExactAgg._

/** Advanced window compositions common to analytics and training-data
  * pipelines: top-N per group, running totals, gap-based
  * sessionization, vocabulary extraction. All oracle-checked.
  */
object WindowOps {

  private val dec = DecimalType(28, 2)

  val qs: Seq[Q] = Seq(

    // Top-N per group over a join: 3 highest-revenue customers per
    // nation (rank + dim join + exact aggregation).
    Q("q45_topn_per_group",
      (s, dir) => {
        val orders = Tables.load(s, dir, "orders")
        val cust = Tables.load(s, dir, "customer")
        val nation = Tables.load(s, dir, "nation")
        val rev = orders
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("c_custkey"))
          .agg(dsum(col("o_totalprice")).as("revenue"))
        val w = Window.partitionBy("n_name")
          .orderBy(col("revenue").desc, col("c_custkey"))
        rev.withColumn("rk", row_number().over(w).cast(LongType))
          .filter(col("rk") <= 3)
          .select("n_name", "rk", "c_custkey", "revenue")
          .orderBy("n_name", "rk")
      },
      Some("""SELECT n_name, rk, c_custkey, revenue FROM (
          SELECT n_name, c_custkey, revenue,
            row_number() OVER (PARTITION BY n_name
              ORDER BY revenue DESC, c_custkey) AS rk
          FROM (
            SELECT n_name, c_custkey,
              CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
                AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2))
        WHERE rk <= 3 ORDER BY n_name, rk""")),

    // Running cumulative total per user (frame-spec window; decimal
    // partials keep the running values engine-exact).
    Q("q46_running_sum",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .filter(col("user_id") < 25)
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("running_value",
            sum(col("value").cast(dec)).over(w).cast(DoubleType))
          .select("user_id", "event_id", "ts", "running_value")
          .orderBy("user_id", "ts", "event_id")
      },
      Some("""SELECT user_id, event_id, ts,
          CAST(sum(CAST(value AS DECIMAL(28,2))) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
            AS running_value
        FROM events WHERE user_id < 25
        ORDER BY user_id, ts, event_id""")),

    // Gap-based sessionization: a >30-minute silence starts a new
    // session; emit per-session stats. The classic two-window
    // composition (lag → boundary flag → cumulative sum → group).
    Q("q47_sessionize",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val wOrder = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val flagged = ev.withColumn("prev_ts",
            lag(col("ts"), 1).over(wOrder))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))
                > 1800, 1).otherwise(0))
          .withColumn("session_id",
            sum(col("new_session")).over(
              wOrder.rowsBetween(Window.unboundedPreceding,
                Window.currentRow)))
        flagged.groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"),
            dsum(col("value")).as("session_value"))
          .orderBy("user_id", "session_id")
      },
      Some("""WITH flagged AS (
          SELECT user_id, ts, event_id, value,
            CASE WHEN lag(ts, 1) OVER w IS NULL
              OR CAST(floor(epoch(ts)) AS BIGINT)
                - CAST(floor(epoch(lag(ts, 1) OVER w)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sessions AS (
          SELECT user_id, ts, value,
            CAST(sum(new_session) OVER (PARTITION BY user_id
              ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_id
          FROM flagged)
        SELECT user_id, session_id, count(*) AS n_events,
          min(ts) AS session_start, max(ts) AS session_end,
          CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE)
            AS session_value
        FROM sessions GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Vocabulary extraction with n-gram counts (tokenizer prep for BPE
    // training): unigram + bigram frequencies, top 20 by count.
    Q("q48_vocab_ngrams",
      (s, dir) => {
        val docs = graft.sources.ScanSpread
          .spread(Tables.load(s, dir, "documents"))
        val words = docs.select(
          explode(split(col("text"), " ")).as("gram"))
        val bigrams = docs.select(explode(
          graft.functions.TextFuncs.shingles(col("text"), 2)).as("gram"))
        words.withColumn("n_gram", lit(1))
          .unionByName(bigrams.withColumn("n_gram", lit(2)))
          .groupBy("n_gram", "gram")
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("n_gram")
              .orderBy(col("cnt").desc, col("gram"))).cast(LongType))
          .filter(col("rk") <= 20)
          .select("n_gram", "rk", "gram", "cnt")
          .orderBy("n_gram", "rk")
      },
      Some("""WITH words AS (
          SELECT 1 AS n_gram, unnest(string_split(text, ' ')) AS gram
          FROM documents),
        bg AS (SELECT doc_id, string_split(text, ' ') AS ws
          FROM documents),
        bigrams AS (
          SELECT 2 AS n_gram, ws[i] || ' ' || ws[i+1] AS gram
          FROM bg, UNNEST(range(1, len(ws))) AS t(i)),
        counts AS (
          SELECT n_gram, gram, count(*) AS cnt
          FROM (SELECT * FROM words UNION ALL SELECT * FROM bigrams)
          GROUP BY 1, 2)
        SELECT n_gram, rk, gram, cnt FROM (
          SELECT n_gram, gram, cnt,
            row_number() OVER (PARTITION BY n_gram
              ORDER BY cnt DESC, gram) AS rk
          FROM counts)
        WHERE rk <= 20 ORDER BY n_gram, rk""")),

    // Exact rank-based quantiles per group (deterministic alternative
    // to interpolated percentiles — engine-portable by construction:
    // the quantile is an actual data element selected by rank).
    Q("q52_exact_quantiles",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val wOrd = Window.partitionBy("event_type")
          .orderBy("value", "event_id")
        val wAll = Window.partitionBy("event_type")
        // Single pass over the ranked window: one filter keeps both
        // quantile ranks, then explode over the matched labels (a rank
        // that is simultaneously p50 and p90 — tiny group — emits both
        // rows, exactly like the oracle's UNION ALL). The previous
        // two-branch union re-executed the per-group sort window once
        // per quantile.
        val ranked = ev
          .withColumn("rn", row_number().over(wOrd).cast(LongType))
          .withColumn("n", count(lit(1)).over(wAll))
        val c50 = ceil(col("n") * 0.5).cast(LongType)
        val c90 = ceil(col("n") * 0.9).cast(LongType)
        ranked
          .filter(col("rn") === c50 || col("rn") === c90)
          .withColumn("q", explode(concat(
            when(col("rn") === c50, array(lit("p50")))
              .otherwise(array().cast("array<string>")),
            when(col("rn") === c90, array(lit("p90")))
              .otherwise(array().cast("array<string>")))))
          .select(col("event_type"), col("q"),
            col("value").as("quantile_value"))
          .orderBy("event_type", "q")
      },
      Some("""WITH ranked AS (
          SELECT event_type, value,
            row_number() OVER (PARTITION BY event_type
              ORDER BY value, event_id) AS rn,
            count(*) OVER (PARTITION BY event_type) AS n
          FROM events)
        SELECT event_type, 'p50' AS q, value AS quantile_value
          FROM ranked WHERE rn = CAST(ceil(n * 0.5) AS BIGINT)
        UNION ALL
        SELECT event_type, 'p90' AS q, value AS quantile_value
          FROM ranked WHERE rn = CAST(ceil(n * 0.9) AS BIGINT)
        ORDER BY event_type, q""")),

    // Distribution-rank window family: percent_rank, cume_dist and
    // ntile(4) per event_type. The ordering key includes event_id so
    // every rank is tie-free and both engines' standard definitions
    // ((rank−1)/(n−1), rank/n, balanced buckets) agree bit-exactly —
    // the divisions are single exactly-rounded double ops. One shuffle
    // on event_type; all three functions share the same sort.
    Q("q88_rank_functions",
      (s, dir) => {
        val w = Window.partitionBy("event_type")
          .orderBy(col("value"), col("event_id"))
        Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"),
            ntile(4).over(w).cast(LongType).as("quartile"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, event_type, value,
          percent_rank() OVER w AS pr,
          cume_dist() OVER w AS cd,
          CAST(ntile(4) OVER w AS BIGINT) AS quartile
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        ORDER BY event_id""")),

    // Rolling time-RANGE window: per event, the count and exact sum of
    // the SAME TYPE's events in the trailing hour — a RANGE frame over
    // floor-second event time (peers at the same second share a frame
    // on both engines), partitioned on event_type so the sort never
    // goes global. The decimal window sum is associative, so the
    // sliding accumulation is bit-exact however the engine slides it.
    Q("q108_rolling_range_window",
      (s, dir) => {
        val w = Window.partitionBy("event_type").orderBy(col("ts_s"))
          .rangeBetween(-3600L, 0L)
        Tables.load(s, dir, "events")
          .withColumn("ts_s", col("ts").cast(LongType))
          .select(col("event_id"), col("event_type"), col("ts"),
            count(lit(1)).over(w).as("n_1h"),
            sum(col("value").cast(DecimalType(28, 2))).over(w)
              .cast(DoubleType).as("sum_1h"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, event_type, ts,
          CAST(count(*) OVER w AS BIGINT) AS n_1h,
          CAST(sum(CAST(value AS DECIMAL(28,2))) OVER w AS DOUBLE)
            AS sum_1h
        FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
          FROM events)
        WINDOW w AS (PARTITION BY event_type ORDER BY ts_s
          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        ORDER BY event_id""")),

    // Top-k per group via the BOUNDED-STATE aggregate
    // (expressions/TopKAggregate): state never exceeds 4k entries and
    // partial-aggregates map-side — at 100 TB this replaces both the
    // window row_number (sorts every row of every group to keep 3) and
    // collect_list+slice (buffers whole groups). Truncation commutes
    // with merge, so the result is deterministic under any
    // partitioning — the oracle IS the window formulation.
    Q("q109_topk_bounded_agg",
      (s, dir) => {
        Tables.load(s, dir, "events")
          .groupBy("event_type")
          .agg(TopKAggregate.topK(col("value"), col("event_id"), 3)
            .as("top"))
          .select(col("event_type"), posexplode(col("top")).as(Seq("p", "t")))
          .select(col("event_type"), (col("p") + 1).cast(LongType).as("rank"),
            col("t._1").as("value"), col("t._2").as("event_id"))
          .orderBy("event_type", "rank")
      },
      Some("""SELECT event_type, rank, value, event_id FROM (
          SELECT event_type, value, event_id,
            CAST(row_number() OVER (PARTITION BY event_type
              ORDER BY value DESC, event_id DESC) AS BIGINT) AS rank
          FROM events)
        WHERE rank <= 3 ORDER BY event_type, rank""")),

    // Binned approximate quantiles — the SCALE path beside q52's exact
    // ranks: at 100 TB an exact per-group sort window is the wrong
    // tool; fixed-width bins reduce the fact table with ONE map-side-
    // combinable hash aggregate, and everything after runs on the
    // |bins-per-group| table (cumulative window, target ranks, linear
    // interpolation inside the hit bin). Every arithmetic step is
    // integer or a mirrored fixed double-op sequence, so the
    // approximation itself is oracle-exact. Single pass over the bin
    // table for both quantiles (the q52 lesson applied from the
    // start: a bin hit by both targets explodes into both rows).
    Q("q145_binned_quantiles",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val binned = ev.groupBy(col("event_type"),
            floor(col("value") / 5.0).cast(LongType).as("bin"))
          .agg(count(lit(1)).as("cnt"))
        val wOrd = Window.partitionBy("event_type").orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy("event_type")
        val cum = binned
          .withColumn("cum", sum(col("cnt")).over(wOrd))
          .withColumn("n", sum(col("cnt")).over(wAll))
          .withColumn("t50", ceil(col("n") * 0.5).cast(LongType))
          .withColumn("t90", ceil(col("n") * 0.9).cast(LongType))
        val hit50 = col("cum") >= col("t50") &&
          col("cum") - col("cnt") < col("t50")
        val hit90 = col("cum") >= col("t90") &&
          col("cum") - col("cnt") < col("t90")
        val emptyHits =
          array().cast("array<struct<q:string,target:bigint>>")
        cum.filter(hit50 || hit90)
          .withColumn("hit", explode(concat(
            when(hit50, array(struct(lit("p50").as("q"),
              col("t50").as("target")))).otherwise(emptyHits),
            when(hit90, array(struct(lit("p90").as("q"),
              col("t90").as("target")))).otherwise(emptyHits))))
          .select(col("event_type"), col("hit.q").as("q"),
            ((col("bin") * 5).cast("double") +
              lit(5.0) *
                (col("hit.target") - (col("cum") - col("cnt")))
                  .cast("double") / col("cnt").cast("double"))
              .as("approx_value"))
          .orderBy("event_type", "q")
      },
      Some("""WITH b AS (SELECT event_type,
            CAST(floor(value / 5.0) AS BIGINT) AS bin, count(*) AS cnt
          FROM events GROUP BY 1, 2),
        c AS (SELECT event_type, bin, cnt,
            CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
            CAST(sum(cnt) OVER (PARTITION BY event_type)
              AS BIGINT) AS n
          FROM b),
        t AS (SELECT *, CAST(ceil(n * 0.5) AS BIGINT) AS t50,
            CAST(ceil(n * 0.9) AS BIGINT) AS t90 FROM c)
        SELECT event_type, q,
          CAST(bin * 5 AS DOUBLE) +
            5.0 * CAST(target - (cum - cnt) AS DOUBLE)
              / CAST(cnt AS DOUBLE) AS approx_value
        FROM (
          SELECT event_type, 'p50' AS q, t50 AS target, bin, cnt, cum
            FROM t WHERE cum >= t50 AND cum - cnt < t50
          UNION ALL
          SELECT event_type, 'p90', t90, bin, cnt, cum
            FROM t WHERE cum >= t90 AND cum - cnt < t90)
        ORDER BY event_type, q""")),

    // Sequential motif mining — frequent event-type TRIGRAMS in
    // per-user chronological order (the behavioral-sequence step past
    // q129's transition bigrams): support = #users whose stream
    // contains the motif at least once. Two lead windows on one user
    // partitioning (ties broken by event_id so the sequence is
    // deterministic), a distinct per (user, motif), one count — no
    // joins, no sequence materialized wider than 3.
    Q("q244_sequence_motifs",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        val tri = Tables.load(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("e2", lead(col("event_type"), 1).over(w))
          .withColumn("e3", lead(col("event_type"), 2).over(w))
          .filter(col("e3").isNotNull)
          .select(col("user_id"),
            concat_ws(">", col("event_type"), col("e2"), col("e3"))
              .as("motif"))
          .distinct()
        tri.groupBy("motif")
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= 10)
          .orderBy("motif")
      },
      Some("""WITH seq AS (SELECT user_id, event_type,
            lead(event_type, 1) OVER w AS e2,
            lead(event_type, 2) OVER w AS e3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        m AS (SELECT DISTINCT user_id,
            event_type || '>' || e2 || '>' || e3 AS motif
          FROM seq WHERE e3 IS NOT NULL)
        SELECT motif, CAST(count(*) AS BIGINT) AS support
        FROM m GROUP BY 1 HAVING count(*) >= 10
        ORDER BY motif"""))
  )
}
