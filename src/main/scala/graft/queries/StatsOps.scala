package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Tables
import graft.expressions.TopKAggregate

/** Statistical / linkage operators, round 6: blocked fuzzy record
  * linkage, KMV distinct-count sketching, deterministic stratified
  * sampling, exact truncated EWMA, percentile winsorization, and a
  * window-based 2-D skyline. All oracle-checked.
  *
  * Reference motivation: the crawler normalizes vendor entity names
  * before joining (MaStR unit names, `mastr.py`-family cleaning), and
  * its Grafana layer needs distribution summaries per series; the
  * LLM-pipeline side needs sampling and per-source distinct counts at
  * corpus scale, where exact distincts are a full shuffle but a KMV
  * sketch is a bounded-state aggregate.
  */
object StatsOps {

  /** Odd multiplier → the map user_id → (user_id * A) mod 2^32 is a
    * bijection below 2^32, so hash distinctness equals key
    * distinctness and every query stays oracle-exact (the arithmetic
    * is plain BIGINT ops both engines evaluate identically). */
  private val KnuthA = 2654435761L
  private val SampleA = 2246822519L
  private val M32 = 4294967296L

  val qs: Seq[Q] = Seq(

    // Blocked fuzzy join (record linkage): candidate entity pairs
    // whose names agree on a cheap blocking key (last word) and sit
    // within Levenshtein distance 3. The blocking key turns the N²
    // all-pairs distance scan into an equi-join — Σ block² candidate
    // pairs, the same shape as the LSH band join — and the distance
    // runs as a codegen'd built-in inside the join condition, only on
    // bucket-mates. Linkage runs on the DISTINCT name table (entity
    // vocabulary), never the fact table.
    // Width cap (mirrored in the oracle): a degenerate blocking key —
    // e.g. the regex not matching, so every entity lands in the ""
    // block — silently reverts the equi-join to N². Blocks wider than
    // the cap are EXCLUDED, the same audited-skip contract as the LSH
    // bucket caps (Dedup.scala): at linkage scale an over-wide block
    // means the key failed, and the honest move is to skip it loudly,
    // not to quadratically grind through it.
    Q("q113_fuzzy_block_join",
      (s, dir) => {
        val cap = 1000
        val names = Tables.load(s, dir, "part")
          .select(col("p_name").as("name")).distinct()
          .withColumn("block", regexp_extract(col("name"), "[a-z]+$", 0))
        val okBlocks = names.groupBy("block")
          .agg(count(lit(1)).as("bn")).filter(col("bn") <= cap)
          .select("block")
        val capped = names.join(broadcast(okBlocks), Seq("block"), "left_semi")
        capped.as("a").join(capped.as("b"),
            col("a.block") === col("b.block") &&
              col("a.name") < col("b.name") &&
              levenshtein(col("a.name"), col("b.name")) <= 3)
          .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
            levenshtein(col("a.name"), col("b.name")).cast(LongType)
              .as("dist"))
          .orderBy("name_a", "name_b")
      },
      Some("""WITH names AS (
          SELECT DISTINCT p_name AS name,
            regexp_extract(p_name, '[a-z]+$') AS block FROM part),
        ok AS (SELECT block FROM names GROUP BY 1 HAVING count(*) <= 1000),
        capped AS (SELECT name, block FROM names
          WHERE block IN (SELECT block FROM ok))
        SELECT a.name AS name_a, b.name AS name_b,
          CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        FROM capped a JOIN capped b
          ON a.block = b.block AND a.name < b.name
        WHERE levenshtein(a.name, b.name) <= 3
        ORDER BY name_a, name_b""")),

    // KMV (k minimum values) distinct-count sketch per event type:
    // keep the k=8 smallest hashes of the key; the k-th smallest
    // estimates the distinct count as (k-1)·2^32 / h_k. The sketch
    // state is k values per group — mergeable, map-side partial — vs
    // an exact COUNT(DISTINCT)'s full key shuffle; at 100 TB the
    // sketch answers per-source cardinality questions in one narrow
    // pass. The estimate itself is oracle-checked (identical integer
    // hash + one double division on identical operands), alongside
    // the exact count it approximates.
    Q("q114_kmv_distinct",
      (s, dir) => {
        val k = 8
        val hashed = Tables.load(s, dir, "events")
          .select(col("event_type"),
            ((col("user_id") * KnuthA) % M32).as("h"))
          .distinct()
        hashed.groupBy("event_type")
          .agg(count(lit(1)).as("exact_distinct"),
            TopKAggregate.bottomK(col("h").cast("double"), col("h"), k)
              .as("mins"))
          // Mirror the oracle's `WHERE rn = 8`: a group with fewer than
          // k distinct hashes has no k-th min and must be omitted, not
          // emitted with NULL sketch columns.
          .filter(size(col("mins")) === k)
          .select(col("event_type"), col("exact_distinct"),
            element_at(col("mins"), k).getField("_2").as("kth_hash"),
            (lit((k - 1) * M32).cast("double") /
              element_at(col("mins"), k).getField("_2").cast("double"))
              .as("est_distinct"))
          .orderBy("event_type")
      },
      Some(s"""WITH h AS (
          SELECT DISTINCT event_type,
            (user_id * $KnuthA) % $M32 AS h FROM events),
        r AS (SELECT event_type, h,
            row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
            count(*) OVER (PARTITION BY event_type) AS n
          FROM h)
        SELECT event_type, n AS exact_distinct, h AS kth_hash,
          CAST(${7 * M32} AS DOUBLE) / CAST(h AS DOUBLE) AS est_distinct
        FROM r WHERE rn = 8 ORDER BY event_type""")),

    // Deterministic stratified sampling: up to 3 documents per
    // (lang, source) stratum, chosen by smallest multiplicative hash
    // of doc_id — a fixed-size per-stratum sample that is reproducible
    // across runs and engines (the property a training-mix sampler
    // needs). Runs as ONE bounded-state hash aggregate (TopKAggregate,
    // state ≤ 3 per stratum) — no per-stratum sort, no window over the
    // corpus; strata smaller than the quota yield what they have.
    Q("q115_stratified_sample",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(col("lang"), col("source"), col("doc_id"),
            ((col("doc_id") * SampleA) % M32).as("h"))
          .groupBy("lang", "source")
          .agg(TopKAggregate.bottomK(col("h").cast("double"),
            col("doc_id"), 3).as("picks"))
          .select(col("lang"), col("source"),
            posexplode(col("picks")).as(Seq("p", "t")))
          .select(col("lang"), col("source"),
            (col("p") + 1).cast(LongType).as("rank"),
            col("t._2").as("doc_id"))
          .orderBy("lang", "source", "rank")
      },
      Some(s"""SELECT lang, source, rank, doc_id FROM (
          SELECT lang, source, doc_id,
            CAST(row_number() OVER (PARTITION BY lang, source
              ORDER BY (doc_id * $SampleA) % $M32) AS BIGINT) AS rank
          FROM documents)
        WHERE rank <= 3 ORDER BY lang, source, rank""")),

    // Truncated EWMA (α=1/2, window 16) per user over event values in
    // integer cents: num = Σ_j cents_{t-j}·2^(15-j), den = Σ_j 2^(15-j)
    // — exact BIGINT accumulation, so the smoothed value
    // num/den/100 is ONE double division on identical operands in both
    // engines. The untruncated recursive EWMA needs either a serial
    // scan or float pow() chains (order-dependent, unverifiable);
    // truncating at 16 taps bounds the error at 2^-16 of the oldest
    // weight AND makes the whole thing a partition-local window of 16
    // lags — no self-join, no state beyond the frame.
    Q("q116_ewma",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val withC = Tables.load(s, dir, "events")
          .withColumn("cents",
            floor(col("value") * 100d + 0.5d).cast(LongType))
          .withColumn("rn", row_number().over(w))
        val num = (0 until 16).map { j =>
          val wt = 1L << (15 - j)
          val v = if (j == 0) col("cents") else lag(col("cents"), j).over(w)
          when(col("rn") > j, v * wt).otherwise(0L)
        }.reduce(_ + _)
        val den = (0 until 16).map { j =>
          when(col("rn") > j, lit(1L << (15 - j))).otherwise(0L)
        }.reduce(_ + _)
        withC.withColumn("num", num).withColumn("den", den)
          .select(col("event_id"), col("user_id"),
            col("num"), col("den"),
            (col("num").cast("double") / col("den").cast("double") /
              lit(100).cast("double")).as("ewma"))
          .orderBy("event_id")
      },
      Some {
        val terms = (0 until 16).map { j =>
          val wt = 1L << (15 - j)
          val v = if (j == 0) "cents" else s"lag(cents, $j) OVER w"
          s"CASE WHEN rn > $j THEN $v * $wt ELSE 0 END"
        }.mkString(" + ")
        val dens = (0 until 16).map { j =>
          s"CASE WHEN rn > $j THEN ${1L << (15 - j)} ELSE 0 END"
        }.mkString(" + ")
        s"""WITH c AS (
            SELECT event_id, user_id, ts,
              CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
              row_number() OVER w AS rn
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          e AS (
            SELECT event_id, user_id,
              $terms AS num, CAST($dens AS BIGINT) AS den
            FROM c
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          SELECT event_id, user_id, num, den,
            CAST(num AS DOUBLE) / CAST(den AS DOUBLE) /
              CAST(100 AS DOUBLE) AS ewma
          FROM e ORDER BY event_id"""
      }),

    // Winsorization: clamp each value to its group's [p5, p95]. The
    // percentile ranks are pure INTEGER arithmetic (ceil(n/20) =
    // (n+19) div 20), so the bounds are exact order statistics — no
    // float quantile interpolation to disagree on — and the clamped
    // output reuses the input doubles verbatim. Two shuffles: the
    // rank window and the (tiny) bounds join back to the facts.
    Q("q117_winsorize",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val wOrd = Window.partitionBy("event_type")
          .orderBy("value", "event_id")
        val wAll = Window.partitionBy("event_type")
        val ranked = ev
          .withColumn("rn", row_number().over(wOrd).cast(LongType))
          .withColumn("n", count(lit(1)).over(wAll))
        val bounds = ranked
          .filter(col("rn") === expr("(n + 19) div 20") ||
            col("rn") === expr("(n * 19 + 19) div 20"))
          .groupBy("event_type")
          .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
        ev.join(bounds, Seq("event_type"))
          .select(col("event_id"), col("event_type"), col("value"),
            col("lo"), col("hi"),
            greatest(col("lo"), least(col("value"), col("hi")))
              .as("clamped"))
          .orderBy("event_id")
      },
      Some("""WITH ranked AS (
          SELECT event_type, value, event_id,
            CAST(row_number() OVER (PARTITION BY event_type
              ORDER BY value, event_id) AS BIGINT) AS rn,
            count(*) OVER (PARTITION BY event_type) AS n
          FROM events),
        bounds AS (
          SELECT event_type, min(value) AS lo, max(value) AS hi
          FROM ranked
          WHERE rn = (n + 19) // 20 OR rn = (n * 19 + 19) // 20
          GROUP BY event_type)
        SELECT event_id, e.event_type, value, lo, hi,
          greatest(lo, least(value, hi)) AS clamped
        FROM events e JOIN bounds b ON e.event_type = b.event_type
        ORDER BY event_id""")),

    // 2-D skyline (Pareto frontier) of (quantity, price): points not
    // dominated in BOTH dimensions. One hash aggregate collapses the
    // fact table to max(price) per quantity, then a prefix-max over
    // quantity descending marks the frontier — O(n) + a scan of the
    // reduced table, vs the textbook quadratic NOT EXISTS self-join
    // (which is the oracle). The prefix scan runs over the PER-KEY
    // AGGREGATE (|distinct x| rows); for a continuous x, bucket
    // first — the frontier of bucket maxima contains the true one.
    Q("q118_skyline",
      (s, dir) => {
        val g = Tables.load(s, dir, "lineitem")
          .groupBy(col("l_quantity").as("x"))
          .agg(max(col("l_extendedprice")).as("y"))
        val wPrev = Window.orderBy(col("x").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        g.withColumn("m", max(col("y")).over(wPrev))
          .filter(col("m").isNull || col("y") > col("m"))
          .select(col("x"), col("y"))
          .orderBy("x")
      },
      Some("""WITH g AS (
          SELECT l_quantity AS x, max(l_extendedprice) AS y
          FROM lineitem GROUP BY 1)
        SELECT x, y FROM g a
        WHERE NOT EXISTS (SELECT 1 FROM g b
          WHERE b.x >= a.x AND b.y >= a.y AND (b.x > a.x OR b.y > a.y))
        ORDER BY x""")),

    // Mode (most frequent value) per group as TWO hash aggregates:
    // count per (key, value), then a struct-max arg-max per key —
    // both map-side-partial, no window over the counts and no sort.
    // Tie-break is deterministic (higher count, then lexicographically
    // larger value — struct comparison order), mirrored in the
    // oracle's ORDER BY ... DESC rank.
    Q("q119_mode_per_group",
      (s, dir) => {
        Tables.load(s, dir, "events")
          .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
          .groupBy("user_id")
          .agg(max(struct(col("cnt"), col("event_type"))).as("m"))
          .select(col("user_id"), col("m.event_type").as("mode_type"),
            col("m.cnt").as("cnt"))
          .orderBy("user_id")
      },
      Some("""WITH c AS (SELECT user_id, event_type, count(*) AS cnt
          FROM events GROUP BY 1, 2),
        r AS (SELECT user_id, event_type, cnt,
            row_number() OVER (PARTITION BY user_id
              ORDER BY cnt DESC, event_type DESC) AS rn
          FROM c)
        SELECT user_id, event_type AS mode_type, cnt FROM r
        WHERE rn = 1 ORDER BY user_id""")),

    // Ordered string aggregation (DuckDB string_agg ... ORDER BY /
    // Postgres string_agg): the line numbers of an order concatenated
    // in line order. collect_list is order-nondeterministic under
    // partitioning, so the deterministic form sorts INSIDE the
    // aggregate state (array_sort over (linenumber, partkey) structs)
    // — group state is bounded by lines-per-order, and the aggregate
    // stays map-side-partial; no window, no global sort before the
    // group.
    Q("q120_ordered_string_agg",
      (s, dir) => {
        Tables.load(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_lines"),
            array_join(
              transform(
                array_sort(collect_list(
                  struct(col("l_linenumber"), col("l_partkey")))),
                x => x.getField("l_partkey").cast("string")),
              ",").as("parts"))
          .orderBy("l_orderkey")
      },
      Some("""SELECT l_orderkey, count(*) AS n_lines,
          string_agg(CAST(l_partkey AS VARCHAR), ','
            ORDER BY l_linenumber, l_partkey) AS parts
        FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // KMV sketch ALGEBRA: union and intersection cardinality estimates
    // between per-group sketches, without touching the raw keys again.
    // The k-min sketch of A ∪ B is the k smallest of the two sketches'
    // union (computed with array ops on the 8-element sketches), and
    // |A ∩ B| ≈ ρ·|A ∪ B|-est where ρ = fraction of the union sketch
    // present in both sides — the standard KMV inclusion-exclusion.
    // At 100 TB this answers every pairwise source-overlap question
    // from one tiny sketch table (|groups|·k longs) instead of
    // |pairs| self-joins of the fact table; the exact intersection
    // rides along to show what the estimate approximates. Everything
    // is integer hashes + one double division → oracle-exact.
    Q("q123_kmv_intersect",
      (s, dir) => {
        val k = 8
        val h = Tables.load(s, dir, "events")
          .select(col("event_type"),
            ((col("user_id") * KnuthA) % M32).as("h"))
          .distinct()
        val sk = h.groupBy("event_type")
          .agg(transform(
            TopKAggregate.bottomK(col("h").cast("double"), col("h"), k),
            x => x.getField("_2")).as("sk"))
        val pairs = sk.select(col("event_type").as("type_a"),
            col("sk").as("ska"))
          .join(sk.select(col("event_type").as("type_b"),
            col("sk").as("skb")),
            col("type_a") < col("type_b"))
          .withColumn("merged",
            slice(array_sort(array_union(col("ska"), col("skb"))), 1, k))
          .withColumn("hk", element_at(col("merged"), k))
          .withColumn("in_both",
            size(filter(col("merged"), x =>
              array_contains(col("ska"), x) &&
                array_contains(col("skb"), x))).cast(LongType))
        val e = Tables.load(s, dir, "events")
          .select(col("event_type"), col("user_id")).distinct()
        val exact = e.select(col("event_type").as("type_a"),
            col("user_id"))
          .join(e.select(col("event_type").as("type_b"), col("user_id")),
            Seq("user_id"))
          .filter(col("type_a") < col("type_b"))
          .groupBy("type_a", "type_b")
          .agg(count(lit(1)).as("exact_intersect"))
        pairs.join(exact, Seq("type_a", "type_b"), "left")
          .select(col("type_a"), col("type_b"),
            coalesce(col("exact_intersect"), lit(0L))
              .as("exact_intersect"),
            col("in_both"), col("hk"),
            (lit((k - 1) * M32).cast("double") /
              col("hk").cast("double")).as("est_union"),
            ((col("in_both") * lit((k - 1) * M32)).cast("double") /
              (lit(k.toLong) * col("hk")).cast("double"))
              .as("est_intersect"))
          .orderBy("type_a", "type_b")
      },
      Some(s"""WITH h AS (SELECT DISTINCT event_type,
            (user_id * $KnuthA) % $M32 AS h FROM events),
        r AS (SELECT event_type, h, row_number() OVER (
            PARTITION BY event_type ORDER BY h) AS rn FROM h),
        sk AS (SELECT event_type, h FROM r WHERE rn <= 8),
        pairs AS (SELECT DISTINCT a.event_type AS ta, b.event_type AS tb
          FROM sk a, sk b WHERE a.event_type < b.event_type),
        u AS (SELECT p.ta, p.tb, s.h,
            max(CASE WHEN s.event_type = p.ta THEN 1 ELSE 0 END) AS ina,
            max(CASE WHEN s.event_type = p.tb THEN 1 ELSE 0 END) AS inb
          FROM pairs p JOIN sk s ON s.event_type IN (p.ta, p.tb)
          GROUP BY p.ta, p.tb, s.h),
        ru AS (SELECT ta, tb, h, ina, inb, row_number() OVER (
            PARTITION BY ta, tb ORDER BY h) AS rn FROM u),
        m AS (SELECT ta, tb,
            max(CASE WHEN rn = 8 THEN h END) AS hk,
            CAST(sum(CASE WHEN rn <= 8 AND ina = 1 AND inb = 1
              THEN 1 ELSE 0 END) AS BIGINT) AS in_both
          FROM ru GROUP BY ta, tb),
        e AS (SELECT DISTINCT event_type, user_id FROM events),
        exact AS (SELECT x.event_type AS ta, y.event_type AS tb,
            count(*) AS exact_intersect
          FROM e x JOIN e y ON x.user_id = y.user_id
            AND x.event_type < y.event_type
          GROUP BY 1, 2)
        SELECT m.ta AS type_a, m.tb AS type_b,
          COALESCE(exact_intersect, 0) AS exact_intersect, in_both, hk,
          CAST(${7 * M32} AS DOUBLE) / CAST(hk AS DOUBLE) AS est_union,
          CAST(in_both * ${7 * M32} AS DOUBLE) /
            CAST(8 * hk AS DOUBLE) AS est_intersect
        FROM m LEFT JOIN exact ON m.ta = exact.ta AND m.tb = exact.tb
        ORDER BY type_a, type_b""")),

    // Referential-integrity audit across the star schema: orphan
    // foreign keys per relationship, as LEFT ANTI joins aggregated to
    // one violation count per edge. The ingest framework's PK/FK
    // declarations make this the standing data-quality gate after
    // every append; each edge is one join keyed on the FK (dimension
    // side broadcasts when small), so the audit is a single pass per
    // edge at any scale.
    Q("q125_ref_integrity",
      (s, dir) => {
        def orphans(fact: String, fk: String, dim: String, pk: String) = {
          val f = Tables.load(s, dir, fact)
          val d = Tables.load(s, dir, dim)
          f.join(d, f(fk) === d(pk), "left_anti")
            .agg(count(lit(1)).as("orphans"))
            .select(lit(s"$fact.$fk -> $dim.$pk").as("edge"),
              col("orphans"))
        }
        orphans("lineitem", "l_orderkey", "orders", "o_orderkey")
          .unionByName(orphans("lineitem", "l_partkey", "part",
            "p_partkey"))
          .unionByName(orphans("lineitem", "l_suppkey", "supplier",
            "s_suppkey"))
          .unionByName(orphans("orders", "o_custkey", "customer",
            "c_custkey"))
          .unionByName(orphans("customer", "c_nationkey", "nation",
            "n_nationkey"))
          .orderBy("edge")
      },
      Some("""SELECT 'lineitem.l_orderkey -> orders.o_orderkey' AS edge,
          count(*) AS orphans FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
            WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'lineitem.l_partkey -> part.p_partkey', count(*)
          FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM part p
            WHERE p.p_partkey = l.l_partkey)
        UNION ALL
        SELECT 'lineitem.l_suppkey -> supplier.s_suppkey', count(*)
          FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM supplier su
            WHERE su.s_suppkey = l.l_suppkey)
        UNION ALL
        SELECT 'orders.o_custkey -> customer.c_custkey', count(*)
          FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c
            WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'customer.c_nationkey -> nation.n_nationkey', count(*)
          FROM customer c WHERE NOT EXISTS (SELECT 1 FROM nation n
            WHERE n.n_nationkey = c.c_nationkey)
        ORDER BY edge""")),

    // Time-weighted average per (user, day) — the correct mean for
    // IRREGULARLY sampled series (the energy-meter case: a reading
    // holds until the next one). Each reading is weighted by its
    // holding duration in ms; numerator and denominator accumulate in
    // exact BIGINT (cents × ms), the average is one double division.
    // One window (lead) + one hash aggregate, both on the same
    // (user, day)-compatible partitioning; the day's last reading has
    // no duration and drops out, single-reading days drop entirely —
    // identical rule in the oracle.
    Q("q126_time_weighted_avg",
      (s, dir) => {
        // window and aggregate key off the SAME day expression so the
        // lead-window's hash exchange is reused by the groupBy (one
        // shuffle, not two — Explain-audited)
        val w = Window.partitionBy(col("user_id"), col("day"))
          .orderBy("ts", "event_id")
        Tables.load(s, dir, "events")
          .select(col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"),
            col("ts"), col("event_id"),
            floor(col("value") * 100d + 0.5d).cast(LongType).as("cents"))
          .withColumn("dur_ms",
            unix_millis(lead(col("ts"), 1).over(w)) -
              unix_millis(col("ts")))
          .filter(col("dur_ms").isNotNull)
          .groupBy("user_id", "day")
          .agg(sum(col("cents") * col("dur_ms")).as("wsum"),
            sum(col("dur_ms")).as("dsum"))
          .select(col("user_id"), col("day"), col("wsum"), col("dsum"),
            (col("wsum").cast("double") / col("dsum").cast("double") /
              lit(100).cast("double")).as("twa"))
          .orderBy("user_id", "day")
      },
      Some("""WITH c AS (
          SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, ts, event_id,
            CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events),
        d AS (
          SELECT user_id, day, cents,
            epoch_ms(lead(ts, 1) OVER (PARTITION BY user_id, day
              ORDER BY ts, event_id)) - epoch_ms(ts) AS dur_ms
          FROM c)
        SELECT user_id, day,
          CAST(sum(cents * dur_ms) AS BIGINT) AS wsum,
          CAST(sum(dur_ms) AS BIGINT) AS dsum,
          CAST(sum(cents * dur_ms) AS DOUBLE) /
            CAST(sum(dur_ms) AS DOUBLE) / CAST(100 AS DOUBLE) AS twa
        FROM d WHERE dur_ms IS NOT NULL
        GROUP BY user_id, day ORDER BY user_id, day""")),

    // Interpolated quantiles (PERCENTILE_CONT semantics) at p25/p50/
    // p75 — the continuous complement of q52's exact order statistics.
    // Deterministic across engines because the quantile fractions are
    // BINARY fractions: rank r = (n−1)·q is an exact double, so
    // floor/ceil/frac are exact, and lo + (hi−lo)·frac is the same
    // three IEEE ops on identical operands in both engines (this is
    // why the operator pins binary-fraction quantiles; an arbitrary q
    // would reintroduce float divergence). One rank window + one hash
    // aggregate, both on the group key.
    Q("q128_quantile_interp",
      (s, dir) => {
        val wOrd = Window.partitionBy("event_type")
          .orderBy("value", "event_id")
        val wAll = Window.partitionBy("event_type")
        var ranked = Tables.load(s, dir, "events")
          .withColumn("rn", row_number().over(wOrd).cast(LongType))
          .withColumn("n", count(lit(1)).over(wAll))
        val qs = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75")
        for ((q, label) <- qs) {
          val r = (col("n") - 1L).cast("double") * lit(q)
          ranked = ranked
            .withColumn(s"lo_$label",
              when(col("rn") === floor(r).cast(LongType) + 1L,
                col("value")))
            .withColumn(s"hi_$label",
              when(col("rn") === ceil(r).cast(LongType) + 1L,
                col("value")))
            .withColumn(s"fr_$label", r - floor(r))
        }
        val aggs = qs.flatMap { case (_, l) =>
          Seq(max(col(s"lo_$l")).as(s"lo_$l"),
            max(col(s"hi_$l")).as(s"hi_$l"),
            max(col(s"fr_$l")).as(s"fr_$l"))
        }
        val g = ranked.groupBy("event_type").agg(aggs.head, aggs.tail: _*)
        val out = qs.map { case (_, l) =>
          g.select(col("event_type"), lit(l).as("q"),
            (col(s"lo_$l") + (col(s"hi_$l") - col(s"lo_$l")) *
              col(s"fr_$l")).as("quantile_value"))
        }.reduce(_ unionByName _)
        out.orderBy("event_type", "q")
      },
      Some("""WITH ranked AS (
          SELECT event_type, value,
            CAST(row_number() OVER (PARTITION BY event_type
              ORDER BY value, event_id) AS BIGINT) AS rn,
            count(*) OVER (PARTITION BY event_type) AS n
          FROM events),
        g AS (
          SELECT event_type,
            max(CASE WHEN rn = CAST(floor((n - 1) * 0.25) AS BIGINT) + 1
              THEN value END) AS lo_p25,
            max(CASE WHEN rn = CAST(ceil((n - 1) * 0.25) AS BIGINT) + 1
              THEN value END) AS hi_p25,
            max(CAST(n - 1 AS DOUBLE) * 0.25
              - floor(CAST(n - 1 AS DOUBLE) * 0.25)) AS fr_p25,
            max(CASE WHEN rn = CAST(floor((n - 1) * 0.5) AS BIGINT) + 1
              THEN value END) AS lo_p50,
            max(CASE WHEN rn = CAST(ceil((n - 1) * 0.5) AS BIGINT) + 1
              THEN value END) AS hi_p50,
            max(CAST(n - 1 AS DOUBLE) * 0.5
              - floor(CAST(n - 1 AS DOUBLE) * 0.5)) AS fr_p50,
            max(CASE WHEN rn = CAST(floor((n - 1) * 0.75) AS BIGINT) + 1
              THEN value END) AS lo_p75,
            max(CASE WHEN rn = CAST(ceil((n - 1) * 0.75) AS BIGINT) + 1
              THEN value END) AS hi_p75,
            max(CAST(n - 1 AS DOUBLE) * 0.75
              - floor(CAST(n - 1 AS DOUBLE) * 0.75)) AS fr_p75
          FROM ranked GROUP BY event_type)
        SELECT event_type, 'p25' AS q,
          lo_p25 + (hi_p25 - lo_p25) * fr_p25 AS quantile_value FROM g
        UNION ALL
        SELECT event_type, 'p50',
          lo_p50 + (hi_p50 - lo_p50) * fr_p50 FROM g
        UNION ALL
        SELECT event_type, 'p75',
          lo_p75 + (hi_p75 - lo_p75) * fr_p75 FROM g
        ORDER BY event_type, q""")),

    // First-order transition matrix over per-user event sequences
    // (the behavioral n-gram: what follows what): lag the type within
    // each user's timeline, count (prev, next) pairs, and normalize by
    // the source state's row count — count ratio as ONE double
    // division, so the probabilities are oracle-exact. One
    // partition-local lag window + two hash aggregates; the matrix is
    // |states|², never sequence-length-shaped.
    Q("q129_transition_matrix",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val pairs = Tables.load(s, dir, "events")
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type").as("next_type"))
          .agg(count(lit(1)).as("n"))
        val totals = pairs.groupBy("prev_type")
          .agg(sum(col("n")).as("row_total"))
        pairs.join(totals, "prev_type")
          .select(col("prev_type"), col("next_type"), col("n"),
            col("row_total"),
            (col("n").cast("double") / col("row_total").cast("double"))
              .as("p"))
          .orderBy("prev_type", "next_type")
      },
      Some("""WITH pairs AS (
          SELECT prev_type, event_type AS next_type, count(*) AS n
          FROM (SELECT user_id, event_type, ts,
              lag(event_type, 1) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS prev_type
            FROM events)
          WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        totals AS (SELECT prev_type,
            CAST(sum(n) AS BIGINT) AS row_total
          FROM pairs GROUP BY 1)
        SELECT p.prev_type, next_type, n, row_total,
          CAST(n AS DOUBLE) / CAST(row_total AS DOUBLE) AS p
        FROM pairs p JOIN totals t ON p.prev_type = t.prev_type
        ORDER BY p.prev_type, next_type""")),

    // Merit-order curve — THE energy-market query (the reference's
    // domain: reference dashboards rank supply by price and read the
    // marginal price at demand). Per zone: order bids by price,
    // cumulate capacity in DECIMAL (exact, associative), and pick the
    // first bid whose cumulative capacity covers 30 % of the zone's
    // total — the crossing test is integer-scaled decimal
    // (10·cum ≥ 3·total), so no float demand threshold exists
    // anywhere. One broadcast dim join + one per-zone window; the
    // crossing row is a min-struct aggregate (cum is strictly
    // increasing, so min(cum) over qualifying rows IS the crossing),
    // not a second sort.
    Q("q130_merit_order",
      (s, dir) => {
        val dec = org.apache.spark.sql.types.DecimalType(28, 2)
        val sup = Tables.load(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
        val bids = Tables.load(s, dir, "lineitem")
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_nationkey").cast(LongType).as("zone"),
            col("l_extendedprice").as("price"),
            col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast(dec).as("cap"))
        val wCum = Window.partitionBy("zone")
          .orderBy("price", "l_orderkey", "l_linenumber")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // zone totals as a SEPARATE map-side-partial aggregate joined
        // back by broadcast (zones are a dimension-sized set), not an
        // all-rows window: `sum over (partition by zone)` with no frame
        // re-materializes every zone's rows through the window buffer a
        // second time, which at 100 TB doubles the largest zone's
        // reducer footprint for a value that is one number per zone
        val totals = bids.groupBy("zone")
          .agg(sum(col("cap")).as("total"))
        bids
          .withColumn("cum", sum(col("cap")).over(wCum))
          .join(broadcast(totals), "zone")
          .filter(col("cum") * 10 >= col("total") * 3)
          .groupBy("zone")
          .agg(min(struct(col("cum"), col("price"), col("total")))
            .as("m"))
          .select(col("zone"),
            col("m.total").cast("double").as("total_capacity"),
            col("m.price").as("marginal_price"),
            col("m.cum").cast("double").as("cum_at_marginal"))
          .orderBy("zone")
      },
      Some("""WITH bids AS (
          SELECT CAST(s_nationkey AS BIGINT) AS zone,
            l_extendedprice AS price, l_orderkey, l_linenumber,
            CAST(l_quantity AS DECIMAL(28,2)) AS cap
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey),
        c AS (SELECT zone, price,
            sum(cap) OVER (PARTITION BY zone
              ORDER BY price, l_orderkey, l_linenumber
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            sum(cap) OVER (PARTITION BY zone) AS total
          FROM bids),
        q AS (SELECT zone, price, cum, total FROM c
          WHERE cum * 10 >= total * 3),
        m AS (SELECT zone, min(cum) AS mcum FROM q GROUP BY 1)
        SELECT q.zone, CAST(q.total AS DOUBLE) AS total_capacity,
          q.price AS marginal_price,
          CAST(q.cum AS DOUBLE) AS cum_at_marginal
        FROM q JOIN m ON q.zone = m.zone AND q.cum = m.mcum
        ORDER BY q.zone""")),

    // Coincident-peak contribution — the demand-charge query: find THE
    // system peak hour (hourly decimal-exact totals → deterministic
    // argmax, ties broken by earliest hour), then each user's share of
    // load IN that hour. The argmax is a 1-row TakeOrdered that
    // broadcasts into the fact scan (no shuffle to find the peak rows),
    // then one hash aggregate per user; shares are one double division
    // of two decimal-exact sums.
    Q("q131_peak_coincidence",
      (s, dir) => {
        import graft.functions.ExactAgg.dsum
        val ev = Tables.load(s, dir, "events")
          .withColumn("h", date_trunc("hour", col("ts")))
        val peak = ev.groupBy("h").agg(dsum(col("value")).as("sys_total"))
          .orderBy(col("sys_total").desc, col("h")).limit(1)
        ev.join(broadcast(peak), "h")
          .groupBy(col("user_id"), col("h").as("peak_hour"),
            col("sys_total"))
          .agg(dsum(col("value")).as("user_total"))
          .select(col("user_id"), col("peak_hour"), col("user_total"),
            col("sys_total"),
            (col("user_total") / col("sys_total")).as("share"))
          .orderBy("user_id")
      },
      Some(s"""WITH hourly AS (
          SELECT date_trunc('hour', ts) AS h,
            ${graft.functions.ExactAgg.sqlSum("value")} AS sys_total
          FROM events GROUP BY 1),
        peak AS (SELECT h, sys_total FROM hourly
          ORDER BY sys_total DESC, h LIMIT 1)
        SELECT user_id, p.h AS peak_hour,
          ${graft.functions.ExactAgg.sqlSum("e.value")} AS user_total,
          p.sys_total,
          ${graft.functions.ExactAgg.sqlSum("e.value")} / p.sys_total
            AS share
        FROM events e JOIN peak p ON date_trunc('hour', e.ts) = p.h
        GROUP BY user_id, p.h, p.sys_total ORDER BY user_id""")),

    // Same-hour baseline & deviation — the settlement-style "N-of-N
    // baseline": each (user, hour) reading compared against the mean
    // of that user's PREVIOUS up-to-5 readings for the same
    // hour-of-day (the demand-response / anomaly baseline). Hourly
    // cents roll up exactly in BIGINT; the baseline window partitions
    // by the DERIVED key (user, hour-of-day) with a bounded trailing
    // frame — one aggregate shuffle + one window shuffle, state
    // bounded by the frame. Baseline = one double division; rows with
    // under 3 prior observations are excluded (same rule both sides).
    Q("q132_baseline_deviation",
      (s, dir) => {
        val hourly = Tables.load(s, dir, "events")
          .withColumn("cents",
            floor(col("value") * 100d + 0.5d).cast(LongType))
          .groupBy(col("user_id"),
            date_trunc("hour", col("ts")).as("h"))
          .agg(sum(col("cents")).as("c"))
        val w = Window.partitionBy(col("user_id"), hour(col("h")))
          .orderBy("h").rowsBetween(-5, -1)
        hourly
          .withColumn("base_sum", sum(col("c")).over(w))
          .withColumn("base_n", count(col("c")).over(w))
          .filter(col("base_n") >= 3)
          .select(col("user_id"), col("h"), col("c"),
            col("base_sum"), col("base_n"),
            (col("base_sum").cast("double") /
              col("base_n").cast("double")).as("baseline_cents"),
            (col("c").cast("double") -
              col("base_sum").cast("double") /
                col("base_n").cast("double")).as("deviation_cents"))
          .orderBy("user_id", "h")
      },
      Some("""WITH hourly AS (
          SELECT user_id, date_trunc('hour', ts) AS h,
            CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        b AS (
          SELECT user_id, h, c,
            CAST(sum(c) OVER w AS BIGINT) AS base_sum,
            count(c) OVER w AS base_n
          FROM hourly
          WINDOW w AS (PARTITION BY user_id, extract(hour FROM h)
            ORDER BY h ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING))
        SELECT user_id, h, c, base_sum, base_n,
          CAST(base_sum AS DOUBLE) / CAST(base_n AS DOUBLE)
            AS baseline_cents,
          CAST(c AS DOUBLE) - CAST(base_sum AS DOUBLE)
            / CAST(base_n AS DOUBLE) AS deviation_cents
        FROM b WHERE base_n >= 3 ORDER BY user_id, h""")),

    // Per-key least-squares trend (slope + intercept) — degradation /
    // drift estimation per meter, the regression the reference's
    // monitoring dashboards eyeball. The moment sums (Σx, Σy, Σxy,
    // Σx²) accumulate in DECIMAL(38,0) over integer seconds × cents —
    // exact and associative, one hash aggregate, no per-group sort —
    // and slope/intercept are then a fixed sequence of double ops on
    // identical operands. x is re-based to each key's first timestamp
    // (slope is shift-invariant; the intercept is the fitted value AT
    // that first observation, keeping magnitudes small enough that the
    // decimal→double conversions stay in the correctly-rounded range).
    Q("q135_linear_trend",
      (s, dir) => {
        val dec0 = org.apache.spark.sql.types.DecimalType(38, 0)
        val w = Window.partitionBy("user_id")
        val base = Tables.load(s, dir, "events")
          .select(col("user_id"),
            unix_seconds(col("ts")).as("xs"),
            floor(col("value") * 100d + 0.5d).cast(LongType).as("y"))
          .withColumn("x", col("xs") - min(col("xs")).over(w))
        val g = base.groupBy("user_id").agg(
          count(lit(1)).as("n"),
          sum(col("x").cast(dec0)).as("sx"),
          sum(col("y").cast(dec0)).as("sy"),
          sum((col("x") * col("y")).cast(dec0)).as("sxy"),
          sum((col("x") * col("x")).cast(dec0)).as("sxx"))
        val num = (col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double")
        val den = (col("n") * col("sxx") - col("sx") * col("sx"))
          .cast("double")
        g.filter(col("n") >= 2L && den =!= 0d)
          .withColumn("slope", num / den)
          .select(col("user_id"), col("n"), col("slope"),
            ((col("sy").cast("double") -
              col("slope") * col("sx").cast("double")) /
              col("n").cast("double")).as("intercept_cents"))
          .orderBy("user_id")
      },
      Some("""WITH base AS (
          SELECT user_id,
            CAST(floor(epoch(ts)) AS BIGINT)
              - min(CAST(floor(epoch(ts)) AS BIGINT))
                OVER (PARTITION BY user_id) AS x,
            CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
          FROM events),
        g AS (SELECT user_id, count(*) AS n,
            sum(CAST(x AS DECIMAL(38,0))) AS sx,
            sum(CAST(y AS DECIMAL(38,0))) AS sy,
            sum(CAST(x * y AS DECIMAL(38,0))) AS sxy,
            sum(CAST(x * x AS DECIMAL(38,0))) AS sxx
          FROM base GROUP BY 1),
        s AS (SELECT user_id, n,
            CAST(n * sxy - sx * sy AS DOUBLE) AS num,
            CAST(n * sxx - sx * sx AS DOUBLE) AS den,
            CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd
          FROM g)
        SELECT user_id, n, num / den AS slope,
          (syd - (num / den) * sxd) / CAST(n AS DOUBLE)
            AS intercept_cents
        FROM s WHERE n >= 2 AND den <> 0 ORDER BY user_id""")),

    // Iceberg query — groups whose contribution exceeds a SCALE-FREE
    // global threshold: parts earning at least 1.5x the average
    // part's revenue (an absolute share cutoff empties as the group
    // count grows; the average-relative form is the one that stays
    // meaningful at any SF; 1.5x sits at the p99 of the fixture's
    // revenue distribution). Two hash aggregates — per-group
    // decimal-exact sums and a 1-row global (total, group-count) that
    // broadcasts into the filter — and the test is integer-scaled
    // decimal (2·group·count ≥ 3·total), so no float threshold exists.
    // The group aggregate is the only fact-table shuffle.
    Q("q137_iceberg",
      (s, dir) => {
        val dec = org.apache.spark.sql.types.DecimalType(28, 2)
        val li = Tables.load(s, dir, "lineitem")
        val g = li.groupBy("l_partkey")
          .agg(sum(col("l_extendedprice").cast(dec)).as("rev"),
            count(lit(1)).as("n"))
        val tot = g.agg(sum(col("rev")).as("total"),
          count(lit(1)).as("n_groups"))
        g.crossJoin(broadcast(tot))
          .filter(col("rev") * col("n_groups") * 2 >= col("total") * 3)
          .select(col("l_partkey"), col("n"),
            col("rev").cast("double").as("revenue"),
            (col("rev").cast("double") / col("total").cast("double"))
              .as("share"))
          .orderBy("l_partkey")
      },
      Some("""WITH g AS (SELECT l_partkey,
            sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS rev,
            count(*) AS n
          FROM lineitem GROUP BY 1),
        t AS (SELECT CAST(sum(rev) AS DECIMAL(38,2)) AS total,
            count(*) AS n_groups FROM g)
        SELECT l_partkey, n, CAST(rev AS DOUBLE) AS revenue,
          CAST(rev AS DOUBLE) / CAST(total AS DOUBLE) AS share
        FROM g, t WHERE rev * n_groups * 2 >= total * 3
        ORDER BY l_partkey""")),

    // Entity resolution — the full MDM composite from verified parts:
    // q113's blocked fuzzy pairs (WITH its block-width cap — a
    // degenerate blocking key must skip loudly, not grind N²) become
    // edges, ConnectedComponents (q70's O(log² n) large-star/small-
    // star) groups transitively-linked name variants into entities.
    // Node ids are xxhash64(name) — derived map-side with NO global
    // ordering; a 64-bit collision (≈n²/2⁶⁵) would merely merge two
    // CC labels, immaterial at any realistic vocabulary size and
    // absent at fixture scale where the oracle hash proves it. The
    // canonical name is the lexicographic MIN name per component (a
    // map-side-combinable aggregate, not an id lookup), so the output
    // is independent of the id scheme and the oracle can recompute it
    // over names directly with a recursive CTE. Nothing in this plan
    // funnels through one reducer: the r9 form ranked the vocabulary
    // with an unpartitioned row_number window — billions of entity
    // names through a single sort at corpus scale — now retired.
    Q("q147_entity_resolution",
      (s, dir) => {
        val cap = 1000
        val names = Tables.load(s, dir, "part")
          .select(col("p_name").as("name")).distinct()
          .withColumn("block", regexp_extract(col("name"), "[a-z]+$", 0))
          .withColumn("nid", xxhash64(col("name")))
        val okBlocks = names.groupBy("block")
          .agg(count(lit(1)).as("bn")).filter(col("bn") <= cap)
          .select("block")
        val capped = names.join(broadcast(okBlocks), Seq("block"), "left_semi")
        val pairs = capped.as("a").join(capped.as("b"),
            col("a.block") === col("b.block") &&
              col("a.name") < col("b.name") &&
              levenshtein(col("a.name"), col("b.name")) <= 3)
          .select(col("a.nid").as("u"), col("b.nid").as("v"))
        val comp = graft.operators.ConnectedComponents
          .components(pairs, "u", "v",
            nodes = Some(names.select(col("nid"))))
        val labeled = names.join(comp, col("nid") === col("node"))
          .select(col("name"), col("component"))
        val canon = labeled.groupBy("component")
          .agg(min(col("name")).as("canonical_name"),
            count(lit(1)).as("entity_size"))
        labeled.join(canon, Seq("component"))
          .select("name", "canonical_name", "entity_size")
          .orderBy("name")
      },
      Some("""WITH RECURSIVE names AS (
          SELECT DISTINCT p_name AS name,
            regexp_extract(p_name, '[a-z]+$') AS block FROM part),
        ok AS (SELECT block FROM names GROUP BY 1 HAVING count(*) <= 1000),
        capped AS (SELECT name, block FROM names
          WHERE block IN (SELECT block FROM ok)),
        pairs AS (SELECT a.name AS u, b.name AS v
          FROM capped a JOIN capped b
          ON a.block = b.block AND a.name < b.name
          WHERE levenshtein(a.name, b.name) <= 3),
        edges AS (SELECT u AS s, v AS d FROM pairs
          UNION ALL SELECT v, u FROM pairs),
        reach(node, lab) AS (
          SELECT name, name FROM names
          UNION
          SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node),
        comp AS (SELECT node, min(lab) AS canon FROM reach GROUP BY 1),
        sizes AS (SELECT canon, count(*) AS entity_size
          FROM comp GROUP BY 1)
        SELECT c.node AS name, c.canon AS canonical_name, s.entity_size
        FROM comp c JOIN sizes s ON s.canon = c.canon
        ORDER BY name""")),

    // CUSUM change-point detection per series — the meter-drift alarm:
    // cumulative sum of deviations from the series' own mean, alarm
    // rows where |CUSUM| exceeds a threshold. ALL arithmetic is BIGINT
    // cents (values at fixed scale, mean as integer floor-division),
    // because a running DOUBLE sum is association-dependent and
    // engines may tree-aggregate windows differently — integer
    // addition is associative, so the running sum is exact under any
    // evaluation strategy. Two shuffles: the per-series mean and the
    // ordered window ride the same user_id partitioning; the peak is
    // a lexicographic struct-max (no second window).
    Q("q149_cusum_changepoints",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            floor(col("value") * 100d + 0.5d).cast(LongType).as("cents"))
        val mean = ev.groupBy("user_id")
          .agg(expr("sum(cents) DIV count(1)").as("mean_cents"))
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.join(mean, "user_id")
          .withColumn("cusum",
            sum(col("cents") - col("mean_cents")).over(w))
          .groupBy("user_id")
          .agg(
            count(when(abs(col("cusum")) > 5000L, 1)).as("n_alarms"),
            max(struct(abs(col("cusum")).as("a"), col("ts").as("t")))
              .as("pk"))
          .select(col("user_id"), col("n_alarms"),
            col("pk.a").as("peak_cusum"), col("pk.t").as("peak_ts"))
          .orderBy("user_id")
      },
      Some("""WITH base AS (SELECT user_id, ts, event_id,
            CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events),
        m AS (SELECT user_id,
            CAST(sum(cents) AS BIGINT) // count(*) AS mean_cents
          FROM base GROUP BY 1),
        c AS (SELECT b.user_id, b.ts,
            CAST(sum(b.cents - m.mean_cents) OVER (
              PARTITION BY b.user_id ORDER BY b.ts, b.event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cusum
          FROM base b JOIN m ON b.user_id = m.user_id),
        agg AS (SELECT user_id,
            CAST(sum(CASE WHEN abs(cusum) > 5000 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_alarms,
            CAST(max(abs(cusum)) AS BIGINT) AS peak_cusum
          FROM c GROUP BY 1)
        SELECT a.user_id, a.n_alarms, a.peak_cusum,
          (SELECT max(ts) FROM c
            WHERE c.user_id = a.user_id
              AND abs(c.cusum) = a.peak_cusum) AS peak_ts
        FROM agg a ORDER BY a.user_id""")),

    // Time-series gap report — the meter-data quality primitive the
    // reference's gap-filled ingest implies: per series, every
    // interval where consecutive readings sit more than 12 h apart.
    // One ordered window (lead) on the series key; gap length in
    // whole seconds via floor-epoch differences, which both engines
    // compute identically. Output is |gaps|, not |events|.
    Q("q150_gap_report",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("next_ts", lead(col("ts"), 1).over(w))
          .filter(col("next_ts").isNotNull &&
            col("next_ts").cast(LongType) - col("ts").cast(LongType)
              > 43200L)
          .select(col("user_id"), col("ts").as("gap_start"),
            col("next_ts").as("gap_end"),
            (col("next_ts").cast(LongType) - col("ts").cast(LongType))
              .as("gap_seconds"))
          .orderBy("user_id", "gap_start")
      },
      Some("""WITH o AS (SELECT user_id, ts, lead(ts) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
          FROM events)
        SELECT user_id, ts AS gap_start, next_ts AS gap_end,
          CAST(date_diff('second', ts, next_ts) AS BIGINT) AS gap_seconds
        FROM o
        WHERE next_ts IS NOT NULL
          AND date_diff('second', ts, next_ts) > 43200
        ORDER BY user_id, gap_start""")),

    // Robust outlier detection by MEDIAN ABSOLUTE DEVIATION — the
    // heavy-tail-safe alternative to q82's z-score (one wild meter
    // reading poisons a mean/stddev; it barely moves a median). Both
    // medians are EXACT lower medians selected by integer rank over
    // BIGINT cents (no float quantile interpolation), deviations are
    // integer, and the 3×MAD outlier test is an integer comparison —
    // the whole query is arithmetic-free of doubles. Two rank windows
    // per group, both on the same event_type partitioning.
    Q("q154_mad_outliers",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select(col("event_type"), col("event_id"),
            floor(col("value") * 100d + 0.5d).cast(LongType).as("cents"))
        val wOrd = Window.partitionBy("event_type")
          .orderBy("cents", "event_id")
        val wAll = Window.partitionBy("event_type")
        val med = ev
          .withColumn("rn", row_number().over(wOrd).cast(LongType))
          .withColumn("n", count(lit(1)).over(wAll))
          .filter(col("rn") === expr("(n + 1) DIV 2")) // integer div:
          // Spark `/` on longs yields DOUBLE and would never match rn
          .select(col("event_type"), col("cents").as("median_cents"))
        val dev = ev.join(med, "event_type")
          .withColumn("dev", abs(col("cents") - col("median_cents")))
        val wDev = Window.partitionBy("event_type")
          .orderBy("dev", "event_id")
        val mad = dev
          .withColumn("rn", row_number().over(wDev).cast(LongType))
          .withColumn("n", count(lit(1)).over(wAll))
          .filter(col("rn") === expr("(n + 1) DIV 2"))
          .select(col("event_type"), col("dev").as("mad_cents"))
        dev.join(mad, "event_type")
          .groupBy(col("event_type"))
          .agg(max(col("median_cents")).as("median_cents"),
            max(col("mad_cents")).as("mad_cents"),
            count(when(col("dev") > col("mad_cents") * 3, 1))
              .as("n_outliers"))
          .orderBy("event_type")
      },
      Some("""WITH base AS (SELECT event_type, event_id,
            CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events),
        r AS (SELECT event_type, cents,
            row_number() OVER (PARTITION BY event_type
              ORDER BY cents, event_id) AS rn,
            count(*) OVER (PARTITION BY event_type) AS n
          FROM base),
        med AS (SELECT event_type, cents AS median_cents FROM r
          WHERE rn = (n + 1) // 2),
        dev AS (SELECT b.event_type, b.event_id,
            abs(b.cents - m.median_cents) AS dev, m.median_cents
          FROM base b JOIN med m ON b.event_type = m.event_type),
        r2 AS (SELECT event_type, dev,
            row_number() OVER (PARTITION BY event_type
              ORDER BY dev, event_id) AS rn,
            count(*) OVER (PARTITION BY event_type) AS n
          FROM dev),
        mad AS (SELECT event_type, dev AS mad_cents FROM r2
          WHERE rn = (n + 1) // 2)
        SELECT d.event_type,
          CAST(max(d.median_cents) AS BIGINT) AS median_cents,
          CAST(max(m.mad_cents) AS BIGINT) AS mad_cents,
          CAST(sum(CASE WHEN d.dev > m.mad_cents * 3 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
        FROM dev d JOIN mad m ON d.event_type = m.event_type
        GROUP BY 1 ORDER BY 1""")),

    // CDC diff — the planning half of the K6 upsert: classify every
    // key of the new snapshot against the current dimension as
    // insert / update / unchanged via a full-outer join on the key
    // with value comparison (deletes fall out of the same join as
    // target-only rows; this fixture's key space only grows, so the
    // output here is inserts + updates). Old and new states travel in
    // the output so the downstream MERGE is a pure writer. One
    // co-partitioned join of two |keys|-sized latest-per-key tables —
    // the fact table is reduced BEFORE the join, shapes shared with
    // q13/q78.
    Q("q155_cdc_diff",
      (s, dir) => {
        val cutTs = "2024-01-20 00:00:00"
        val ev = Tables.load(s, dir, "events")
        def latest(df: org.apache.spark.sql.DataFrame) = df
          .groupBy(col("user_id"))
          .agg(max(struct(col("ts"), col("event_id"), col("event_type")))
            .as("m"))
          .select(col("user_id"), col("m.event_type").as("state"))
        val target = latest(ev.filter(col("ts") < to_timestamp(lit(cutTs))))
          .withColumnRenamed("state", "old_state")
        val source = latest(ev).withColumnRenamed("state", "new_state")
        source.join(target, Seq("user_id"), "full")
          .withColumn("change_type",
            when(col("old_state").isNull, "insert")
              .when(col("new_state") =!= col("old_state"), "update"))
          .filter(col("change_type").isNotNull)
          .select("user_id", "change_type", "old_state", "new_state")
          .orderBy("user_id")
      },
      Some("""WITH tgt AS (SELECT user_id, event_type AS old_state FROM (
            SELECT user_id, event_type, row_number() OVER (
              PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00')
          WHERE rn = 1),
        src AS (SELECT user_id, event_type AS new_state FROM (
            SELECT user_id, event_type, row_number() OVER (
              PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
          WHERE rn = 1)
        SELECT COALESCE(s.user_id, t.user_id) AS user_id,
          CASE WHEN t.old_state IS NULL THEN 'insert'
               WHEN s.new_state <> t.old_state THEN 'update' END
            AS change_type,
          t.old_state, s.new_state
        FROM src s FULL JOIN tgt t ON s.user_id = t.user_id
        WHERE t.old_state IS NULL OR s.new_state <> t.old_state
        ORDER BY user_id""")),

    // k-anonymity audit — before a dataset is shared, every
    // quasi-identifier combination (here event_type × date × coarse
    // value band) must cover at least k individuals; smaller groups
    // re-identify. Report per event_type: group counts, rows that
    // would need suppression, and the suppression rate. Two hash
    // aggregates (QI groups, then the per-type roll-up of the
    // |groups|-sized table); the rate is one mirrored double division
    // over exact integer counts. At 100 TB the QI aggregation is
    // map-side combinable and the roll-up input is |QI-groups|, not
    // rows.
    Q("q157_k_anonymity",
      (s, dir) => {
        val k = 10
        val g = Tables.load(s, dir, "events")
          .groupBy(col("event_type"),
            to_date(col("ts")).as("day"),
            floor(col("value") / 100.0).cast(LongType).as("band"))
          .agg(count(lit(1)).as("n"))
        g.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_groups"),
            count(when(col("n") < k, 1)).as("n_violating"),
            sum(col("n")).as("n_rows"),
            sum(when(col("n") < k, col("n")).otherwise(lit(0L)))
              .as("rows_at_risk"))
          .select(col("event_type"), col("n_groups"),
            col("n_violating"), col("rows_at_risk"),
            (col("rows_at_risk").cast(DoubleType) /
              col("n_rows").cast(DoubleType)).as("suppression_rate"))
          .orderBy("event_type")
      },
      Some("""WITH g AS (SELECT event_type, CAST(ts AS DATE) AS day,
            CAST(floor(value / 100.0) AS BIGINT) AS band,
            count(*) AS n
          FROM events GROUP BY 1, 2, 3)
        SELECT event_type,
          CAST(count(*) AS BIGINT) AS n_groups,
          CAST(sum(CASE WHEN n < 10 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_violating,
          CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS BIGINT)
            AS rows_at_risk,
          CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS DOUBLE)
            / CAST(sum(n) AS DOUBLE) AS suppression_rate
        FROM g GROUP BY 1 ORDER BY 1""")),

    // HyperLogLog registers — the OTHER mergeable cardinality sketch
    // beside q114's KMV, and the one every engine ships at scale
    // (register max is the merge op, so partial aggregation and
    // streaming state both come for free). Everything up to the
    // registers is exact integer math: a murmur-style finalizer
    // (xor-shift / odd-multiply / xor-shift, all mod 2^32 — the
    // second multiplier is < 2^31 so the widest product stays inside
    // int64 on BOTH engines) decorrelates the synthetic contiguous
    // ids; the register rank is the leading-zero count via
    // length(bin(w)) — string-exact, no float log2. The raw estimator
    // αm·m²/Σ2^-M is hash-exact too: every 2^-M term is a dyadic
    // rational ≥ 2^-29, so the sum is EXACTLY associative in IEEE
    // double regardless of aggregation order. (The standard small/
    // large-range bias corrections need ln — never under the hash —
    // so the raw estimate is the contract; callers correct outside.)
    Q("q168_hll_sketch",
      (s, dir) => {
        Tables.load(s, dir, "events")
          .select(col("event_type"), col("user_id")).distinct()
          .withColumn("a", expr(
            "(user_id * 2654435761 + ascii(event_type) * 1000003)" +
              " % 4294967296"))
          .withColumn("b", expr("a ^ (a div 65536)"))
          .withColumn("c", expr("(b * 2145916205) % 4294967296"))
          .withColumn("h", expr("c ^ (c div 8192)"))
          .withColumn("j", expr("h % 16"))
          .withColumn("w", expr("h div 16"))
          .withColumn("rank",
            when(col("w") === 0, lit(29))
              .otherwise(lit(29) - length(expr("bin(w)"))))
          .groupBy(col("event_type"), col("j"))
          .agg(max(col("rank")).as("m"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_regs"),
            (sum(expr(
              "1.0 / cast(shiftleft(cast(1 as bigint), m) as double)"))
              + (lit(16) - count(lit(1))) * lit(1.0)).as("z"))
          .select(col("event_type"), col("n_regs"),
            (lit(0.673) * lit(256.0) / col("z")).as("hll_estimate"))
          .orderBy("event_type")
      },
      Some("""WITH h0 AS (SELECT DISTINCT event_type,
            (user_id * 2654435761 + ascii(event_type) * 1000003)
              % 4294967296 AS a
          FROM events),
        h1 AS (SELECT event_type, xor(a, a // 65536) AS b FROM h0),
        h2 AS (SELECT event_type,
            (b * 2145916205) % 4294967296 AS c FROM h1),
        h AS (SELECT event_type, xor(c, c // 8192) AS h FROM h2),
        r AS (SELECT event_type, h % 16 AS j, h // 16 AS w FROM h),
        rk AS (SELECT event_type, j,
            CASE WHEN w = 0 THEN 29
              ELSE 29 - length(bin(w)) END AS rank
          FROM r),
        regs AS (SELECT event_type, j, max(rank) AS m
          FROM rk GROUP BY 1, 2),
        est AS (SELECT event_type,
            CAST(count(*) AS BIGINT) AS n_regs,
            sum(1.0 / CAST((1::BIGINT << m) AS DOUBLE))
              + (16 - count(*)) * 1.0 AS z
          FROM regs GROUP BY 1)
        SELECT event_type, n_regs, 0.673 * 256.0 / z AS hll_estimate
        FROM est ORDER BY 1""")),

    // Count-min sketch — the frequency sketch that completes the
    // mergeable-sketch suite (KMV q114 distinct / HLL q168 cardinality
    // / CMS frequency): 4 hash rows × 1024 counters, point estimate =
    // min over rows (never underestimates — StatsOpsSpec asserts the
    // one-sided guarantee against exact counts). Counters are plain
    // counts, so partial aggregation, merging and streaming state all
    // come free; the sketch build is one hash aggregate of the fact
    // table, the probe touches the |keys| table only. CW-style linear
    // hashing keeps everything in exact int64 (max key × max
    // multiplier ≪ 2^63).
    Q("q171_countmin_heavy_hitters",
      (s, dir) => {
        val rowsDf = Seq((0L, 2654435761L), (1L, 2246822519L),
          (2L, 3266489917L), (3L, 668265263L))
        val rowsCol = explode(array(rowsDf.map { case (r, m) =>
          struct(lit(r).as("r"), lit(m).as("mult")) }: _*)).as("rm")
        val ev = Tables.load(s, dir, "events")
        val bucket = expr("((user_id * mult) % 4294967296) div 4194304")
        val counters = ev.select(col("user_id"), rowsCol)
          .select(col("user_id"), col("rm.r").as("r"),
            col("rm.mult").as("mult"))
          .withColumn("bucket", bucket)
          .groupBy("r", "bucket").agg(count(lit(1)).as("c"))
        val probe = ev.select(col("user_id")).distinct()
          .select(col("user_id"), rowsCol)
          .select(col("user_id"), col("rm.r").as("r"),
            col("rm.mult").as("mult"))
          .withColumn("bucket", bucket)
        val est = probe.join(counters, Seq("r", "bucket"))
          .groupBy("user_id").agg(min(col("c")).as("cms_estimate"))
        val exact = ev.groupBy("user_id")
          .agg(count(lit(1)).as("exact_count"))
        est.join(exact, "user_id")
          .select("user_id", "exact_count", "cms_estimate")
          .orderBy(col("cms_estimate").desc, col("user_id"))
          .limit(10)
      },
      Some("""WITH rows_ AS (SELECT CAST(r AS BIGINT) AS r,
            CAST(CASE r WHEN 0 THEN 2654435761 WHEN 1 THEN 2246822519
              WHEN 2 THEN 3266489917 ELSE 668265263 END AS BIGINT)
              AS mult
          FROM UNNEST(range(0, 4)) AS t(r)),
        h AS (SELECT e.user_id, r.r,
            ((e.user_id * r.mult) % 4294967296) // 4194304 AS bucket
          FROM events e CROSS JOIN rows_ r),
        counters AS (SELECT r, bucket, count(*) AS c
          FROM h GROUP BY 1, 2),
        keys AS (SELECT DISTINCT user_id FROM events),
        probe AS (SELECT k.user_id, r.r,
            ((k.user_id * r.mult) % 4294967296) // 4194304 AS bucket
          FROM keys k CROSS JOIN rows_ r),
        est AS (SELECT user_id, CAST(min(c) AS BIGINT) AS cms_estimate
          FROM probe p JOIN counters c ON p.r = c.r
            AND p.bucket = c.bucket
          GROUP BY 1),
        exact AS (SELECT user_id, CAST(count(*) AS BIGINT)
            AS exact_count
          FROM events GROUP BY 1)
        SELECT e.user_id, x.exact_count, e.cms_estimate
        FROM est e JOIN exact x ON e.user_id = x.user_id
        ORDER BY e.cms_estimate DESC, e.user_id LIMIT 10""")),

    // Bloom-filter semi-join — the scale pattern for filtering a fact
    // table by a key set WITHOUT shipping the key set: 3 hash bits in
    // a 256-bit filter (eight 32-bit words built by a bit_or
    // aggregate — shifts stay far below bit 63, which DuckDB
    // range-checks on `<<`), probe passes iff all three bits are set.
    // One-sided by construction (no false negatives — every actual
    // member passes); false positives are the rate the query reports.
    // The filter is 32 bytes regardless of key-set size — that is the
    // point at 100 TB: broadcast the words, not the dimension.
    Q("q172_bloom_semi_join",
      (s, dir) => {
        val hashes = Seq(2654435761L, 2246822519L, 3266489917L)
        val ev = Tables.load(s, dir, "events")
        val members = ev.filter(col("event_type") === "purchase")
          .select(col("user_id")).distinct()
        def bitCols(df: org.apache.spark.sql.DataFrame) =
          df.select(col("user_id"), explode(array(hashes.map(m =>
            expr(s"((user_id * $m) % 4294967296) div 16777216")): _*))
            .as("idx"))
            .select(col("user_id"),
              expr("idx div 32").as("word"),
              expr("shiftleft(cast(1 as bigint), cast(idx % 32 as int))")
                .as("mask"))
        val bloom = bitCols(members)
          .groupBy("word").agg(expr("bit_or(mask)").as("bits"))
        val verdict = bitCols(ev.select(col("user_id")).distinct())
          .join(bloom, Seq("word"), "left")
          .groupBy("user_id")
          .agg(expr("every(bits IS NOT NULL AND (bits & mask) = mask)")
            .as("bloom_member"))
        verdict
          .join(members.withColumn("actual_member", lit(true)),
            Seq("user_id"), "left")
          .select(col("user_id"), col("bloom_member"),
            coalesce(col("actual_member"), lit(false))
              .as("actual_member"))
          .orderBy("user_id")
      },
      Some("""WITH members AS (SELECT DISTINCT user_id FROM events
          WHERE event_type = 'purchase'),
        hs AS (SELECT CAST(CASE h WHEN 0 THEN 2654435761
            WHEN 1 THEN 2246822519 ELSE 3266489917 END AS BIGINT)
            AS mult
          FROM UNNEST(range(0, 3)) AS t(h)),
        mbits AS (SELECT ((m.user_id * hs.mult) % 4294967296)
              // 16777216 AS idx
          FROM members m CROSS JOIN hs),
        bloom AS (SELECT idx // 32 AS word,
            bit_or(1::BIGINT << CAST(idx % 32 AS INTEGER)) AS bits
          FROM mbits GROUP BY 1),
        keys AS (SELECT DISTINCT user_id FROM events),
        pbits AS (SELECT k.user_id,
            ((k.user_id * hs.mult) % 4294967296) // 16777216 AS idx
          FROM keys k CROSS JOIN hs),
        verdict AS (SELECT p.user_id,
            bool_and(b.bits IS NOT NULL
              AND (b.bits & (1::BIGINT
                << CAST(p.idx % 32 AS INTEGER)))
                = (1::BIGINT << CAST(p.idx % 32 AS INTEGER)))
              AS bloom_member
          FROM pbits p LEFT JOIN bloom b ON p.idx // 32 = b.word
          GROUP BY 1)
        SELECT v.user_id, v.bloom_member,
          m.user_id IS NOT NULL AS actual_member
        FROM verdict v LEFT JOIN members m ON v.user_id = m.user_id
        ORDER BY v.user_id""")),

    // l-diversity — the second half of the privacy audit q157 starts:
    // a k-anonymous group can still leak if every member shares the
    // same SENSITIVE value, so per quasi-identifier group (day, value
    // band) count the DISTINCT sensitive values (event_type) and
    // report per-day how many groups fall below l=3, the worst group,
    // and the rows in under-diverse groups. Two hash aggregates.
    Q("q239_l_diversity",
      (s, dir) => {
        val l = 3
        val g = Tables.load(s, dir, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
            floor(col("value") / 100.0).cast(LongType).as("band"))
          .agg(countDistinct(col("event_type")).as("ldiv"),
            count(lit(1)).as("n"))
        g.groupBy(col("day"))
          .agg(count(lit(1)).as("n_groups"),
            count(when(col("ldiv") < l, 1)).as("n_below"),
            min(col("ldiv")).as("min_l"),
            sum(when(col("ldiv") < l, col("n")).otherwise(lit(0L)))
              .as("rows_at_risk"))
          .orderBy("day")
      },
      Some("""WITH g AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
            CAST(floor(value / 100.0) AS BIGINT) AS band,
            CAST(count(DISTINCT event_type) AS BIGINT) AS ldiv,
            count(*) AS n
          FROM events GROUP BY 1, 2)
        SELECT day,
          CAST(count(*) AS BIGINT) AS n_groups,
          CAST(count(CASE WHEN ldiv < 3 THEN 1 END) AS BIGINT)
            AS n_below,
          min(ldiv) AS min_l,
          CAST(sum(CASE WHEN ldiv < 3 THEN n ELSE 0 END) AS BIGINT)
            AS rows_at_risk
        FROM g GROUP BY 1 ORDER BY day"""))
  )
}
