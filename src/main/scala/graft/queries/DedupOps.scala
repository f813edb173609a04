package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables
import graft.operators.{ConnectedComponents, Dedup}

/** Near-dup detection operators over `documents`: MinHash+LSH, exact
  * n-gram Jaccard, SimHash. The md5-based hash family makes every stage
  * reproducible in ANSI SQL, so even the LSH pipeline is oracle-checked
  * end-to-end (shingle → minhash → band → bucket-join → estimate).
  */
object DedupOps {

  private[queries] val K = 3  // words per shingle
  private[queries] val NumHashes = 8  // minhash signature length
  private[queries] val Bands = 4  // LSH bands (2 rows per band)

  // Skew guards, engaged so the bench measures the scale-honest plan.
  // Far above any fixture frequency (sf0.1 has 5k docs), so results —
  // and the DuckDB oracles, which don't express the cap — are
  // unchanged; at corpus scale the same call bounds every reducer.
  // DedupSpec proves the caps bite on planted hot keys.
  private val MaxDocFreq = 1 << 20
  private[queries] val MaxBucketWidth = 1 << 20

  /** q334's deliberately ENGAGED band-bucket cap: below the corpus's
    * widest band bucket at every SF, so the pair-side bomb guard
    * provably truncates in the committed bench artifact (r18 verdict
    * #3) — the oracle expresses the same cap. */
  private val EngagedBucketWidth = 2

  /** DuckDB CTE chain mirroring Dedup.shingleSets (distinct word
    * K-shingles) over an arbitrary source relation — THE single copy
    * of the shingle SQL; q25's, q69's and q110's oracles all build on
    * it so the shingling can't drift between hand-kept copies.
    * `prefix` disambiguates the CTE names when one query shingles two
    * relations (q110: deduped train text vs raw benchmark text). */
  private[queries] def shingleCtes(source: String,
      prefix: String = ""): String =
    s"""${prefix}words AS (SELECT doc_id, string_split(text, ' ') AS ws
         FROM $source),
       ${prefix}sh AS (SELECT DISTINCT doc_id,
           ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
         FROM ${prefix}words, UNNEST(range(1, len(ws) - 1)) AS t(i))"""

  private val shingleCte = shingleCtes("documents")

  /** CTE chain (shingles → minhash sig → bands → distinct candidate
    * pairs) mirroring Dedup.minHashLsh over `source` — shared by q24's
    * oracle and q69's composite so the hash family and banding exist
    * in exactly one place. Yields CTEs `sig` and `cand`. */
  private[queries] def lshSigBandCtes(source: String): String = {
    val mhCols = (0 until NumHashes)
      .map(h => s"min(substr(md5('${h / 4}' || '|' || shingle), " +
        s"${h % 4 * 8 + 1}, 8)) AS mh$h").mkString(", ")
    val bandRows = (0 until Bands).map { b =>
      val r0 = b * (NumHashes / Bands)
      val r1 = r0 + 1
      s"SELECT doc_id, $b AS band, md5(mh$r0 || mh$r1) AS bkey FROM sig"
    }.mkString(" UNION ALL ")
    s"""${shingleCtes(source)},
      sig AS (SELECT doc_id, $mhCols FROM sh GROUP BY 1),
      bands AS ($bandRows)"""
  }

  private[queries] def lshCandidateCtes(source: String): String =
    s"""${lshSigBandCtes(source)},
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)"""

  /** Minhash-position agreement count between `sa` and `sb` sig rows. */
  private[queries] val lshAgreeSql: String = (0 until NumHashes)
    .map(i => s"(CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END)")
    .mkString(" + ")

  private[queries] val lshNumHashes: Int = NumHashes

  private val minhashOracle: String =
    s"""WITH ${lshCandidateCtes("documents")}
      SELECT doc_a, doc_b,
        CAST($lshAgreeSql AS DOUBLE) / ${NumHashes}.0 AS est_jaccard
      FROM cand
      JOIN sig sa ON doc_a = sa.doc_id
      JOIN sig sb ON doc_b = sb.doc_id
      ORDER BY doc_a, doc_b"""

  private val simhashBits = 32

  /** (doc_id, simhash) subquery mirroring Dedup.simHash — shared by the
    * signature oracle (q26) and the near-dup pairing oracle (q68). */
  private val simhashSigSql: String = {
    val sums = (0 until simhashBits / 4).flatMap { p =>
      (0 until 4).map { j =>
        val div = math.pow(2, 3 - j)
        s"""sum((floor((strpos('0123456789abcdef',
            substr(md5(w), ${p + 1}, 1)) - 1) / $div) % 2) * 2 - 1)
          AS s${p * 4 + j}"""
      }
    }.mkString(", ")
    val bits = (0 until simhashBits)
      .map(i => s"(CASE WHEN s$i > 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")
    s"""SELECT doc_id, $bits AS simhash FROM (
        SELECT doc_id, $sums FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents) GROUP BY 1)"""
  }

  private val simhashOracle: String =
    s"SELECT doc_id, simhash FROM ($simhashSigSql) ORDER BY doc_id"

  val qs: Seq[Q] = Seq(

    // MinHash + LSH banding: candidate near-dup pairs with estimated
    // Jaccard (the standard web-scale near-dedup pipeline).
    Q("q24_minhash_lsh",
      (s, dir) => {
        Dedup.minHashLsh(Tables.load(s, dir, "documents"),
            K, NumHashes, Bands, maxBucketWidth = MaxBucketWidth)
          .orderBy("doc_a", "doc_b")
      },
      Some(minhashOracle)),

    // Asymmetric LSH — the daily-ingest dedup path: the "new batch"
    // (doc_id % 10 = 0) probes the existing corpus' band index; no
    // corpus-vs-corpus pairs are ever generated, so continuous dedup
    // costs Σ bucket (new × corpus) widths per day, not corpus². Same
    // hash family as q24, so the oracle reuses its sig/band CTEs with
    // the membership predicates on the candidate join.
    Q("q153_incremental_neardup",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.minHashLshAgainst(
            docs.filter(col("doc_id") % 10 === 0),
            docs.filter(col("doc_id") % 10 =!= 0),
            K, NumHashes, Bands, maxBucketWidth = MaxBucketWidth)
          .orderBy("new_id", "corpus_id")
      },
      Some(s"""WITH ${lshSigBandCtes("documents")},
        cand AS (SELECT DISTINCT a.doc_id AS new_id,
            b.doc_id AS corpus_id
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bkey = b.bkey
              AND a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0)
        SELECT new_id, corpus_id,
          CAST($lshAgreeSql AS DOUBLE) / ${NumHashes}.0 AS est_jaccard
        FROM cand
        JOIN sig sa ON new_id = sa.doc_id
        JOIN sig sb ON corpus_id = sb.doc_id
        ORDER BY new_id, corpus_id""")),

    // Exact n-gram Jaccard via inverted-index self-join, thresholded
    // to near-dup candidates.
    Q("q25_ngram_jaccard",
      (s, dir) => {
        Dedup.ngramJaccardPairs(Tables.load(s, dir, "documents"), K,
            minJaccard = 0.03, maxDocFreq = MaxDocFreq)
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH $shingleCte,
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            count(*) AS inter
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b,
          CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE)
            AS jaccard
        FROM inter
        JOIN sizes na ON doc_a = na.doc_id
        JOIN sizes nb ON doc_b = nb.doc_id
        WHERE CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE)
          >= 0.03
        ORDER BY doc_a, doc_b""")),

    // SimHash signatures (32-bit, token-level).
    Q("q26_simhash",
      (s, dir) => {
        Dedup.simHash(Tables.load(s, dir, "documents"), simhashBits)
          .orderBy("doc_id")
      },
      Some(simhashOracle)),

    // SimHash near-dup pairing — the second half of the SimHash
    // pipeline: banded-LSH candidates over the bit signatures, exact
    // hamming ≤ 3 filter (3 < 4 bands — the pigeonhole bound that makes banded candidate generation complete), same bucket-width guard as q24.
    Q("q68_simhash_neardup",
      (s, dir) => {
        Dedup.simHashNearDupPairs(Tables.load(s, dir, "documents"),
            simhashBits, bands = 4, maxHamming = 3,
            maxBucketWidth = MaxBucketWidth)
          .orderBy("doc_a", "doc_b")
      },
      Some {
        val bandLen = simhashBits / 4
        val bandRows = (0 until 4).map { b =>
          s"SELECT doc_id, $b AS band, " +
            s"substr(simhash, ${b * bandLen + 1}, $bandLen) AS bkey FROM sig"
        }.mkString(" UNION ALL ")
        val hamming = (1 to simhashBits).map(i =>
          s"(CASE WHEN substr(sa.simhash, $i, 1) <> " +
            s"substr(sb.simhash, $i, 1) THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""WITH sig AS ($simhashSigSql),
          bands AS ($bandRows),
          pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bkey = b.bkey
                AND a.doc_id < b.doc_id)
          SELECT doc_a, doc_b, CAST($hamming AS BIGINT) AS hamming
          FROM pairs
          JOIN sig sa ON doc_a = sa.doc_id
          JOIN sig sb ON doc_b = sb.doc_id
          WHERE $hamming <= 3
          ORDER BY doc_a, doc_b"""
      }),

    // Near-dup CLUSTERS: exact-Jaccard pairs (≥0.3) become undirected
    // edges; large-star/small-star connected components assign every
    // doc its cluster id (= min doc_id in the component, so
    // doc_id = cluster_id marks the canonical survivor). The oracle
    // recomputes the same clustering via a recursive CTE (min
    // reachable label — fine at fixture scale; the Spark side is the
    // O(log² n)-round algorithm that survives 100 TB).
    Q("q70_dup_clusters",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val pairs = Dedup.ngramJaccardPairs(docs, K,
          minJaccard = 0.3, maxDocFreq = MaxDocFreq)
        ConnectedComponents.components(pairs, "doc_a", "doc_b",
            nodes = Some(docs.select(col("doc_id"))))
          .select(col("node").as("doc_id"), col("component").as("cluster_id"))
          .orderBy("doc_id")
      },
      Some(FullBatchClusterOracle)),

    // Incremental connected components — the daily dedup-graph
    // maintenance shape: yesterday's labels (CC over the 80% "old"
    // corpus) merge with today's new edges (new docs' shingles probe
    // the full shingle index — the q153 asymmetric pattern, never
    // corpus²) by running CC over (label star edges ∪ new edges).
    // The oracle is q70's FULL-BATCH clustering verbatim, so the
    // hash match IS the proof that incremental == recompute — label
    // semantics included (labels are min doc ids, and star edges
    // preserve exactly the old connectivity).
    Q("q238_incremental_components",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val oldDocs = docs.filter(col("doc_id") % 5 =!= 0)
        // yesterday: full clustering of the old corpus only
        val oldPairs = Dedup.ngramJaccardPairs(oldDocs, K,
          minJaccard = 0.3, maxDocFreq = MaxDocFreq)
        val labels1 = ConnectedComponents.components(oldPairs,
          "doc_a", "doc_b", nodes = Some(oldDocs.select(col("doc_id"))))
        // today: only pairs with a NEW end — new shingles probe the
        // full index; per-pair exact Jaccard over the hashed shingles.
        // The probe rides the SAME hot-shingle cap as ngramJaccardPairs
        // (full-corpus doc frequency ≤ MaxDocFreq) — without it one
        // boilerplate shingle makes this join quadratic. Boundary of
        // the equivalence proof: incremental == recompute holds while
        // the cap engages identically on the old and full corpus (a
        // shingle crossing the 2^20 threshold only via today's batch
        // could flip it); the oracle hash-checks the fixture regime,
        // where the cap is a no-op.
        val xh = org.apache.spark.sql.functions.xxhash64(col("shingle"))
        val shAll = Dedup.capDocFreq(
            Dedup.shingleSets(docs, K)
              .select(col("doc_id"), xh.as("h")),
            MaxDocFreq, "h")
          .persist()
        val shNew = shAll.filter(col("doc_id") % 5 === 0)
        val sizes = shAll.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val inter = shNew.as("a")
          .join(shAll.as("b").hint("shuffle_hash"),
            col("a.h") === col("b.h") &&
              col("a.doc_id") =!= col("b.doc_id"))
          .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .agg(count(lit(1)).as("i"))
        val newEdges = inter
          .join(sizes.select(col("doc_id").as("da"),
            col("n").as("na")), Seq("da"))
          .join(sizes.select(col("doc_id").as("db"),
            col("n").as("nb")), Seq("db"))
          .filter(col("i").cast("double") /
            (col("na") + col("nb") - col("i")).cast("double") >= 0.3)
          .select(least(col("da"), col("db")).as("u"),
            greatest(col("da"), col("db")).as("v"))
          .distinct()
        val merged = labels1
          .select(col("node").as("u"), col("component").as("v"))
          .union(newEdges)
        val res = ConnectedComponents.components(merged, "u", "v",
            nodes = Some(docs.select(col("doc_id"))))
          .select(col("node").as("doc_id"),
            col("component").as("cluster_id"))
          .orderBy("doc_id")
        // seal, then drop the shingle cache and BOTH CC runs'
        // internal final checkpoints. The FIRST run's checkpoint
        // (labels1) is NOT reachable from res's plan — the second
        // run's round-1 checkpoint truncated that lineage — so it
        // must be released explicitly, not via the plan walk.
        graft.operators.CacheOps.sealThen(res) {
          graft.operators.CacheOps.releaseCheckpointExcept(res, docs)
          graft.operators.CacheOps.releaseCheckpoint(labels1)
          shAll.unpersist(false)
        }
      },
      Some(FullBatchClusterOracle)),

    // Benchmark decontamination: training split = doc_id % 10 != 0,
    // benchmark (eval) split = doc_id % 10 == 0; per training doc, how
    // many of its distinct 3-shingles leak from the benchmark set.
    Q("q71_decontaminate",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.contaminationReport(
            docs.filter(col("doc_id") % 10 =!= 0),
            docs.filter(col("doc_id") % 10 === 0), K)
          .orderBy("doc_id")
      },
      Some(s"""WITH $shingleCte,
        tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 10 <> 0),
        be AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0)
        SELECT tr.doc_id,
          CAST(count(*) AS BIGINT) AS n_shingles,
          CAST(count(be.shingle) AS BIGINT) AS n_contaminated,
          CAST(count(be.shingle) AS DOUBLE) / CAST(count(*) AS DOUBLE)
            AS contamination_rate
        FROM tr LEFT JOIN be ON tr.shingle = be.shingle
        GROUP BY 1 ORDER BY 1""")),

    // Shingle CONTAINMENT (|A∩B| / min(|A|,|B|)): the asymmetric
    // near-dup test — a short doc quoted verbatim inside a long one
    // scores ≈1 here while its Jaccard stays below any useful
    // threshold. Same inverted-index join and skew cap as q25.
    Q("q94_containment",
      (s, dir) => {
        Dedup.containmentPairs(Tables.load(s, dir, "documents"), K,
            minContainment = 0.2, maxDocFreq = MaxDocFreq)
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH $shingleCte,
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            count(*) AS inter
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
          CAST(na.n AS BIGINT) AS na, CAST(nb.n AS BIGINT) AS nb,
          CAST(inter AS DOUBLE) / CAST(least(na.n, nb.n) AS DOUBLE)
            AS containment
        FROM inter
        JOIN sizes na ON doc_a = na.doc_id
        JOIN sizes nb ON doc_b = nb.doc_id
        WHERE CAST(inter AS DOUBLE) / CAST(least(na.n, nb.n) AS DOUBLE)
          >= 0.2
        ORDER BY doc_a, doc_b""")),

    // Exact duplicated-SPAN detection (Lee et al. 2021's substring
    // dedup, re-expressed shuffle-first — see Dedup.dupSpans for the
    // scale analysis: map-side gram emission, one hash aggregate on
    // md5 gram keys, per-doc gaps-and-islands merge; never N²).
    Q("q174_dup_spans",
      (s, dir) =>
        Dedup.dupSpans(
            Tables.load(s, dir, "documents").select("doc_id", "text"), 5)
          .orderBy("doc_id", "span_start"),
      Some("""WITH ws AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents
          WHERE len(string_split(text, ' ')) >= 5),
        g AS (SELECT doc_id, i AS pos,
            substring(md5(array_to_string(w[i+1:i+5], ' ')), 1, 16) AS g
          FROM ws, UNNEST(range(0, len(w) - 4)) AS t(i)),
        dup AS (SELECT g FROM g GROUP BY g HAVING count(*) >= 2),
        starts AS (SELECT doc_id, pos FROM g
          WHERE g IN (SELECT g FROM dup)),
        isl AS (SELECT doc_id, pos,
            CASE WHEN pos - lag(pos) OVER
                (PARTITION BY doc_id ORDER BY pos) <= 5
              THEN 0 ELSE 1 END AS brk
          FROM starts),
        grp AS (SELECT doc_id, pos,
            sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
          FROM isl)
        SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
          CAST(max(pos) + 4 AS BIGINT) AS span_end,
          CAST(max(pos) + 4 - min(pos) + 1 AS BIGINT) AS span_words
        FROM grp GROUP BY doc_id, island
        ORDER BY doc_id, span_start""")),

    // Doc-level derivative-content score (see Dedup.derivativeScores):
    // the q174 duplication signal as a per-document quality feature —
    // boilerplate/templated content scores high even when no single
    // span is long enough to strip.
    Q("q193_derivative_score",
      (s, dir) =>
        Dedup.derivativeScores(
            Tables.load(s, dir, "documents").select("doc_id", "text"), 5)
          .orderBy("doc_id"),
      Some("""WITH ws AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents
          WHERE len(string_split(text, ' ')) >= 5),
        g AS (SELECT doc_id, i AS pos,
            substring(md5(array_to_string(w[i+1:i+5], ' ')), 1, 16) AS g
          FROM ws, UNNEST(range(0, len(w) - 4)) AS t(i)),
        cnt AS (SELECT g, count(*) AS cnt FROM g GROUP BY 1)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
          CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_dup_grams,
          CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(count(*) AS DOUBLE) AS dup_rate
        FROM g JOIN cnt USING (g)
        GROUP BY 1 ORDER BY 1""")),

    // The APPLY half of span dedup — remove all but the canonical
    // occurrence of every duplicated span and reassemble documents
    // (see Dedup.stripDupSpans for the keyed-join/aggregate layout;
    // the rebuilt text is pinned by md5 so reassembly order itself is
    // hash-checked).
    Q("q180_strip_dup_spans",
      (s, dir) =>
        Dedup.stripDupSpans(
            Tables.load(s, dir, "documents").select("doc_id", "text"), 5)
          .orderBy("doc_id"),
      Some("""WITH ws0 AS (
          SELECT doc_id, text, string_split(text, ' ') AS w
          FROM documents),
        big AS (SELECT doc_id, w FROM ws0 WHERE len(w) >= 5),
        g AS (SELECT doc_id, i AS pos,
            substring(md5(array_to_string(w[i+1:i+5], ' ')), 1, 16) AS g
          FROM big, UNNEST(range(0, len(w) - 4)) AS t(i)),
        dup AS (SELECT g FROM g GROUP BY g HAVING count(*) >= 2),
        starts AS (SELECT doc_id, pos FROM g
          WHERE g IN (SELECT g FROM dup)),
        isl AS (SELECT doc_id, pos,
            CASE WHEN pos - lag(pos) OVER
                (PARTITION BY doc_id ORDER BY pos) <= 5
              THEN 0 ELSE 1 END AS brk
          FROM starts),
        grp AS (SELECT doc_id, pos,
            sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
          FROM isl),
        spans AS (SELECT doc_id, min(pos) AS span_start,
            max(pos) + 4 AS span_end
          FROM grp GROUP BY doc_id, island),
        sp AS (SELECT s.doc_id, span_start, span_end,
            md5(array_to_string(
              b.w[span_start + 1 : span_end + 1], ' ')) AS span_md5,
            row_number() OVER (PARTITION BY md5(array_to_string(
                b.w[span_start + 1 : span_end + 1], ' '))
              ORDER BY s.doc_id, span_start) AS rn
          FROM spans s JOIN big b USING (doc_id)),
        rem AS (SELECT doc_id, span_start, span_end FROM sp WHERE rn > 1),
        strip AS (SELECT DISTINCT doc_id, span_start + j AS pos
          FROM rem, UNNEST(range(0, span_end - span_start + 1)) AS t(j)),
        wpos AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
            w[CAST(i AS INTEGER)] AS word
          FROM big, UNNEST(range(1, len(w) + 1)) AS t(i)),
        keptw AS (SELECT wp.doc_id, wp.pos, wp.word FROM wpos wp
          WHERE NOT EXISTS (SELECT 1 FROM strip st
            WHERE st.doc_id = wp.doc_id AND st.pos = wp.pos)),
        reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept_big,
            array_to_string(list(word ORDER BY pos), ' ') AS new_text_big
          FROM keptw GROUP BY 1)
        SELECT d.doc_id,
          md5(CASE WHEN len(d.w) < 5 THEN d.text
            ELSE coalesce(reb.new_text_big, '') END) AS new_fp,
          CAST(CASE WHEN len(d.w) < 5 THEN len(d.w)
            ELSE coalesce(reb.n_kept_big, 0) END AS BIGINT) AS n_kept,
          CAST(len(d.w) - CASE WHEN len(d.w) < 5 THEN len(d.w)
            ELSE coalesce(reb.n_kept_big, 0) END AS BIGINT) AS n_removed
        FROM ws0 d LEFT JOIN reb USING (doc_id)
        ORDER BY d.doc_id""")),

    // Thresholded exact-Jaccard join via PREFIX FILTERING (PPJoin
    // family) — the deterministic scale path beside MinHash-LSH
    // (q24): candidates only from collisions on each doc's rarest
    // n−ceil(t·n)+1 shingles, exact verification on candidates only.
    // The optimization is TRANSPARENT: the oracle computes plain
    // exact Jaccard ≥ 1/2 over all sharing pairs, so the hash match
    // proves the prefix filter loses nothing (DedupSpec additionally
    // proves it prunes: planted pairs sharing only common shingles
    // never become candidates).
    Q("q183_jaccard_prefix_join",
      (s, dir) =>
        Dedup.jaccardPrefixFiltered(
            Tables.load(s, dir, "documents").select("doc_id", "text"),
            K, 1, 2)
          .orderBy("doc_a", "doc_b"),
      Some(s"""WITH $shingleCte,
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            count(*) AS inter
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
          CAST(na.n AS BIGINT) AS na, CAST(nb.n AS BIGINT) AS nb,
          CAST(inter AS DOUBLE)
            / CAST(na.n + nb.n - inter AS DOUBLE) AS jaccard
        FROM inter
        JOIN sizes na ON doc_a = na.doc_id
        JOIN sizes nb ON doc_b = nb.doc_id
        WHERE 2 * inter >= na.n + nb.n - inter
        ORDER BY doc_a, doc_b""")),

    // Community detection over the near-dup graph: 3 rounds of
    // deterministic synchronous label propagation (most-frequent
    // neighbor label, min-label ties) on the MinHash-LSH pair graph.
    // Where q70's connected components collapse every weakly-linked
    // blob to one id, LPA keeps dense sub-communities apart — the
    // grouping you want when near-dup chains bridge otherwise
    // unrelated template families. Per round: one edge⋈label join
    // shuffle + two hash aggregates; oracle is the same rounds
    // unrolled from ONE CTE generator.
    Q("q208_label_propagation",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val pairs = Dedup.minHashLsh(docs, K, NumHashes, Bands,
          maxBucketWidth = MaxBucketWidth)
        graft.operators.LabelPropagation.run(
            pairs, "doc_a", "doc_b",
            docs.select("doc_id"), "doc_id", rounds = 3)
          .orderBy("node")
      },
      Some(s"""WITH ${lshCandidateCtes("documents")},
        edges AS (SELECT doc_a AS u, doc_b AS v FROM cand
          UNION ALL SELECT doc_b, doc_a FROM cand),
        l0 AS (SELECT doc_id AS node, doc_id AS lbl FROM documents),
        ${graft.operators.LabelPropagation.oracleCtes(3)}
        SELECT node, lbl AS label FROM l3 ORDER BY node""")),
  ) ++ clusterSafeSplitQs

  /** Full-batch Jaccard≥0.3 clustering oracle (min-label CC over the
    * whole corpus) — shared by q70 AND q238, where the shared text is
    * the point: the incremental merge must hash-match the full
    * recompute. */
  private def FullBatchClusterOracle: String =
    s"""WITH RECURSIVE $shingleCte,
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            count(*) AS inter
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (SELECT doc_a, doc_b
          FROM inter
          JOIN sizes na ON doc_a = na.doc_id
          JOIN sizes nb ON doc_b = nb.doc_id
          WHERE CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE)
            >= 0.3),
        edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
        reach(node, lab) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node)
        SELECT node AS doc_id, min(lab) AS cluster_id
        FROM reach GROUP BY 1 ORDER BY 1"""

  private def clusterSafeSplitQs: Seq[Q] = Seq(
    // Degree assortativity of the near-dup graph (Newman's r over
    // edges, x/y = endpoint degrees): do high-degree template docs
    // link to each other (r>0, one mega-cluster forming) or to
    // one-off dups (r<0)? All moment sums exact BIGINT over the
    // |pairs| table; r itself is a fixed double-op sequence mirrored
    // token-for-token (the q135/q158 discipline). Degrees are one
    // hash aggregate over pair endpoints; no fact-table rescan.
    Q("q251_dup_graph_assortativity",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val pairs = Dedup.ngramJaccardPairs(docs, K,
            minJaccard = 0.3, maxDocFreq = MaxDocFreq)
          .select(col("doc_a"), col("doc_b")).persist()
        val deg = pairs.select(col("doc_a").as("id"))
          .union(pairs.select(col("doc_b").as("id")))
          .groupBy("id").agg(count(lit(1)).as("d"))
        val m = pairs
          .join(deg.select(col("id").as("doc_a"), col("d").as("da")),
            Seq("doc_a"))
          .join(deg.select(col("id").as("doc_b"), col("d").as("db")),
            Seq("doc_b"))
          .agg(count(lit(1)).as("m"),
            sum(col("da") * col("db")).as("sxy"),
            sum(col("da") + col("db")).as("ssum"),
            sum(col("da") * col("da") + col("db") * col("db"))
              .as("ssq"))
        val D = org.apache.spark.sql.types.DoubleType
        val mu = col("ssum").cast(D) / (col("m") * 2).cast(D)
        graft.operators.CacheOps.sealAndRelease(
          m.select(col("m"), col("sxy"), col("ssum"), col("ssq"),
            ((col("sxy").cast(D) / col("m").cast(D) - mu * mu) /
              (col("ssq").cast(D) / (col("m") * 2).cast(D) - mu * mu))
              .as("assortativity")),
          pairs)
      },
      Some(s"""WITH $shingleCte,
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            count(*) AS inter
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (SELECT doc_a, doc_b FROM inter
          JOIN sizes na ON doc_a = na.doc_id
          JOIN sizes nb ON doc_b = nb.doc_id
          WHERE CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE)
            >= 0.3),
        deg AS (SELECT id, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT doc_a AS id FROM pairs
            UNION ALL SELECT doc_b FROM pairs) GROUP BY 1),
        mm AS (SELECT CAST(count(*) AS BIGINT) AS m,
            CAST(sum(a.d * b.d) AS BIGINT) AS sxy,
            CAST(sum(a.d + b.d) AS BIGINT) AS ssum,
            CAST(sum(a.d * a.d + b.d * b.d) AS BIGINT) AS ssq
          FROM pairs p
          JOIN deg a ON a.id = p.doc_a
          JOIN deg b ON b.id = p.doc_b)
        SELECT m, sxy, ssum, ssq,
          (CAST(sxy AS DOUBLE) / CAST(m AS DOUBLE)
            - (CAST(ssum AS DOUBLE) / CAST(m * 2 AS DOUBLE))
              * (CAST(ssum AS DOUBLE) / CAST(m * 2 AS DOUBLE)))
          / (CAST(ssq AS DOUBLE) / CAST(m * 2 AS DOUBLE)
            - (CAST(ssum AS DOUBLE) / CAST(m * 2 AS DOUBLE))
              * (CAST(ssum AS DOUBLE) / CAST(m * 2 AS DOUBLE)))
            AS assortativity
        FROM mm""")),


    // Leakage-safe train/test split: hash-split by near-dup CLUSTER
    // (q70's connected components), not by document — every cluster
    // lands atomically in one split, so near-duplicates can never
    // straddle train/test (the contamination q71 measures post hoc is
    // prevented structurally). `rescued` marks docs whose naive
    // per-doc hash split disagrees with their cluster's — exactly the
    // leaks avoided. One md5 on the cluster id decides the split:
    // deterministic across runs, engines and partitionings.
    Q("q232_cluster_safe_split",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val pairs = Dedup.ngramJaccardPairs(docs, K,
          minJaccard = 0.3, maxDocFreq = MaxDocFreq)
        val comp = ConnectedComponents.components(pairs, "doc_a",
            "doc_b", nodes = Some(docs.select(col("doc_id"))))
          .select(col("node").as("doc_id"),
            col("component").as("cluster_id"))
        val hc = org.apache.spark.sql.functions.substring(
          org.apache.spark.sql.functions.md5(
            col("cluster_id").cast("string")), 1, 8)
        val hd = org.apache.spark.sql.functions.substring(
          org.apache.spark.sql.functions.md5(
            col("doc_id").cast("string")), 1, 8)
        import org.apache.spark.sql.functions.when
        comp
          .withColumn("split",
            when(hc < "19999999", "test").otherwise("train"))
          .withColumn("naive_split",
            when(hd < "19999999", "test").otherwise("train"))
          .withColumn("rescued", col("split") =!= col("naive_split"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $shingleCte,
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            count(*) AS inter
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (SELECT doc_a, doc_b
          FROM inter
          JOIN sizes na ON doc_a = na.doc_id
          JOIN sizes nb ON doc_b = nb.doc_id
          WHERE CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE)
            >= 0.3),
        edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
        reach(node, lab) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node),
        comp AS (SELECT node AS doc_id, min(lab) AS cluster_id
          FROM reach GROUP BY 1)
        SELECT doc_id, cluster_id,
          CASE WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8)
            < '19999999' THEN 'test' ELSE 'train' END AS split,
          CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
            < '19999999' THEN 'test' ELSE 'train' END AS naive_split,
          (CASE WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8)
            < '19999999' THEN 'test' ELSE 'train' END) <>
          (CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
            < '19999999' THEN 'test' ELSE 'train' END) AS rescued
        FROM comp ORDER BY doc_id""")),

    // URL canonicalization + keeper dedup — the first pass of every
    // web-corpus pipeline (CommonCrawl-style): the same page arrives
    // under scheme/host case variants, an explicit default port,
    // tracking parameters (utm_*, fbclid), unordered query strings,
    // /index.html vs trailing-slash path spellings, and fragments.
    // Canonicalize (lowercase scheme+host, strip :443, drop fragment
    // and tracking params, sort surviving params, normalize the path
    // tail), then keep min(doc_id) per canonical URL. URLs are
    // synthesized deterministically from doc_id (the documents table
    // carries none — the packEncodedMedia convention), cycling
    // through ALL the variant classes so each rule is exercised; the
    // oracle re-canonicalizes from scratch in DuckDB, so every rule
    // sits under the hash. Note both engines treat LIKE '_' as a
    // single-char wildcard — identical on both sides, and the broader
    // match is correct canonicalizer behavior anyway (utm.anything is
    // tracking). Scale shape: synthesis + canonicalization are pure
    // row-local expressions; the keeper pass is ONE map-side-
    // combinable aggregate on the canonical key plus a keyed join —
    // the exact-dedup shape (q21), no window, nothing corpus².
    Q("q257_url_canonical_dedup",
      (s, dir) => {
        import org.apache.spark.sql.functions.{
          concat, when, lower, regexp_extract, regexp_replace, expr,
          element_at, split, coalesce, min}
        val id = col("doc_id")
        val url = concat(
          lit("HTTPS://WWW.Site"), (id % 8).cast("string"),
          lit(".EXAMPLE.com:443/cat/"), (id % 6).cast("string"),
          when(id % 3 === 0, "/").when(id % 3 === 1, "")
            .otherwise("/index.html"),
          lit("?"),
          when(id % 2 === 0, concat(lit("utm_source=feed&id="),
            (id % 12).cast("string"), lit("&utm_medium=rss")))
            .otherwise(concat(lit("id="), (id % 12).cast("string"),
              lit("&fbclid=XYZ"), (id % 5).cast("string"))),
          when(id % 4 === 0, "#sec").otherwise(""))
        val canon = Tables.load(s, dir, "documents")
          .select(col("doc_id"), url.as("url"))
          .withColumn("u", element_at(split(col("url"), "#"), 1))
          .withColumn("pre", regexp_replace(
            lower(regexp_extract(col("u"), "^([^/]*//[^/]*)", 1)),
            ":443$", ""))
          .withColumn("rest",
            regexp_replace(col("u"), "^[^/]*//[^/]*", ""))
          .withColumn("path", regexp_replace(regexp_replace(
            element_at(split(col("rest"), "\\?"), 1),
            "/index\\.html$", ""), "/$", ""))
          .withColumn("cq", expr("array_join(array_sort(filter(" +
            "split(coalesce(element_at(split(rest, '\\\\?'), 2), ''), " +
            "'&'), x -> NOT (x LIKE 'utm_%' OR x LIKE 'fbclid=%' " +
            "OR x LIKE 'gclid=%'))), '&')"))
          .select(col("doc_id"), col("url"),
            concat(col("pre"),
              when(col("path") === "", "/").otherwise(col("path")),
              when(col("cq") === "", "")
                .otherwise(concat(lit("?"), col("cq"))))
              .as("canonical_url"))
        val keep = canon.groupBy("canonical_url")
          .agg(min(col("doc_id")).as("keeper_id"),
            count(lit(1)).as("dup_count"))
        canon.join(keep, "canonical_url")
          .select(col("doc_id"), col("url"), col("canonical_url"),
            col("keeper_id"), col("dup_count"),
            (col("doc_id") === col("keeper_id")).as("is_kept"))
          .orderBy("doc_id")
      },
      Some("""WITH raw AS (SELECT doc_id,
            'HTTPS://WWW.Site' || CAST(doc_id % 8 AS VARCHAR) ||
            '.EXAMPLE.com:443/cat/' || CAST(doc_id % 6 AS VARCHAR) ||
            (CASE WHEN doc_id % 3 = 0 THEN '/'
                  WHEN doc_id % 3 = 1 THEN ''
                  ELSE '/index.html' END) || '?' ||
            (CASE WHEN doc_id % 2 = 0
              THEN 'utm_source=feed&id=' || CAST(doc_id % 12 AS VARCHAR)
                || '&utm_medium=rss'
              ELSE 'id=' || CAST(doc_id % 12 AS VARCHAR)
                || '&fbclid=XYZ' || CAST(doc_id % 5 AS VARCHAR) END) ||
            (CASE WHEN doc_id % 4 = 0 THEN '#sec' ELSE '' END) AS url
          FROM documents),
        c1 AS (SELECT doc_id, url,
            string_split(url, '#')[1] AS u
          FROM raw),
        c2 AS (SELECT doc_id, url, u,
            regexp_replace(lower(regexp_extract(u,
              '^([^/]*//[^/]*)', 1)), ':443$', '') AS pre,
            regexp_replace(u, '^[^/]*//[^/]*', '') AS rest
          FROM c1),
        c3 AS (SELECT doc_id, url, pre,
            regexp_replace(regexp_replace(
              string_split(rest, '?')[1],
              '/index\.html$', ''), '/$', '') AS path,
            array_to_string(list_sort(list_filter(
              string_split(coalesce(string_split(rest, '?')[2], ''),
                '&'),
              x -> NOT (x LIKE 'utm_%' OR x LIKE 'fbclid=%'
                OR x LIKE 'gclid=%'))), '&') AS cq
          FROM c2),
        canon AS (SELECT doc_id, url,
            pre || (CASE WHEN path = '' THEN '/' ELSE path END) ||
              (CASE WHEN cq = '' THEN ''
                    ELSE '?' || cq END) AS canonical_url
          FROM c3),
        keep AS (SELECT canonical_url,
            CAST(min(doc_id) AS BIGINT) AS keeper_id,
            CAST(count(*) AS BIGINT) AS dup_count
          FROM canon GROUP BY 1)
        SELECT c.doc_id, c.url, c.canonical_url, k.keeper_id,
          k.dup_count, c.doc_id = k.keeper_id AS is_kept
        FROM canon c JOIN keep k USING (canonical_url)
        ORDER BY c.doc_id""")),

    // Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003, the
    // MOSS algorithm) — local document fingerprinting with a
    // GUARANTEE the shingle family can't give: any shared substring
    // of at least w+k-1 tokens leaves at least one shared selected
    // fingerprint, while storing only ~1/w of the k-gram hashes.
    // Selection is entirely row-local (hash every k-gram, keep the
    // minimum of each w-window; ties can't change the SELECTED VALUE
    // set, so rightmost-vs-leftmost tie policy is moot after the
    // distinct); the cross-doc phase is the standard keyed
    // fingerprint self-join — Σ df² bounded by the hot-fingerprint
    // cap, never doc×doc. md5-prefix hashes keep the selection
    // oracle-replayable: lexicographic min over hex strings is a
    // total order shared by both engines.
    Q("q291_winnowing_pairs",
      (s, dir) => {
        val Kg = 4 // tokens per gram
        val W = 5 // winnowing window (guarantee length = W + Kg - 1)
        val toks = split(col("text"), " ")
        val n = size(toks)
        // guard: Spark's sequence() DESCENDS for stop < start, so
        // short docs need the explicit empty branch
        val grams = when(n >= Kg,
          transform(sequence(lit(0), n - Kg),
            i => substring(
              md5(concat_ws(" ", slice(toks, i + 1, lit(Kg)))), 1, 16)))
          .otherwise(array().cast("array<string>"))
        val d = graft.sources.ScanSpread
          .spread(Tables.load(s, dir, "documents"))
          .select(col("doc_id"), grams.as("hs"))
          .withColumn("m", size(col("hs")))
        val fps = when(col("m") >= W,
          array_distinct(transform(sequence(lit(0), col("m") - W),
            j => array_min(slice(col("hs"), j + 1, lit(W))))))
          .otherwise(array().cast("array<string>"))
        val docFp = d.select(col("doc_id"), explode(fps).as("fp"))
        // hot-fingerprint cap: the shared operator (q70 convention —
        // engaged so the bench measures the honest plan, far above
        // any fixture df), which also carries the CapMetrics
        // telemetry; persisted because BOTH sides of the pair join
        // read it (the winnowing HOF chain is too expensive to
        // recompute for a diamond)
        val keep = Dedup.capDocFreq(docFp, MaxDocFreq, "fp").persist()
        val out = keep.select(col("doc_id").as("doc_a"), col("fp"))
          .join(keep.select(col("doc_id").as("doc_b"), col("fp")),
            Seq("fp"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b")
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 2)
          .orderBy("doc_a", "doc_b")
        graft.operators.CacheOps.sealAndRelease(out, keep)
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws,
            len(string_split(text, ' ')) AS n FROM documents),
        g AS (SELECT doc_id,
            list_transform(range(1, n - 2), i ->
              substr(md5(array_to_string(ws[i:i+3], ' ')), 1, 16))
              AS hs
          FROM d WHERE n >= 4),
        w AS (SELECT doc_id,
            list_distinct(list_transform(range(1, len(hs) - 3), j ->
              list_min(hs[j:j+4]))) AS fps
          FROM g WHERE len(hs) >= 5),
        fp AS (SELECT doc_id, unnest(fps) AS fp FROM w),
        pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            CAST(count(*) AS BIGINT) AS n_shared
          FROM fp a JOIN fp b
            ON a.fp = b.fp AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b, n_shared FROM pairs
        WHERE n_shared >= 2 ORDER BY doc_a, doc_b""")),

    // Duplication-rate estimation from a HASH-SPACE sample — the
    // 100 TB answer to "how duplicated is this crawl?" without a full
    // dedup pass: sampling the FINGERPRINT space (fp prefix < 0x29,
    // a 41/256 ≈ 16% slice) keeps every duplicate GROUP intact or
    // drops it whole, so the sample's dup share is an unbiased
    // estimator of the corpus's — row sampling would shear groups
    // apart and systematically underestimate. Fingerprint =
    // md5(sorted distinct words): bag-of-words identity, the
    // template-page near-dup class. One aggregate builds the group
    // table; both censuses read it (persisted, released at the seal).
    Q("q292_sampled_dup_rate",
      (s, dir) => {
        val fp = md5(concat_ws(" ",
          array_sort(array_distinct(split(col("text"), " ")))))
        val g = Tables.load(s, dir, "documents")
          .groupBy(fp.as("fp"))
          .agg(count(lit(1)).as("c"))
          .persist()
        val full = g.agg(sum("c").as("n_docs"),
          sum(col("c") - 1).as("dups"))
        val samp = g.filter(substring(col("fp"), 1, 2) < "29")
          .agg(sum("c").as("n_sample_docs"),
            sum(col("c") - 1).as("sample_dups"))
        val out = full.crossJoin(broadcast(samp))
          .select(col("n_docs"),
            (col("dups").cast(DoubleType) /
              col("n_docs").cast(DoubleType)).as("full_dup_rate"),
            col("n_sample_docs"),
            (col("sample_dups").cast(DoubleType) /
              col("n_sample_docs").cast(DoubleType))
              .as("sample_dup_rate"))
        graft.operators.CacheOps.sealAndRelease(out, g)
      },
      Some("""WITH f AS (SELECT doc_id,
            md5(array_to_string(list_sort(list_distinct(
              string_split(text, ' '))), ' ')) AS fp
          FROM documents),
        g AS (SELECT fp, CAST(count(*) AS BIGINT) AS c
          FROM f GROUP BY 1),
        fs AS (SELECT CAST(sum(c) AS BIGINT) AS n_docs,
            CAST(sum(c - 1) AS BIGINT) AS dups FROM g),
        sm AS (SELECT CAST(sum(c) AS BIGINT) AS n_sample_docs,
            CAST(sum(c - 1) AS BIGINT) AS sample_dups
          FROM g WHERE substr(fp, 1, 2) < '29')
        SELECT n_docs,
          CAST(dups AS DOUBLE) / CAST(n_docs AS DOUBLE)
            AS full_dup_rate,
          n_sample_docs,
          CAST(sample_dups AS DOUBLE) / CAST(n_sample_docs AS DOUBLE)
            AS sample_dup_rate
        FROM fs, sm""")),

    // Per-source duplication census — the report a mixture designer
    // reads before weighting sources (q283/q216): how much of each
    // source is redundant against the WHOLE corpus, not just itself.
    // A doc is redundant when its fingerprint's canonical copy
    // (min doc_id across ALL sources) is some other doc. Shape: one
    // fingerprint aggregate, one keyed join back on the fingerprint
    // (never source × source, never doc × doc), one per-source
    // roll-up — at 100 TB the fingerprint table is the only wide
    // frame and it shuffles once. Same bag-of-words fingerprint
    // family as q292.
    Q("q294_source_dup_census",
      (s, dir) => {
        val fp = md5(concat_ws(" ",
          array_sort(array_distinct(split(col("text"), " ")))))
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"), fp.as("fp"))
        val canon = d.groupBy("fp").agg(min("doc_id").as("keeper"))
        d.join(canon, Seq("fp"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("doc_id") =!= col("keeper"), 1L)
              .otherwise(0L)).as("n_redundant"))
          .withColumn("dup_share",
            col("n_redundant").cast(DoubleType) /
              col("n_docs").cast(DoubleType))
          .orderBy("source")
      },
      Some("""WITH f AS (SELECT doc_id, source,
            md5(array_to_string(list_sort(list_distinct(
              string_split(text, ' '))), ' ')) AS fp
          FROM documents),
        canon AS (SELECT fp, CAST(min(doc_id) AS BIGINT) AS keeper
          FROM f GROUP BY 1)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END)
            AS BIGINT) AS n_redundant,
          CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END)
              AS DOUBLE) / CAST(count(*) AS DOUBLE) AS dup_share
        FROM f JOIN canon USING (fp)
        GROUP BY 1 ORDER BY source"""))
  ,

    // Hot-shingle cap census with the cap ENGAGED on the real corpus
    // (r17 verdict #3): every other cap site runs far above fixture
    // frequencies, so three rounds of BENCH_metrics showed
    // dropped_rows=0 and no artifact ever proved the truncation
    // counters count. This query runs capDocFreq at maxDocFreq=6 —
    // BELOW the corpus's hottest boilerplate shingles at every SF
    // (max doc-freq: 9 at sf0.001, 7 at sf0.01, 25 at sf0.1) — so the
    // committed bench recording carries a provably NONZERO
    // caps.docfreq.dropped_rows, and the oracle expresses the cap
    // itself (per-shingle doc-frequency filter), keeping the result
    // hash-exact under truncation. The census is what an operator
    // reads after a capped dedup pass: per document, how many of its
    // distinct shingles survived and how many were dropped as hot.
    Q("q332_capped_shingle_census",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val sh = Dedup.shingleSets(docs, K)
        val kept = Dedup.capDocFreq(sh, cap = 6, keyCol = "shingle")
          .groupBy("doc_id").agg(count(lit(1)).as("n_kept"))
        Dedup.shingleSets(docs, K)
          .groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
          .join(kept, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_shingles"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            (col("n_shingles") - coalesce(col("n_kept"), lit(0L)))
              .as("n_hot_dropped"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $shingleCte,
        f AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
        kept AS (SELECT sh.doc_id FROM sh JOIN f USING (shingle)
          WHERE f.df <= 6),
        k AS (SELECT doc_id, count(*) AS n_kept FROM kept GROUP BY 1),
        tot AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY 1)
        SELECT tot.doc_id, tot.n_shingles,
          coalesce(k.n_kept, 0) AS n_kept,
          tot.n_shingles - coalesce(k.n_kept, 0) AS n_hot_dropped
        FROM tot LEFT JOIN k USING (doc_id) ORDER BY tot.doc_id"""))
  ,

    // PAIR-side cap engaged on the real corpus (r18 verdict #3 — the
    // q332 pattern applied to the quadratic step itself): q24 runs
    // minHashLsh with maxBucketWidth far above fixture widths, so no
    // committed artifact ever showed the w² bomb guard truncating.
    // This query runs the SAME operator at maxBucketWidth=2 — BELOW
    // the corpus's widest band bucket at every SF (max width: 4 at
    // sf0.001, 3 at sf0.01, 13 at sf0.1; buckets wider than 2:
    // 8/4/89) — so the bench recording carries a provably NONZERO
    // caps.minhash dropped_rows on the pair path, and the oracle
    // expresses the cap (band buckets wider than 2 are excluded from
    // the pair universe before the bucket self-join), keeping the
    // pair set hash-exact under truncation. Semantics under the cap
    // are the standard LSH trade: a pair is lost only if EVERY bucket
    // it shares is oversized — i.e. it sits inside a bigger-than-cap
    // near-identical cluster, which needs cluster-level handling, not
    // pairwise output. At 100 TB this cap is what bounds one
    // boilerplate template's w² pair blowup on a single reducer.
    Q("q334_capped_lsh_pairs",
      (s, dir) => {
        Dedup.minHashLsh(Tables.load(s, dir, "documents"),
            K, NumHashes, Bands, maxBucketWidth = EngagedBucketWidth)
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH ${lshSigBandCtes("documents")},
        bw AS (SELECT band, bkey, count(*) AS w FROM bands
          GROUP BY 1, 2),
        kept AS (SELECT b.doc_id, b.band, b.bkey FROM bands b
          JOIN bw USING (band, bkey) WHERE bw.w <= $EngagedBucketWidth),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM kept a JOIN kept b
            ON a.band = b.band AND a.bkey = b.bkey
              AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
          CAST($lshAgreeSql AS DOUBLE) / ${NumHashes}.0 AS est_jaccard
        FROM cand
        JOIN sig sa ON doc_a = sa.doc_id
        JOIN sig sb ON doc_b = sb.doc_id
        ORDER BY doc_a, doc_b"""))
  )
}
