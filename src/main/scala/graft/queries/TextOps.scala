package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables
import graft.functions.TextFuncs._

/** Text-analysis operators over the `documents` corpus: token counting,
  * quality scoring, language ID, exact dedup, fingerprinting. These are
  * the training-data-pipeline primitives (BASELINE.json north star); all
  * are single-pass, codegen'd column expressions — at 100 TB each is one
  * scan with no shuffle except the dedup's hash aggregation.
  */
object TextOps {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "que", "los", "una"),
    "fr" -> Seq("le", "les", "est", "une", "dans"),
    "en" -> Seq("the", "a", "of", "and", "is"))

  val qs: Seq[Q] = Seq(

    // Token counting + length stats per document.
    Q("q18_text_stats",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(
            col("doc_id"),
            tokenCount(col("text")).cast("long").as("n_tokens"),
            length(col("text")).cast("long").as("len_chars"),
            avgWordLen(col("text")).as("avg_word_len"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
          len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
          length(text) AS len_chars,
          CAST(length(replace(text, ' ', '')) AS DOUBLE)
            / CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE)
            AS avg_word_len
        FROM documents ORDER BY doc_id""")),

    // Quality scoring: stopword ratio + length gates → keep flag
    // (standard corpus-filter heuristics).
    Q("q19_text_quality",
      (s, dir) => {
        val ratio = stopwordRatio(col("text"), stopwords)
        val nTok = tokenCount(col("text"))
        Tables.load(s, dir, "documents")
          .select(
            col("doc_id"), col("lang"),
            ratio.as("stop_ratio"),
            (nTok >= 20 && nTok <= 95 && ratio < lit(0.5)).as("keep"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, lang,
          CAST(len(list_filter(string_split(text, ' '),
              w -> w IN (${stopwords.map(w => s"'$w'").mkString(", ")})))
            AS DOUBLE)
            / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)
            AS stop_ratio,
          (len(regexp_split_to_array(trim(text), '\\s+')) BETWEEN 20 AND 95)
            AND (CAST(len(list_filter(string_split(text, ' '),
                w -> w IN (${stopwords.map(w => s"'$w'").mkString(", ")})))
              AS DOUBLE)
              / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)
              < 0.5) AS keep
        FROM documents ORDER BY doc_id""")),

    // Marker-word language ID (n-gram heuristic). Accuracy on synthetic
    // word-salad text is incidental — the operator and its determinism
    // are what the oracle checks.
    Q("q20_lang_id",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(
            col("doc_id"), col("lang"),
            langId(col("text"), langMarkers).as("pred_lang"))
          .orderBy("doc_id")
      },
      Some {
        val padded = "' ' || text || ' '"
        def score(ws: Seq[String]) = ws.map(w =>
          s"(CASE WHEN position(' $w ' IN $padded) > 0 THEN 1 ELSE 0 END)")
          .mkString(" + ")
        val scores = langMarkers.map { case (l, ws) => l -> score(ws) }
        val best = "GREATEST(" + scores.map(_._2).mkString(", ") + ")"
        val cases = scores.map { case (l, sc) =>
          s"WHEN ($sc) = _best AND _best > 0 THEN '$l'"
        }.mkString(" ")
        s"""SELECT doc_id, lang,
            CASE $cases ELSE 'und' END AS pred_lang
          FROM (SELECT doc_id, lang, text, $best AS _best FROM documents)
          ORDER BY doc_id"""
      }),

    // Exact dedup: md5 content hash + duplicate-group size per doc.
    // Distributed hash-groupBy — at 100 TB this is one shuffle keyed on
    // a 128-bit hash, never a global sort.
    Q("q21_dedup_exact",
      (s, dir) => {
        val w = Window.partitionBy(col("fp"))
        Tables.load(s, dir, "documents")
          .withColumn("fp", md5(col("text")))
          .withColumn("dup_cnt", count(lit(1)).over(w))
          .withColumn("keeper", min(col("doc_id")).over(w))
          .select("doc_id", "fp", "dup_cnt", "keeper")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, fp, dup_cnt, keeper FROM (
          SELECT doc_id, md5(text) AS fp,
            count(*) OVER (PARTITION BY md5(text)) AS dup_cnt,
            min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
          FROM documents) ORDER BY doc_id""")),

    // BPE-style token accounting: tokens under the GPT-2-family
    // pre-tokenizer regex (RE2-compatible subset — identical pattern on
    // both engines), total + distinct counts per document. The
    // per-document token cost is the budgeting primitive of every
    // training-data pipeline.
    Q("q54_token_regex",
      (s, dir) => {
        val toks = bpeTokens(col("text"))
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            size(toks).cast("long").as("n_bpe"),
            size(array_distinct(toks)).cast("long").as("n_uniq"))
          .orderBy("doc_id")
      },
      Some {
        val pat = bpePattern.replace("'", "''")
        s"""SELECT doc_id,
          len(regexp_extract_all(text, '$pat')) AS n_bpe,
          len(list_distinct(regexp_extract_all(text, '$pat'))) AS n_uniq
        FROM documents ORDER BY doc_id"""
      }),

    // Normalized fingerprint (case/punctuation-insensitive near-exact
    // dedup key).
    Q("q22_fingerprint",
      (s, dir) => {
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), fingerprint(col("text")).as("norm_fp"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
          md5(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) AS norm_fp
        FROM documents ORDER BY doc_id""")),

    // The END-TO-END training-corpus filter (C4-style): quality gate →
    // language gate → exact dedup (keep lowest id per content hash) →
    // MinHash-LSH near-dup removal (drop the greater id of every pair
    // with estimated jaccard ≥ 0.75) → per-label survivor/token
    // accounting. Every stage reuses an operator that is individually
    // oracle-checked (q19/q20/q21/q24); this query hash-checks their
    // COMPOSITION — the pipeline a 100 TB corpus actually runs, where
    // each stage is one scan or one hash shuffle.
    Q("q69_corpus_filter_pipeline",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val nTok = tokenCount(col("text"))
        val filtered = docs
          .withColumn("n_tokens", nTok.cast("long"))
          .filter(col("n_tokens") >= 20 && col("n_tokens") <= 95 &&
            stopwordRatio(col("text"), stopwords) < 0.5)
          .filter(langId(col("text"), langMarkers) === "en")
        val w = Window.partitionBy(md5(col("text")))
        val keepers = filtered
          .withColumn("_keeper", min(col("doc_id")).over(w))
          .filter(col("doc_id") === col("_keeper"))
          .drop("_keeper")
        val nearDupLosers = graft.operators.Dedup
          .minHashLsh(keepers.select("doc_id", "text"), 3, 8, 4,
            maxBucketWidth = 1 << 20)
          .filter(col("est_jaccard") >= 0.75)
          .select(col("doc_b").as("doc_id")).distinct()
        keepers.join(nearDupLosers, Seq("doc_id"), "left_anti")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"))
          .orderBy("lang")
      },
      Some {
        val stopList = stopwords.map(w => s"'$w'").mkString(", ")
        val stopRatio =
          s"""CAST(len(list_filter(string_split(text, ' '),
              w -> w IN ($stopList))) AS DOUBLE)
            / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)"""
        val padded = "' ' || text || ' '"
        def score(ws: Seq[String]) = ws.map(w =>
          s"(CASE WHEN position(' $w ' IN $padded) > 0 THEN 1 ELSE 0 END)")
          .mkString(" + ")
        val scores = langMarkers.map { case (l, ws) => l -> score(ws) }
        val best = "GREATEST(" + scores.map(_._2).mkString(", ") + ")"
        val langCases = scores.map { case (l, sc) =>
          s"WHEN ($sc) = _best AND _best > 0 THEN '$l'"
        }.mkString(" ")
        s"""WITH gated AS (
            SELECT doc_id, lang, text,
              len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
            FROM (SELECT doc_id, lang, text, $best AS _best FROM documents)
            WHERE len(regexp_split_to_array(trim(text), '\\s+'))
                BETWEEN 20 AND 95
              AND ($stopRatio) < 0.5
              AND (CASE $langCases ELSE 'und' END) = 'en'),
          kept AS (
            SELECT doc_id, lang, text, n_tokens FROM (
              SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS _k
              FROM gated)
            WHERE doc_id = _k),
          ${DedupOps.lshCandidateCtes("kept")},
          losers AS (SELECT DISTINCT doc_b AS doc_id FROM cand
            JOIN sig sa ON doc_a = sa.doc_id
            JOIN sig sb ON doc_b = sb.doc_id
            WHERE CAST(${DedupOps.lshAgreeSql} AS DOUBLE)
              / ${DedupOps.lshNumHashes}.0 >= 0.75)
          SELECT lang, count(*) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS total_tokens
          FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM losers)
          GROUP BY lang ORDER BY lang"""
      })
  )
}
