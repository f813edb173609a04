package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.Tables
import graft.functions.HtmlFuncs

/** Web-corpus extraction + statistical gating, round 12 batch three:
  * the S11 HTML scrape surface done engine-side (tag strip / entity
  * decode / link + title extraction as codegen'd regexp chains — a
  * pure map at 100 TB), Wilson-LCB keep-rate gating, and per-source
  * KL divergence for mixture balancing. The HTML fixtures are
  * rendered deterministically from document columns INSIDE the query
  * (both engines build the identical page; the extractors are the
  * operator under test — reference scrapes pages the same way with
  * bs4/regex, `windmodel.py:47-58`).
  */
object WebOps {

  private def lnq(c: Column) =
    log(c).cast(DecimalType(18, 6)).cast(DoubleType)

  private def lnqSql(e: String) =
    s"CAST(CAST(ln($e) AS DECIMAL(18,6)) AS DOUBLE)"

  private def exactSum(c: Column) =
    sum(c.cast(DecimalType(38, 12))).cast(DoubleType)

  private def exactSumSql(e: String) =
    s"CAST(sum(CAST($e AS DECIMAL(38,12))) AS DOUBLE)"

  val qs: Seq[Q] = Seq(

    // HTML -> text extraction: strip script/style/comments/tags,
    // decode entities, pull title and links — the web-crawl text
    // extraction primitive. Adversarial page: the script body holds a
    // literal "</p>" and a bare `<`; an unknown entity (&copy;) must
    // pass through undecoded. Zero joins, zero windows — extraction
    // inlines into whole-stage codegen as a map over the corpus.
    Q("q276_html_extract",
      (s, dir) => {
        val page = HtmlFuncs.renderPage(
          col("doc_id"), col("source"), col("text"))
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), page.as("html"))
          .select(col("doc_id"),
            HtmlFuncs.title(col("html")).as("title"),
            size(HtmlFuncs.links(col("html"))).cast(LongType)
              .as("n_links"),
            length(col("html")).cast(LongType).as("html_len"),
            HtmlFuncs.htmlToText(col("html")).as("clean"))
          .select(col("doc_id"), col("title"), col("n_links"),
            col("html_len"),
            length(col("clean")).cast(LongType).as("text_len"),
            (length(col("clean")).cast(DoubleType) /
              col("html_len").cast(DoubleType)).as("text_ratio"),
            substring(col("clean"), 1, 80).as("lead80"))
          .orderBy("doc_id")
      },
      Some {
        val page = HtmlFuncs.renderPageSql("doc_id", "source", "text")
        s"""WITH h AS (SELECT doc_id, $page AS html FROM documents),
          c AS (SELECT doc_id,
              ${HtmlFuncs.titleSql("html")} AS title,
              CAST(len(${HtmlFuncs.linksSql("html")}) AS BIGINT)
                AS n_links,
              CAST(length(html) AS BIGINT) AS html_len,
              ${HtmlFuncs.htmlToTextSql("html")} AS clean
            FROM h)
          SELECT doc_id, title, n_links, html_len,
            CAST(length(clean) AS BIGINT) AS text_len,
            CAST(length(clean) AS DOUBLE) / CAST(html_len AS DOUBLE)
              AS text_ratio,
            substr(clean, 1, 80) AS lead80
          FROM c ORDER BY doc_id"""
      }),

    // Link-host aggregation over the extracted hrefs — the crawl
    // frontier / outlink-graph primitive. explode(links) -> host
    // extraction (still row-local regexp) -> ONE hash aggregate on
    // the host key. At 100 TB the page payload dies at the extract;
    // only (host, doc_id) pairs shuffle.
    Q("q277_link_hosts",
      (s, dir) => {
        val page = HtmlFuncs.renderPage(
          col("doc_id"), col("source"), col("text"))
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            explode(HtmlFuncs.links(page)).as("url"))
          .select(col("doc_id"), HtmlFuncs.host(col("url")).as("host"))
          .filter(col("host") =!= "")
          .groupBy("host")
          .agg(count(lit(1)).as("n_links"),
            countDistinct(col("doc_id")).as("n_docs"))
          .orderBy("host")
      },
      Some {
        val page = HtmlFuncs.renderPageSql("doc_id", "source", "text")
        s"""WITH h AS (SELECT doc_id, $page AS html FROM documents),
          u AS (SELECT doc_id,
              unnest(${HtmlFuncs.linksSql("html")}) AS url
            FROM h),
          e AS (SELECT doc_id, ${HtmlFuncs.hostSql("url")} AS host
            FROM u)
          SELECT host, CAST(count(*) AS BIGINT) AS n_links,
            CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM e WHERE host <> '' GROUP BY 1 ORDER BY host"""
      }),

    // Wilson lower confidence bound (z = 1.96) on each source's
    // keep rate — the public recipe for gating noisy quality signals
    // without over-trusting small sources: a source keeping 3/3 docs
    // scores BELOW one keeping 90/100. Keep = length + lexical
    // diversity cuts. One hash aggregate to exact (k, n) per source;
    // the bound is pure double arithmetic on those exact ints (IEEE
    // ops are exactly rounded, so the identical expression tree
    // hash-matches without decimal staging).
    Q("q278_wilson_quality",
      (s, dir) => {
        val ws = split(col("text"), " ")
        val keep = (col("n_chars") >= 200L &&
          size(array_distinct(ws)).cast(DoubleType) >=
            size(ws).cast(DoubleType) * 0.4).cast(LongType)
        val agg = Tables.load(s, dir, "documents")
          .select(col("source"), keep.as("keep"))
          .groupBy("source")
          .agg(count(lit(1)).as("n"), sum(col("keep")).as("k"))
        val z = lit(1.96)
        val nD = col("n").cast(DoubleType)
        val phat = col("k").cast(DoubleType) / nD
        val z2 = z * z
        val center = phat + z2 / (lit(2.0) * nD)
        val margin = z * sqrt(
          (phat * (lit(1.0) - phat) + z2 / (lit(4.0) * nD)) / nD)
        val denom = lit(1.0) + z2 / nD
        agg.select(col("source"), col("n"), col("k"),
            phat.as("keep_rate"),
            ((center - margin) / denom).as("wilson_lcb"))
          .orderBy("source")
      },
      Some("""WITH a AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CASE WHEN n_chars >= 200 AND
                CAST(len(list_distinct(string_split(text, ' ')))
                  AS DOUBLE) >=
                CAST(len(string_split(text, ' ')) AS DOUBLE) * 0.4
              THEN 1 ELSE 0 END) AS BIGINT) AS k
          FROM documents GROUP BY 1)
        SELECT source, n, k,
          CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS keep_rate,
          ((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
              + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE)))
            - 1.96 * sqrt(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE)))
              / CAST(n AS DOUBLE)))
          / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)) AS wilson_lcb
        FROM a ORDER BY source""")),

    // Per-source KL divergence of the unigram distribution against
    // the full corpus — the mixture-balancing primitive (which
    // sources are distributional outliers?). q is the CORPUS
    // distribution (which contains the source), so q > 0 wherever
    // p > 0 and no smoothing is needed. Scale shape: one (source,
    // token) hash aggregate; the corpus table derives from IT (no
    // second scan); source totals broadcast; Σ p·ln(p/q) through
    // decimal partials with quantized logs.
    Q("q279_source_kl",
      (s, dir) => {
        val tf = Tables.load(s, dir, "documents")
          .select(col("source"),
            explode(split(col("text"), " ")).as("tok"))
          .groupBy("source", "tok")
          .agg(count(lit(1)).as("c"))
          .persist()
        val stot = tf.groupBy("source").agg(sum("c").as("st"))
        val ctf = tf.groupBy("tok").agg(sum("c").as("cc"))
        val ctot = ctf.agg(sum("cc").as("ct"))
        val p = col("c").cast(DoubleType) / col("st").cast(DoubleType)
        val q = col("cc").cast(DoubleType) / col("ct").cast(DoubleType)
        val out = tf.join(ctf, Seq("tok"))
          .join(broadcast(stot), Seq("source"))
          .crossJoin(broadcast(ctot))
          .withColumn("contrib", p * lnq(p / q))
          .groupBy("source")
          .agg(count(lit(1)).as("n_types"),
            exactSum(col("contrib")).as("kl"))
          .orderBy("source")
        graft.operators.CacheOps.sealAndRelease(out, tf)
      },
      Some(s"""WITH tf AS (SELECT source, t.tok AS tok,
            CAST(count(*) AS BIGINT) AS c
          FROM documents, UNNEST(string_split(text, ' ')) AS t(tok)
          GROUP BY 1, 2),
        stot AS (SELECT source, CAST(sum(c) AS BIGINT) AS st
          FROM tf GROUP BY 1),
        ctf AS (SELECT tok, CAST(sum(c) AS BIGINT) AS cc
          FROM tf GROUP BY 1),
        ctot AS (SELECT CAST(sum(cc) AS BIGINT) AS ct FROM ctf),
        j AS (SELECT tf.source,
            (CAST(c AS DOUBLE) / CAST(st AS DOUBLE))
              * ${lnqSql("(CAST(c AS DOUBLE) / CAST(st AS DOUBLE)) / " +
          "(CAST(cc AS DOUBLE) / CAST(ct AS DOUBLE))")} AS contrib
          FROM tf JOIN ctf USING (tok) JOIN stot USING (source), ctot)
        SELECT source, CAST(count(*) AS BIGINT) AS n_types,
          ${exactSumSql("contrib")} AS kl
        FROM j GROUP BY 1 ORDER BY source""")),

    // Domain-suffix blocklist filtering — the RefinedWeb/CCNet URL
    // gating step. Real blocklists run to millions of entries, far
    // past regex alternation or a broadcast IN-list: the scalable
    // recipe is to explode each host into its DNS suffix chain
    // (≤ #labels rows per URL, row-local) and equi-join the suffix
    // key against the blocklist — subdomains of a blocked domain
    // match its suffix automatically. The match is a keyed semi/left
    // join: never a scan of list × corpus. Fixture: q257's
    // deterministic URL shapes with an ads. subdomain stripe; a
    // 3-entry inline blocklist stands in for the list table.
    Q("q280_url_blocklist",
      (s, dir) => {
        val id = col("doc_id")
        val host = concat(
          when(id % 5 === 0, "ads.").otherwise(""),
          lit("site"), (id % 8).cast("string"), lit(".example.com"))
        val blocked = Seq("site3.example.com", "ads.site1.example.com",
          "tracker.example.net")
        import s.implicits._
        val bl = blocked.toDF("suffix")
        val parts = split(col("host"), "\\.")
        val sufs = transform(
          sequence(lit(1), size(parts)),
          i => concat_ws(".", slice(parts, i,
            size(parts) - i + lit(1))))
        val cand = Tables.load(s, dir, "documents")
          .select(col("doc_id"), host.as("host"))
          .select(col("doc_id"), col("host"),
            explode(sufs).as("suffix"))
          .join(broadcast(bl.withColumn("hit", lit(1))),
            Seq("suffix"), "left")
          .groupBy("doc_id", "host")
          .agg(min(when(col("hit").isNotNull, col("suffix")))
            .as("matched_suffix"))
          .withColumn("blocked", col("matched_suffix").isNotNull)
          .orderBy("doc_id")
        cand.select("doc_id", "host", "blocked", "matched_suffix")
      },
      Some("""WITH u AS (SELECT doc_id,
            (CASE WHEN doc_id % 5 = 0 THEN 'ads.' ELSE '' END)
              || 'site' || CAST(doc_id % 8 AS VARCHAR)
              || '.example.com' AS host
          FROM documents),
        bl AS (SELECT * FROM (VALUES ('site3.example.com'),
            ('ads.site1.example.com'),
            ('tracker.example.net')) t(suffix)),
        p AS (SELECT doc_id, host, string_split(host, '.') AS parts,
            len(string_split(host, '.')) AS n FROM u),
        sfx AS (SELECT doc_id, host,
            array_to_string(parts[i:n], '.') AS suffix
          FROM p, UNNEST(range(1, n + 1)) AS t(i)),
        m AS (SELECT sfx.doc_id, sfx.host,
            min(CASE WHEN bl.suffix IS NOT NULL THEN sfx.suffix END)
              AS matched_suffix
          FROM sfx LEFT JOIN bl USING (suffix)
          GROUP BY 1, 2)
        SELECT doc_id, host,
          matched_suffix IS NOT NULL AS blocked, matched_suffix
        FROM m ORDER BY doc_id"""))
  )
}
