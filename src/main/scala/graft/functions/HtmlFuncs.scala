package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML scrape surface (SURVEY §2 S11): tag stripping, entity decode,
  * link/title extraction — the engine-side generalization of the
  * reference's bs4/regex page scraping (reference: `windmodel.py:47-58`
  * enumerating hrefs, `eview.py:39-42` pulling values out of markup).
  *
  * Everything is built from Spark's codegen'd `regexp_*` built-ins —
  * no UDF, no external parser — so extraction inlines into
  * whole-stage codegen and runs as a pure map over the corpus: the
  * right 100 TB posture for web-crawl text extraction. Patterns stay
  * inside the RE2-compatible subset (no backreferences) so the DuckDB
  * oracle replays them verbatim.
  */
object HtmlFuncs {

  /** script/style blocks die FIRST (their bodies may contain literal
    * tags and comparison operators that would confuse the generic tag
    * strip), then comments, then tags, then entities — `&amp;` LAST
    * so `&amp;lt;` decodes to `&lt;`, not `<`. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val ent = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) =>
        regexp_replace(c, java.util.regex.Pattern.quote(e),
          java.util.regex.Matcher.quoteReplacement(r)) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** Mirrors [[htmlToText]] in DuckDB (RE2; 'g' = replace-all). */
  def htmlToTextSql(e: String): String = {
    val noScript =
      s"regexp_replace($e, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
    val noStyle = s"regexp_replace($noScript, " +
      "'(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    val noComment =
      s"regexp_replace($noStyle, '(?s)<!--.*?-->', ' ', 'g')"
    val noTags = s"regexp_replace($noComment, '<[^>]+>', ' ', 'g')"
    val ent = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "''", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (pat, r)) =>
        s"replace($c, '$pat', '$r')" }
    s"trim(regexp_replace($ent, '\\s+', ' ', 'g'))"
  }

  /** Every double-quoted href value, in document order. Wild HTML
    * (q293's DocBook fixture) writes `HREF="..."` — attribute names
    * are case-insensitive per the HTML spec, so the match is too. */
  def links(html: Column): Column =
    regexp_extract_all(html, lit("(?i)href=\"([^\"]*)\""), lit(1))

  def linksSql(e: String): String =
    s"regexp_extract_all($e, '(?i)href=\"([^\"]*)\"', 1)"

  /** Wild HTML (the SGML-ish DocBook output in q293's fixture) puts
    * NEWLINES inside the tag itself (`<TITLE\n>` ... `</TITLE\n>`),
    * so both the open and close tags admit a whitespace-led
    * attribute run before `>` — but ONLY whitespace-led: the tag
    * name must end at whitespace or `>` (DocBook's `<TITLEABBREV>`
    * must not match), per the HTML tag-name grammar. */
  def title(html: Column): Column =
    regexp_extract(html,
      "(?is)<title(?:\\s[^>]*)?>(.*?)</title(?:\\s[^>]*)?>", 1)

  def titleSql(e: String): String =
    s"regexp_extract($e, " +
      "'(?is)<title(?:\\s[^>]*)?>(.*?)</title(?:\\s[^>]*)?>', 1)"

  /** Host of an absolute URL ('' when the URL is relative). URI
    * schemes are case-insensitive (RFC 3986) — wild markup writes
    * `HTTP://`. */
  def host(url: Column): Column =
    regexp_extract(url, "^(?i)[a-z][a-z0-9+.-]*://([^/]+)", 1)

  def hostSql(e: String): String =
    s"regexp_extract($e, '^(?i)[a-z][a-z0-9+.-]*://([^/]+)', 1)"

  /** Deterministic HTML page rendered from document columns — the
    * fixture side of the S11 queries (both engines build the
    * IDENTICAL page; the extractors above are the operator under
    * test). Deliberately adversarial: the script body contains a
    * literal `"</p>"` string and a bare `<` comparison, the footer
    * an entity the decoder does not know (`&copy;` must pass
    * through untouched). */
  def renderPage(docId: Column, source: Column, text: Column): Column =
    concat(
      lit("<html><head><title>Doc "), docId.cast("string"),
      lit(" &amp; notes</title><style>body { margin: 0; }</style>" +
        "<script type=\"text/javascript\">var t = \"</p>\"; " +
        "if (1 < 3) { t = t + \"x\"; }</script></head><body>" +
        "<nav><a href=\"https://portal.example.org/home\">home</a> " +
        "<a href=\"https://portal.example.org/about\">about</a></nav>" +
        "<h1>Doc "), docId.cast("string"), lit("</h1><p>"),
      regexp_replace(text, "\\. ", ".</p><p>"),
      lit("</p><a href=\"https://mirror-"),
      (docId % 7).cast("string"),
      lit(".example.net/d/"), docId.cast("string"),
      lit("\">mirror</a><footer>&copy; "), source,
      lit(" &#39;26</footer></body></html>"))

  /** Mirrors [[renderPage]] in DuckDB. */
  def renderPageSql(docId: String, source: String, text: String): String =
    s"'<html><head><title>Doc ' || CAST($docId AS VARCHAR) || " +
      "' &amp; notes</title><style>body { margin: 0; }</style>" +
      "<script type=\"text/javascript\">var t = \"</p>\"; " +
      "if (1 < 3) { t = t + \"x\"; }</script></head><body>" +
      "<nav><a href=\"https://portal.example.org/home\">home</a> " +
      "<a href=\"https://portal.example.org/about\">about</a></nav>" +
      s"<h1>Doc ' || CAST($docId AS VARCHAR) || '</h1><p>' || " +
      s"regexp_replace($text, '\\. ', '.</p><p>', 'g') || " +
      s"'</p><a href=\"https://mirror-' || " +
      s"CAST($docId % 7 AS VARCHAR) || '.example.net/d/' || " +
      s"CAST($docId AS VARCHAR) || '\">mirror</a><footer>&copy; ' || " +
      s"$source || ' &#39;26</footer></body></html>'"
}
