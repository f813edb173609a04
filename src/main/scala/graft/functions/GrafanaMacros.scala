package graft.functions

/** Grafana/Postgres dashboard-macro expansion → Spark SQL text, so the
  * reference's provisioned dashboard queries run VERBATIM through
  * `spark.sql` (reference: `entsoe.json` rawSql panels use
  * `$__timeGroupAlias(index,$__interval)`, `$__timeFilter(index)`,
  * `$__interval_ms`; `refit.json`, gas dashboards likewise).
  *
  * Expansion targets the engine's registered SQL surface:
  * `$__timeGroup[Alias]` → [[TimeFuncs]]' `time_bucket_s` (call
  * `TimeFuncs.register(spark)` first). Postgres double-quoted
  * identifiers — which the dashboards use for aliases and odd column
  * names like `"fossil_brown_coal/lignite"` — are rewritten to Spark
  * backticks; single-quoted strings are left untouched.
  */
object GrafanaMacros {

  /** Grafana interval literal → seconds ("500ms" floors to 1s, the
    * engine's minimum bucket). Dashboards quote the argument form
    * ($__timeGroup(col,'1h')), so surrounding single quotes are
    * accepted. */
  def intervalSeconds(interval: String): Long = {
    val bare = interval.trim.stripPrefix("'").stripSuffix("'").trim
    val m = "^(\\d+)(ms|s|m|h|d)$".r.findFirstMatchIn(bare)
      .getOrElse(throw new IllegalArgumentException(
        s"unparseable Grafana interval: '$interval'"))
    val n = m.group(1).toLong
    m.group(2) match {
      case "ms" => math.max(1L, n / 1000)
      case "s" => n
      case "m" => n * 60
      case "h" => n * 3600
      case "d" => n * 86400
    }
  }

  private val TimeGroupAlias =
    "\\$__timeGroupAlias\\(([^,)]+),\\s*([^)]+)\\)".r
  private val TimeGroup =
    "\\$__timeGroup\\(([^,)]+),\\s*([^)]+)\\)".r
  private val TimeFilter = "\\$__timeFilter\\(([^)]+)\\)".r
  private val UnixEpochFilter = "\\$__unixEpochFilter\\(([^)]+)\\)".r

  /** Rewrite postgres `"identifier"` quoting to Spark backticks while
    * leaving single-quoted string literals untouched — a literal like
    * `'say "hi"'` must not be rewritten, so this is a scanner, not a
    * regex (`''` is the literal-escape for a quote inside a string). */
  private def rewriteQuotedIdents(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        out.append(c)
        if (c == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') {
            out.append('\''); i += 1 // escaped '' stays inside
          } else inStr = false
        }
      } else c match {
        case '\'' => inStr = true; out.append(c)
        case '"' => out.append('`')
        case other => out.append(other)
      }
      i += 1
    }
    out.toString
  }

  /** Expand every macro the reference's dashboards use. `from`/`to` are
    * naive UTC timestamps ('yyyy-MM-dd HH:mm:ss'), `interval` a Grafana
    * literal like "1h" (the dashboard's resolved `$__interval`). */
  def expand(sql: String, from: String, to: String, interval: String)
      : String = {
    val sec = intervalSeconds(interval)

    def bucketSec(arg: String): Long =
      if (arg.trim == "$__interval") sec else intervalSeconds(arg)

    var s = sql
    s = s.replace("$__interval_ms", (sec * 1000).toString)
    s = TimeGroupAlias.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"time_bucket_s(${bucketSec(m.group(2))}, ${m.group(1)}) AS \"time\""))
    s = TimeGroup.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"time_bucket_s(${bucketSec(m.group(2))}, ${m.group(1)})"))
    s = TimeFilter.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"${m.group(1)} BETWEEN TIMESTAMP '$from' AND TIMESTAMP '$to'"))
    s = UnixEpochFilter.replaceAllIn(s, m => {
      val c = m.group(1)
      val f = java.time.LocalDateTime.parse(from.replace(' ', 'T'))
        .toEpochSecond(java.time.ZoneOffset.UTC)
      val t = java.time.LocalDateTime.parse(to.replace(' ', 'T'))
        .toEpochSecond(java.time.ZoneOffset.UTC)
      java.util.regex.Matcher.quoteReplacement(s"$c >= $f AND $c <= $t")
    })
    s = s.replace("$__timeFrom()", s"TIMESTAMP '$from'")
    s = s.replace("$__timeTo()", s"TIMESTAMP '$to'")
    s = s.replace("$__interval", interval)
    // postgres "identifier" quoting → Spark backticks, string literals
    // preserved
    rewriteQuotedIdents(s)
  }

  /** Substitute Grafana TEMPLATE variables (`$country`, `${country}`)
    * with literal values — the step Grafana itself performs before
    * handing rawSql to the datasource. Literal-aware, like Grafana's
    * raw interpolation: inside a single-quoted string the value is
    * spliced verbatim (`'$nuts_id%'` → `'DE%'`); outside, it is
    * emitted as a quoted SQL literal (`IN ($country)` → `IN ('DE')`),
    * so the result is always valid SQL. `$__` names are macros, never
    * template variables. */
  def substituteVars(sql: String, vars: Map[String, String]): String = {
    val out = new StringBuilder(sql.length)
    var i = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'') {
        if (inStr && i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
          out.append("''"); i += 2 // escaped quote stays inside
        } else { inStr = !inStr; out.append(c); i += 1 }
      } else if (c == '$' && i + 1 < sql.length) {
        var j = i + 1
        val braced = sql.charAt(j) == '{'
        if (braced) j += 1
        val start = j
        while (j < sql.length && (sql.charAt(j).isLetterOrDigit ||
          sql.charAt(j) == '_')) j += 1
        val name = sql.substring(start, j)
        if (braced && j < sql.length && sql.charAt(j) == '}') j += 1
        vars.get(name).filterNot(_ => name.startsWith("__")) match {
          case Some(v) =>
            val escaped = v.replace("'", "''")
            if (inStr) out.append(escaped)
            else out.append('\'').append(escaped).append('\'')
            i = j
          case None => out.append(c); i += 1
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Variable names referenced by a rawSql string (template vars only —
    * `$__` macros excluded). */
  def variableNames(sql: String): Set[String] =
    "\\$\\{?([A-Za-z_][A-Za-z0-9_]*)\\}?".r.findAllMatchIn(sql)
      .map(_.group(1)).filterNot(_.startsWith("__")).toSet
}
