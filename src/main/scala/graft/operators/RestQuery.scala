package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PostgREST URL algebra → DataFrame plan (reference read surface #2,
  * SURVEY.md §3.3 / §2.10 Q9: `GET /consumption?select=DateTime,
  * power.sum()&DateTime=gte.'2012-01-01'&limit=10`).
  *
  * Supported (the reference's documented usage plus the standard
  * PostgREST operators around it):
  *   select=col, col.sum()/avg()/min()/max()/count()
  *   <col>=eq./gt./gte./lt./lte./neq./like./in.(a,b)/is.null
  *   <col>=not.<op>.<value> negation
  *   order=col[.asc|.desc][.nullsfirst|.nullslast], limit=N, offset=N
  * Aggregate selects imply grouping by the plain selected columns —
  * PostgREST's aggregate semantics (PGRST_DB_AGGREGATES_ENABLED).
  */
object RestQuery {

  private val AggRe = "^([A-Za-z_][A-Za-z0-9_]*)\\.(sum|avg|min|max|count)\\(\\)$".r

  /** The operator prefixes and reserved keys of the grammar above —
    * THE single source of truth; RpcRegistry classifies URL params
    * with these, so extending the grammar here extends dispatch
    * classification automatically (a hand-kept copy drifted once). */
  val FilterOps: Set[String] =
    Set("eq", "neq", "gt", "gte", "lt", "lte", "like", "in", "is", "not")
  val ReservedKeys: Set[String] = Set("select", "order", "limit", "offset")

  def apply(table: DataFrame, queryString: String): DataFrame =
    apply(table, queryString.split("&").filter(_.nonEmpty).toSeq.map { kv =>
      val i = kv.indexOf('=')
      if (i < 0) kv -> "" else kv.substring(0, i) -> kv.substring(i + 1)
    })

  /** Structured form: callers that percent-decode (RpcRegistry) pass
    * key/value pairs directly, so decoded values containing `&`/`=`
    * can't corrupt re-parsing. */
  def apply(table: DataFrame, params: Seq[(String, String)]): DataFrame = {
    var df = table

    // predicates (any param that is not select/order/limit/offset)
    def predicate(c: Column, v: String): Column = {
      val dot = v.indexOf('.')
      val (op, rawValue) =
        if (dot >= 0) (v.substring(0, dot), v.substring(dot + 1))
        else ("eq", v)
      val value = rawValue.stripPrefix("'").stripSuffix("'")
      op match {
        case "not" => !predicate(c, rawValue)
        case "eq" => c === value
        case "neq" => c =!= value
        case "gt" => c > value
        case "gte" => c >= value
        case "lt" => c < value
        case "lte" => c <= value
        case "like" => c.like(value.replace("*", "%"))
        case "is" if value == "null" => c.isNull
        // null-safe equality: IS [NOT] TRUE must treat NULL as
        // not-true (so not.is.true INCLUDES null rows, like postgres);
        // plain === would make the negation drop them
        case "is" if value == "true" => c <=> lit(true)
        case "is" if value == "false" => c <=> lit(false)
        case "in" =>
          val items = rawValue.stripPrefix("(").stripSuffix(")")
            .split(",").map(_.trim.stripPrefix("'").stripSuffix("'"))
          c.isin(items.toIndexedSeq: _*)
        case other => throw new IllegalArgumentException(
          s"unsupported operator: $other")
      }
    }
    params.foreach {
      case (k, _) if ReservedKeys.contains(k) => ()
      case (col0, v) => df = df.filter(predicate(col(col0), v))
    }

    // projection / aggregation
    params.collectFirst { case ("select", s) => s }.foreach { sel =>
      val items = sel.split(",").map(_.trim)
      val aggs = items.collect { case AggRe(c, f) => (c, f) }
      val plain = items.filter(i => AggRe.findFirstIn(i).isEmpty)
      if (aggs.nonEmpty) {
        val aggCols: Seq[Column] = aggs.map {
          case (c, "sum") => sum(col(c)).as(s"${c}_sum")
          case (c, "avg") => avg(col(c)).as(s"${c}_avg")
          case (c, "min") => min(col(c)).as(s"${c}_min")
          case (c, "max") => max(col(c)).as(s"${c}_max")
          case (c, "count") => count(col(c)).as(s"${c}_count")
          case (c, f) => throw new IllegalArgumentException(s"$f($c)")
        }
        df = df.groupBy(plain.map(col).toSeq: _*)
          .agg(aggCols.head, aggCols.tail: _*)
      } else df = df.select(plain.map(col).toSeq: _*)
    }

    params.collectFirst { case ("order", o) => o }.foreach { o =>
      val cols = o.split(",").map(_.trim).map { item =>
        // col[.asc|.desc][.nullsfirst|.nullslast] — PostgREST order
        // grammar; defaults are asc + PostgreSQL's nulls-last-on-asc /
        // nulls-first-on-desc
        val parts = item.split("\\.")
        val c = col(parts.head)
        val desc = parts.contains("desc")
        val nullsFirst =
          if (parts.contains("nullsfirst")) true
          else if (parts.contains("nullslast")) false
          else desc // postgres default: NULLS FIRST iff DESC
        (desc, nullsFirst) match {
          case (false, false) => c.asc_nulls_last
          case (false, true) => c.asc_nulls_first
          case (true, false) => c.desc_nulls_last
          case (true, true) => c.desc_nulls_first
        }
      }
      df = df.orderBy(cols.toSeq: _*)
    }

    params.collectFirst { case ("offset", n) => n }.foreach { n =>
      df = df.offset(n.toInt)
    }
    params.collectFirst { case ("limit", n) => n }.foreach { n =>
      df = df.limit(n.toInt)
    }
    df
  }
}
