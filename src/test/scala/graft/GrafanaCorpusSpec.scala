package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}

import graft.functions.{GrafanaMacros, TimeFuncs}

/** Sweep of the reference's FULL provisioned dashboard corpus
  * (`data/provisioning/grafana/dashboards`, 9 dashboard json files): every
  * panel rawSql and SQL template-variable query, committed verbatim at
  * `src/test/resources/graft/grafana_rawsql.json`, goes through
  * template-variable substitution + macro expansion and must (a) leave
  * no unexpanded `$` token, (b) PARSE as Spark SQL, and (c) fully
  * ANALYZE against auto-stubbed catalog tables whose schemas are
  * derived from the query itself (macro arguments name the timestamp
  * columns; every other referenced column stubs as DOUBLE).
  *
  * q61 proves one dashboard query end-to-end against the DuckDB oracle;
  * this spec proves the MACRO/QUOTING surface covers all ~69 shapes the
  * reference actually ships.
  */
class GrafanaCorpusSpec extends SparkSpec {

  private case class Entry(dashboard: String, panel: String, sql: String)

  private lazy val corpus: Seq[Entry] = {
    val in = getClass.getResourceAsStream("/graft/grafana_rawsql.json")
    val tree = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(try in.readAllBytes() finally in.close())
    tree.elements().asScala.map(n => Entry(
      n.get("dashboard").asText(), n.get("panel").asText(),
      n.get("sql").asText())).toSeq
  }

  private val From = "2024-01-01 00:00:00"
  private val To = "2024-02-01 00:00:00"

  /** Columns used as macro arguments are timestamps by construction
    * (qualifier and postgres quoting stripped: `v."time"` → time).
    * The refit dashboard's direct `time_bucket('1 hour', "DateTime")`
    * call names its timestamp column too. */
  private def timeColumns(raw: String): Set[String] =
    ("\\$__time(?:GroupAlias|Group|Filter)\\(\\s*([^,)]+)".r
      .findAllMatchIn(raw).map(_.group(1)) ++
      "time_bucket\\(\\s*'[^']+'\\s*,\\s*([^,)]+)".r
        .findAllMatchIn(raw).map(_.group(1)))
      .map(_.trim.stripPrefix("\"").stripSuffix("\"")
        .split('.').last.stripPrefix("\"").stripSuffix("\"").toLowerCase)
      .toSet

  private def expandEntry(e: Entry): String = {
    val vars = GrafanaMacros.variableNames(e.sql)
      .map(v => v -> "DE").toMap
    GrafanaMacros.expand(
      GrafanaMacros.substituteVars(e.sql, vars), From, To, "1h")
  }

  test("corpus loads all 9 dashboards") {
    assert(corpus.size >= 60, s"corpus unexpectedly small: ${corpus.size}")
    assert(corpus.map(_.dashboard).distinct.size == 9)
  }

  test("every rawSql expands with no residual macro or variable") {
    val residual = corpus.flatMap { e =>
      val out = expandEntry(e)
      if (out.contains("$")) Some(s"${e.dashboard}/${e.panel}: $out")
      else None
    }
    assert(residual.isEmpty,
      s"${residual.size} queries kept a $$ token:\n${residual.mkString("\n")}")
  }

  test("every rawSql parses as Spark SQL after expansion") {
    val failures = corpus.flatMap { e =>
      try { spark.sessionState.sqlParser.parsePlan(expandEntry(e)); None }
      catch { case ex: Throwable =>
        Some(s"${e.dashboard}/${e.panel}: ${ex.getMessage.linesIterator.next()}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} parse failures:\n${failures.mkString("\n")}")
  }

  test("every rawSql analyzes against auto-stubbed tables") {
    TimeFuncs.register(spark)
    graft.functions.GeoFuncs.register(spark) // open_nrw uses ST_AsGeoJSON
    val ansiWas = spark.conf.get("spark.sql.ansi.enabled")
    // the dashboards target postgres' lenient coercion; stub columns
    // are DOUBLE, so string comparisons need non-ANSI coercion
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val failures = corpus.flatMap { e =>
        try {
          val expanded = expandEntry(e)
          val parsed = spark.sessionState.sqlParser.parsePlan(expanded)
          // UnresolvedWith keeps CTE bodies in innerChildren, which
          // collect() does not traverse — walk them explicitly or the
          // tables referenced only inside a WITH clause get no stub
          def allPlans(p: org.apache.spark.sql.catalyst.plans.logical
              .LogicalPlan): Seq[org.apache.spark.sql.catalyst.plans
              .logical.LogicalPlan] = {
            val ctes = p.collectWithSubqueries {
              case w: org.apache.spark.sql.catalyst.plans.logical
                  .UnresolvedWith => w.cteRelations.map(_._2)
            }.flatten
            p +: ctes.flatMap(allPlans)
          }
          val plans = allPlans(parsed)
          val relations = plans.flatMap(_.collectWithSubqueries {
            case r: UnresolvedRelation => r.multipartIdentifier
          }).distinct
          val nodes = plans.flatMap(_.collectWithSubqueries { case n => n })
          // Split attribute references by context: names used ONLY in
          // GROUP BY / ORDER BY that also match a SELECT alias are the
          // alias, not an input column — stubbing them as columns
          // would shadow the alias and trip MISSING_AGGREGATION. Any
          // name also used elsewhere is a real input column.
          val allParts = scala.collection.mutable.ListBuffer[Seq[String]]()
          val groupSortNames = scala.collection.mutable.Set[String]()
          val otherNames = scala.collection.mutable.Set[String]()
          def addAttrs(exprs: Seq[org.apache.spark.sql.catalyst
              .expressions.Expression],
              to: scala.collection.mutable.Set[String]): Unit =
            exprs.foreach(_.foreach {
              case a: UnresolvedAttribute =>
                allParts += a.nameParts
                to += a.nameParts.last.toLowerCase
              case _ =>
            })
          nodes.foreach {
            case agg: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
              addAttrs(agg.groupingExpressions, groupSortNames)
              addAttrs(agg.aggregateExpressions, otherNames)
            case s: org.apache.spark.sql.catalyst.plans.logical.Sort =>
              addAttrs(s.order, groupSortNames)
            case n => addAttrs(n.expressions, otherNames)
          }
          val aliases = nodes.flatMap(_.expressions.flatMap(_.collect {
            case a: org.apache.spark.sql.catalyst.expressions.Alias =>
              a.name.toLowerCase
          })).toSet
          val phantom = (groupSortNames -- otherNames).filter(aliases)
          val attrs = allParts.distinct.toSeq
          val tcols = timeColumns(e.sql)
          def colType(c: String) =
            if (tcols(c.toLowerCase)) "TIMESTAMP" else "DOUBLE"
          val qualified = attrs.filter(_.length > 1).map(_.last)
            .filterNot(c => phantom(c.toLowerCase))
          val unqualified = attrs.filter(_.length == 1).map(_.last)
            .filterNot(_ == "*").filterNot(c => phantom(c.toLowerCase))
          // Strategy A: every relation stubs every referenced column
          // (joins in the corpus project through subqueries, so
          // ambiguity is rare). Strategy B (fallback): unqualified
          // columns only on the first relation, for queries where A
          // hits a genuine AMBIGUOUS_REFERENCE.
          def createStubs(assignAll: Boolean): Unit =
            relations.zipWithIndex.foreach { case (ident, idx) =>
              val cols = (qualified ++
                (if (assignAll || idx == 0) unqualified else Nil))
                .distinct.filterNot(_ == "*")
              val colDdl = (if (cols.isEmpty) Seq("stub_col")
                else cols).map(c => s"`$c` ${colType(c)}").mkString(", ")
              val name = ident.map(p => s"`$p`").mkString(".")
              if (ident.length > 1)
                spark.sql(s"CREATE DATABASE IF NOT EXISTS `${ident.head}`")
              spark.sql(s"DROP TABLE IF EXISTS $name")
              spark.sql(s"CREATE TABLE $name ($colDdl) USING parquet")
            }
          def analyze(): Unit = {
            spark.sql(expanded).queryExecution.analyzed; ()
          }
          try { createStubs(assignAll = true); analyze() }
          catch { case _: Throwable =>
            createStubs(assignAll = false); analyze()
          }
          None
        } catch { case ex: Throwable =>
          Some(s"${e.dashboard}/${e.panel}: ${ex.getMessage.linesIterator.next()}")
        }
      }
      assert(failures.isEmpty,
        s"${failures.size} analysis failures:\n${failures.mkString("\n")}")
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiWas)
  }
}
