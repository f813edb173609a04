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
    wipeFixtures()
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

  // ---------------------------------------------------------------
  // Execution over POPULATED reference-shaped fixtures. The analyze
  // sweep above proves the macro/quoting surface; this proves the 69
  // panels actually RUN and produce stable results — a panel whose
  // SQL analyzes but mis-buckets at runtime fails here. Fixture rows
  // are synthesized deterministically to SATISFY each query's own
  // predicates (string-literal equality/IN/LIKE, numeric bounds,
  // EXTRACT(YEAR)=y, substring-prefix equality), so every panel is
  // exercised on a non-empty slice; results are pinned by committed
  // goldens (row count + first row of the sorted output). Regenerate
  // with GRAFT_WRITE_GOLDENS=1 after an intentional change.
  // ---------------------------------------------------------------

  import org.apache.spark.sql.Row
  import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression,
    GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual,
    Like, Literal, Not}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.types.{Decimal, DoubleType, StringType,
    StructField, StructType, TimestampType}

  private val FixtureRows = 48

  /** Every relation the corpus references (parse sweep). */
  private lazy val corpusRelations: Seq[Seq[String]] = corpus.flatMap { e =>
    try {
      val parsed = spark.sessionState.sqlParser.parsePlan(expandEntry(e))
      allPlansOf(parsed).flatMap(_.collectWithSubqueries {
        case r: UnresolvedRelation => r.multipartIdentifier
      })
    } catch { case _: Throwable => Nil }
  }.distinct

  /** Drop every corpus fixture table AND its managed-table directory.
    * A previous JVM's saveAsTable leaves the directory behind while
    * the in-memory catalog forgets the table — a later CREATE TABLE
    * then dies with LOCATION_ALREADY_EXISTS. */
  private def wipeFixtures(): Unit = {
    val wh = java.nio.file.Paths.get(java.net.URI.create(
      spark.conf.get("spark.sql.warehouse.dir")).getPath)
    corpusRelations.foreach { ident =>
      val name = ident.map(p => s"`$p`").mkString(".")
      if (ident.length > 1)
        spark.sql(s"CREATE DATABASE IF NOT EXISTS `${ident.head}`")
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val dir =
        if (ident.length > 1) wh.resolve(s"${ident.head}.db")
          .resolve(ident.last)
        else wh.resolve(ident.last)
      if (java.nio.file.Files.exists(dir))
        java.nio.file.Files.walk(dir)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  private def allPlansOf(p: LogicalPlan): Seq[LogicalPlan] = {
    val ctes = p.collectWithSubqueries {
      case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
        w.cteRelations.map(_._2)
    }.flatten
    p +: ctes.flatMap(allPlansOf)
  }

  /** Per-column value constraints mined from the query itself, so the
    * generated rows pass its own WHERE clauses. */
  private case class Constraints(
    strings: Map[String, Seq[String]],  // col -> candidate values
    numeric: Map[String, Double],       // col -> satisfying value
    yearPinned: Map[String, Int],       // ts col -> required year
    pairs: Seq[(String, String)])       // col = col join equalities

  private def attrIn(e: Expression): Option[String] = e.collectFirst {
    case a: UnresolvedAttribute => a.nameParts.last.toLowerCase
  }

  private def mineConstraints(plans: Seq[LogicalPlan]): Constraints = {
    val strs = scala.collection.mutable.Map[String,
      scala.collection.mutable.LinkedHashSet[String]]()
    val lo = scala.collection.mutable.Map[String, Double]()
    val hi = scala.collection.mutable.Map[String, Double]()
    val eqNum = scala.collection.mutable.Map[String, Double]()
    val years = scala.collection.mutable.Map[String, Int]()
    val eqPairs = scala.collection.mutable.ListBuffer[(String, String)]()
    val Wkt = "POLYGON((6 50, 7 50, 7 51, 6 51, 6 50))"
    def addStr(c: String, v: String): Unit =
      strs.getOrElseUpdate(c, scala.collection.mutable.LinkedHashSet()) += v
    def num(l: Literal): Option[Double] = l.value match {
      case null => None
      case v: java.lang.Number => Some(v.doubleValue())
      case v: Decimal => Some(v.toDouble)
      case s => scala.util.Try(s.toString.toDouble).toOption
    }
    def visit(e: Expression): Unit = e match {
      case EqualTo(a, l: Literal) => bind(a, l)
      case EqualTo(l: Literal, a) => bind(a, l)
      // col = col (join condition): the two columns must carry
      // compatible types AND overlapping values — record the pair,
      // the caller propagates string candidates / time typing across
      case EqualTo(a, b) =>
        attrIn(a).zip(attrIn(b)).foreach(eqPairs += _)
      // st_* geo functions consume WKT strings: a DOUBLE stub would
      // fail at runtime (malformed WKT)
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.last.toLowerCase.startsWith("st_") =>
        f.arguments.foreach(arg => attrIn(arg).foreach(addStr(_, Wkt)))
      case In(a, vs) => attrIn(a).foreach(c => vs.foreach {
        case l: Literal if l.value != null &&
            l.dataType == StringType => addStr(c, l.value.toString)
        case l: Literal => num(l).foreach(v => eqNum(c) = v)
        case _ => ()
      })
      case Like(a, l: Literal, _) => attrIn(a).foreach { c =>
        addStr(c, l.value.toString.replace("%", "").replace("_", "x"))
      }
      case GreaterThan(a, l: Literal) =>
        attrIn(a).zip(num(l)).foreach { case (c, v) =>
          lo(c) = math.max(lo.getOrElse(c, v), v) }
      case GreaterThanOrEqual(a, l: Literal) =>
        attrIn(a).zip(num(l)).foreach { case (c, v) =>
          lo(c) = math.max(lo.getOrElse(c, v), v) }
      case LessThan(a, l: Literal) =>
        attrIn(a).zip(num(l)).foreach { case (c, v) =>
          hi(c) = math.min(hi.getOrElse(c, v), v) }
      case LessThanOrEqual(a, l: Literal) =>
        attrIn(a).zip(num(l)).foreach { case (c, v) =>
          hi(c) = math.min(hi.getOrElse(c, v), v) }
      case Not(inner) => () // != 0 etc: defaults are nonzero already
      case other => other.children.foreach(visit)
    }
    def bind(a: Expression, l: Literal): Unit = {
      val isYear = a.toString.toLowerCase.contains("year")
      (a, l.dataType) match {
        case (att: UnresolvedAttribute, StringType) =>
          addStr(att.nameParts.last.toLowerCase, l.value.toString)
        case (att: UnresolvedAttribute, _) =>
          num(l).foreach(v => eqNum(att.nameParts.last.toLowerCase) = v)
        case _ if isYear => // EXTRACT(YEAR FROM col) = 2012
          attrIn(a).zip(num(l)).foreach { case (c, v) =>
            years(c) = v.toInt }
        case _ => // substring(col,1,n) = 'DEA' and kin: the literal
          // itself satisfies a prefix probe, so use it as a value
          (attrIn(a), l.dataType) match {
            case (Some(c), StringType) => addStr(c, l.value.toString)
            case (Some(c), _) => num(l).foreach(v => eqNum(c) = v)
            case _ => ()
          }
      }
    }
    plans.foreach(_.collectWithSubqueries { case n =>
      n.expressions.foreach(visit) })
    val numeric = (lo.keySet ++ hi.keySet ++ eqNum.keySet).map { c =>
      c -> eqNum.getOrElse(c,
        (lo.getOrElse(c, 0.0) + hi.getOrElse(c, 100.0)) / 2.0)
    }.toMap
    Constraints(strs.map { case (k, v) => k -> v.toSeq }.toMap,
      numeric, years.toMap, eqPairs.toSeq)
  }

  /** Propagate string candidates and timestamp typing across col=col
    * join equalities (fixpoint): a join side without its own literal
    * must still carry values that MATCH the other side, or the join
    * is empty and the panel vacuously returns 0 rows. Merged columns
    * share one SORTED candidate seq so row i agrees on both sides. */
  private def propagate(cs: Constraints, tcols0: Set[String])
      : (Constraints, Set[String]) = {
    var strings = cs.strings
    var tcols = tcols0
    var changed = true
    while (changed) {
      changed = false
      cs.pairs.foreach { case (x, y) =>
        val merged = (strings.getOrElse(x, Nil) ++
          strings.getOrElse(y, Nil)).distinct.sorted
        if (merged.nonEmpty &&
            (!strings.get(x).contains(merged) ||
              !strings.get(y).contains(merged))) {
          strings = strings + (x -> merged) + (y -> merged)
          changed = true
        }
        if (tcols(x) != tcols(y)) { tcols = tcols + x + y; changed = true }
      }
    }
    (cs.copy(strings = strings), tcols)
  }

  private def fixtureRow(i: Int, cols: Seq[String], tcols: Set[String],
      cs: Constraints): Row = Row.fromSeq(cols.map { c0 =>
    val c = c0.toLowerCase
    if (tcols(c)) {
      val base = cs.yearPinned.get(c)
        .map(y => java.sql.Timestamp.valueOf(s"$y-01-10 00:00:00"))
        .getOrElse(java.sql.Timestamp.valueOf(From))
      new java.sql.Timestamp(base.getTime + i * 3600L * 1000L)
    } else cs.strings.get(c) match {
      case Some(vals) => vals(i % vals.size)
      case None if cs.numeric.contains(c) => cs.numeric(c)
      case None => (i % 7 + 1).toDouble
    }
  })

  private def goldenKey(i: Int, e: Entry): String =
    s"$i:${e.dashboard}/${e.panel}"

  test("every rawSql EXECUTES over populated fixtures and matches " +
      "its golden (rows + first row)") {
    TimeFuncs.register(spark)
    graft.functions.GeoFuncs.register(spark)
    wipeFixtures()
    val ansiWas = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    val results = scala.collection.mutable.LinkedHashMap[String,
      (Long, String)]()
    val failures = scala.collection.mutable.ListBuffer[String]()
    try {
      corpus.zipWithIndex.foreach { case (e, i) =>
        try {
          val expanded = expandEntry(e)
          val parsed = spark.sessionState.sqlParser.parsePlan(expanded)
          val plans = allPlansOf(parsed)
          val relations = plans.flatMap(_.collectWithSubqueries {
            case r: UnresolvedRelation => r.multipartIdentifier
          }).distinct
          val attrs = plans.flatMap(_.collectWithSubqueries { case n =>
            n.expressions.flatMap(_.collect {
              case a: UnresolvedAttribute => a.nameParts
            })
          }).flatten.distinct
          val (cs, tcols) =
            propagate(mineConstraints(plans), timeColumns(e.sql))
          // Phantom aliases (same split as the analyze sweep): a name
          // used ONLY in GROUP BY / ORDER BY that matches a SELECT
          // alias is the alias — stubbing it as a table column would
          // shadow the alias and trip MISSING_AGGREGATION.
          val groupSortNames = scala.collection.mutable.Set[String]()
          val otherNames = scala.collection.mutable.Set[String]()
          def addAttrs(exprs: Seq[Expression],
              to: scala.collection.mutable.Set[String]): Unit =
            exprs.foreach(_.foreach {
              case a: UnresolvedAttribute =>
                to += a.nameParts.last.toLowerCase
              case _ =>
            })
          val nodes = plans.flatMap(_.collectWithSubqueries { case n => n })
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
          val qualified = attrs.filter(_.length > 1).map(_.last)
            .distinct.filterNot(_ == "*")
            .filterNot(c => phantom(c.toLowerCase))
          val unqualified = attrs.filter(_.length == 1).map(_.last)
            .distinct.filterNot(_ == "*")
            .filterNot(c => phantom(c.toLowerCase))
          def sqlType(c: String) =
            if (tcols(c.toLowerCase)) TimestampType
            else if (cs.strings.contains(c.toLowerCase)) StringType
            else DoubleType
          // Strategy A: every relation carries every referenced
          // column; B (on genuine AMBIGUOUS_REFERENCE): unqualified
          // columns only on the first relation — same split as the
          // analyze sweep above.
          def writeFixtures(assignAll: Boolean): Unit =
            relations.zipWithIndex.foreach { case (ident, idx) =>
              val cols = (qualified ++
                (if (assignAll || idx == 0) unqualified else Nil)).distinct
              val fields = (if (cols.isEmpty) Seq("stub_col") else cols)
                .map(c => StructField(c, sqlType(c)))
              val schema = StructType(fields)
              val rows = (0 until FixtureRows)
                .map(r => fixtureRow(r, fields.map(_.name),
                  tcols.map(_.toLowerCase), cs))
              val df = spark.createDataFrame(rows.asJava, schema)
              val name = ident.map(p => s"`$p`").mkString(".")
              if (ident.length > 1)
                spark.sql(s"CREATE DATABASE IF NOT EXISTS `${ident.head}`")
              spark.sql(s"DROP TABLE IF EXISTS $name")
              df.write.saveAsTable(ident.mkString("."))
            }
          def exec(): Array[String] =
            spark.sql(expanded).collect().map(_.toString).sorted
          val collected =
            try { writeFixtures(assignAll = true); exec() }
            catch { case _: Throwable =>
              writeFixtures(assignAll = false); exec()
            }
          results(goldenKey(i, e)) =
            (collected.length.toLong, collected.headOption.getOrElse(""))
          if (collected.isEmpty)
            failures += s"${e.dashboard}/${e.panel}: executed but " +
              "returned 0 rows — fixture does not satisfy its filters"
        } catch { case ex: Throwable =>
          failures += s"${e.dashboard}/${e.panel}: " +
            s"${String.valueOf(ex.getMessage).linesIterator.next()}"
        }
      }
      assert(failures.isEmpty,
        s"${failures.size} execution failures:\n${failures.mkString("\n")}")
      val goldenPath = java.nio.file.Paths.get(
        "src/test/resources/graft/grafana_goldens.json")
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      if (sys.env.get("GRAFT_WRITE_GOLDENS").contains("1")) {
        val root = om.createObjectNode()
        results.foreach { case (k, (n, first)) =>
          val o = root.putObject(k); o.put("rows", n); o.put("first", first)
        }
        java.nio.file.Files.write(goldenPath, om.writerWithDefaultPrettyPrinter()
          .writeValueAsBytes(root))
        fail(s"goldens regenerated at $goldenPath — rerun without " +
          "GRAFT_WRITE_GOLDENS")
      } else {
        val in = getClass.getResourceAsStream("/graft/grafana_goldens.json")
        assert(in != null, "missing grafana_goldens.json — run once with " +
          "GRAFT_WRITE_GOLDENS=1")
        val tree = om.readTree(try in.readAllBytes() finally in.close())
        val diffs = results.flatMap { case (k, (n, first)) =>
          val g = tree.get(k)
          if (g == null) Some(s"$k: no golden recorded")
          else if (g.get("rows").asLong() != n)
            Some(s"$k: rows $n != golden ${g.get("rows").asLong()}")
          else if (g.get("first").asText() != first)
            Some(s"$k: first row drifted\n  got    $first\n  golden " +
              s"${g.get("first").asText()}")
          else None
        }
        assert(diffs.isEmpty,
          s"${diffs.size} golden mismatches:\n${diffs.mkString("\n")}")
        assert(results.size == corpus.size)
      }
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiWas)
  }

  // ---------------------------------------------------------------
  // SEMANTIC goldens for the two flagship dashboards (entsoe,
  // weather): reference-shaped fixtures (FIXTURES.md B1/B2/B3/B10)
  // with HAND-COMPUTED expected values — a mis-bucketing, a wrong
  // unit conversion (K→°C, ghi/3600, interval_ms scaling), a filter
  // that stops excluding, or an avg-vs-sum swap moves a pinned
  // number, which the stub-shaped row-count goldens above could miss.
  // ---------------------------------------------------------------

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def entryWhere(dash: String, sqlMark: String): Entry =
    corpus.find(e => e.dashboard == dash && e.sql.contains(sqlMark))
      .getOrElse(fail(s"no $dash panel contains '$sqlMark'"))

  private def runPanel(e: Entry): Seq[Row] =
    spark.sql(expandEntry(e)).collect().toSeq

  test("entsoe + weather flagship panels produce hand-checked values " +
      "over reference-shaped fixtures") {
    TimeFuncs.register(spark)
    graft.functions.GeoFuncs.register(spark)
    wipeFixtures()
    val ansiWas = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    import spark.implicits._
    try {
      spark.sql("CREATE DATABASE IF NOT EXISTS entsoe")
      spark.sql("CREATE DATABASE IF NOT EXISTS weather")

      // B1: long load fact. Two in-window countries share bucket 00,
      // one IN-list country lands in bucket 01; an off-list country
      // and an out-of-window row must both vanish.
      Seq(
        (ts("2024-01-01 00:15:00"), 100.0, "DE"),
        (ts("2024-01-01 00:45:00"), 200.0, "FR"),
        (ts("2024-01-01 01:30:00"), 50.0, "DE"),
        (ts("2024-01-01 00:20:00"), 999.0, "XX"),
        (ts("2023-12-31 10:00:00"), 777.0, "DE"))
        .toDF("index", "actual_load", "country")
        .write.mode("overwrite").saveAsTable("entsoe.query_load")

      // At interval 1h, $__interval_ms/1000/3600 == 1, so the panel's
      // "energy over the interval" arithmetic reduces to a plain sum.
      val load = runPanel(entryWhere("entsoe", "sum(actual_load"))
        .map(r => (r.getTimestamp(0), r.getDouble(1)))
      assert(load == Seq(
        (ts("2024-01-01 00:00:00"), 300.0),
        (ts("2024-01-01 01:00:00"), 50.0)),
        s"load panel: $load")

      // B2: wide generation mix. The 14 summed techs carry 10k..140k
      // (DE row 1), doubled (DE row 2), and 7 each (AT); the 15th
      // column hydro_pumped_storage is NOT in the panel's sum — a
      // huge value there proves the column algebra matches the panel.
      val techs = Seq("biomass", "fossil_hard_coal", "geothermal",
        "nuclear", "fossil_brown_coal/lignite", "fossil_coal-derived_gas",
        "hydro_run-of-river_and_poundage", "waste", "solar",
        "wind_offshore", "wind_onshore", "other_renewable",
        "hydro_water_reservoir", "fossil_gas")
      val genSchema = StructType(
        StructField("index", TimestampType) +:
          StructField("country", StringType) +:
          (techs :+ "hydro_pumped_storage")
            .map(c => StructField(c, DoubleType)))
      val genRows = Seq(
        Row.fromSeq(ts("2024-01-01 00:10:00") +: "DE" +:
          ((1 to 14).map(_ * 10.0) :+ 100000.0)),
        Row.fromSeq(ts("2024-01-01 00:40:00") +: "DE" +:
          ((1 to 14).map(_ * 20.0) :+ 100000.0)),
        Row.fromSeq(ts("2024-01-01 00:20:00") +: "AT" +:
          (Seq.fill(14)(7.0) :+ 5.0)),
        Row.fromSeq(ts("2023-12-01 00:00:00") +: "DE" +:
          Seq.fill(15)(999.0)))
      spark.createDataFrame(genRows.asJava, genSchema)
        .write.mode("overwrite").saveAsTable("entsoe.query_generation")

      // Σ(1..14)*10 = 1050, doubled = 2100, AT = 14*7 = 98 → 3248
      val genSum = runPanel(entryWhere("entsoe", "generation_sum"))
        .map(r => (r.getTimestamp(0), r.getDouble(1)))
      assert(genSum == Seq((ts("2024-01-01 00:00:00"), 3248.0)),
        s"generation_sum panel: $genSum")

      // Stromerzeugung DE (expandEntry maps $country → DE): per-tech
      // avg of (v, 2v) = 1.5v; the AT row and the out-of-window row
      // must not contribute.
      val mix = runPanel(corpus.find(e => e.dashboard == "entsoe" &&
        e.panel.startsWith("Stromerzeugung")).get)
      assert(mix.size == 1)
      val mixRow = mix.head
      assert(mixRow.getTimestamp(0) == ts("2024-01-01 00:00:00"))
      techs.zipWithIndex.foreach { case (t, i) =>
        assert(mixRow.getDouble(i + 1) == (i + 1) * 15.0,
          s"avg($t) = ${mixRow.getDouble(i + 1)}, expected ${(i + 1) * 15.0}")
      }

      // B3: day-ahead prices with the value column literally named
      // "0" (postgres-quoted). Two DE rows average inside bucket 00,
      // AT keeps its own metric row, a later DE row opens bucket 01.
      val dapSchema = StructType(Seq(StructField("index", TimestampType),
        StructField("0", DoubleType), StructField("country", StringType)))
      val dapRows = Seq(
        Row(ts("2024-01-01 00:05:00"), 10.0, "DE"),
        Row(ts("2024-01-01 00:55:00"), 20.0, "DE"),
        Row(ts("2024-01-01 00:30:00"), 7.0, "AT"),
        Row(ts("2024-01-01 01:10:00"), 40.0, "DE"))
      spark.createDataFrame(dapRows.asJava, dapSchema)
        .write.mode("overwrite")
        .saveAsTable("entsoe.query_day_ahead_prices")

      val dap = runPanel(entryWhere("entsoe", "country AS metric"))
        .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
      assert(dap == Seq(
        (ts("2024-01-01 00:00:00"), "AT", 7.0),
        (ts("2024-01-01 00:00:00"), "DE", 15.0),
        (ts("2024-01-01 01:00:00"), "DE", 40.0)),
        s"day-ahead panel: $dap")

      // B10: ecmwf grid. The latest-snapshot panel takes MAX(time)
      // WITHIN the dashboard window (a later out-of-window snapshot
      // must not win), keeps only the lat/lon box, and converts K→°C.
      val ecmwfCols = Seq("time", "temp_air", "ghi", "wind_meridional",
        "wind_zonal", "wind_speed", "precipitation", "latitude",
        "longitude")
      val ecmwfSchema = StructType(StructField("time", TimestampType) +:
        ecmwfCols.tail.map(c => StructField(c, DoubleType)))
      val t1 = ts("2024-01-10 00:00:00"); val t2 = ts("2024-01-20 00:00:00")
      val ecmwfRows = Seq(
        Row(t2, 283.15, 7200.0, 3.0, 4.0, 6.0, 0.0, 50.5, 6.0),
        Row(t2, 293.15, 3600.0, 0.0, 8.0, 10.0, 0.0, 52.0, 8.0), // off-box
        Row(t1, 263.15, 0.0, 0.0, 0.0, 0.0, 0.0, 50.5, 6.0), // stale
        Row(ts("2024-03-05 00:00:00"), 303.15, 0.0, 0.0, 0.0, 0.0, 0.0,
          50.5, 6.0)) // later but OUTSIDE the window: must not win MAX
      spark.createDataFrame(ecmwfRows.asJava, ecmwfSchema)
        .write.mode("overwrite").saveAsTable("weather.ecmwf")

      val wmap = runPanel(entryWhere("weather", "longitude > 5.5"))
        .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
      assert(wmap.size == 1 && wmap.head._1 == 10.0 &&
        wmap.head._2 == 6.0 && wmap.head._3 == 50.5,
        s"weather map panel: $wmap")

      // Weather Explorer over ecmwf_eu, nuts_id like 'DE%': two DE
      // rows average in one bucket (K→°C, ghi/3600, the stored
      // wind_speed AND the recomputed sqrt(u²+v²)); FR excluded.
      val euSchema = StructType(ecmwfSchema.fields :+
        StructField("nuts_id", StringType))
      val euRows = Seq(
        Row(ts("2024-01-05 00:20:00"), 283.15, 7200.0, 3.0, 4.0, 6.0,
          0.0, 50.5, 6.0, "DE11"),
        Row(ts("2024-01-05 00:50:00"), 293.15, 3600.0, 0.0, 8.0, 10.0,
          0.0, 50.7, 6.2, "DE21"),
        Row(ts("2024-01-05 00:30:00"), 999.0, 999.0, 9.0, 9.0, 9.0,
          0.0, 48.0, 2.0, "FR10"))
      spark.createDataFrame(euRows.asJava, euSchema)
        .write.mode("overwrite").saveAsTable("weather.ecmwf_eu")

      val expl = runPanel(entryWhere("weather", "nuts_id like 'DE%'"))
        .map(r => (r.getTimestamp(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3)))
      assert(expl == Seq((ts("2024-01-05 00:00:00"),
        15.0,  // avg(283.15, 293.15) - 273.15
        1.5,   // avg(7200/3600, 3600/3600)
        8.0)), // avg(stored wind_speed 6, 10)
        s"weather explorer panel: $expl")

      // The $nuts_id variant (template → 'DE%') additionally
      // RECOMPUTES wind speed as sqrt(u²+v²) next to the stored one.
      val explVar = runPanel(entryWhere("weather",
        "nuts_id like '$nuts_id%'"))
        .map(r => (r.getTimestamp(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4)))
      assert(explVar == Seq((ts("2024-01-05 00:00:00"),
        15.0, 1.5, 8.0,
        6.5)), // avg(sqrt(3²+4²)=5, sqrt(0²+8²)=8)
        s"weather explorer $$nuts_id panel: $explVar")
    } finally {
      spark.conf.set("spark.sql.ansi.enabled", ansiWas)
      wipeFixtures()
    }
  }

  /** Finder that can also EXCLUDE a mark — several open_nrw panels
    * differ only by a `where` clause added to the same SELECT. */
  private def entryWhereNot(dash: String, mark: String,
      notMark: String): Entry =
    corpus.find(e => e.dashboard == dash && e.sql.contains(mark) &&
      !e.sql.contains(notMark))
      .getOrElse(fail(s"no $dash panel has '$mark' without '$notMark'"))

  test("gie + open_nrw panels produce hand-checked values over " +
      "reference-shaped fixtures (geo joins, ST_AsGeoJSON, subquery " +
      "dims, scalar-subquery snapshots)") {
    TimeFuncs.register(spark)
    graft.functions.GeoFuncs.register(spark)
    wipeFixtures()
    val ansiWas = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    import spark.implicits._
    try {
      spark.sql("CREATE DATABASE IF NOT EXISTS gie")
      spark.sql("CREATE DATABASE IF NOT EXISTS weather")

      // ---- gie (FIXTURES.md B12): flattened 3-level AGSI/ALSI JSON.
      // Every gie.* table shares the flattened column set; unused
      // measures ride as zeros.
      def gieRows(rows: Seq[(String, String, String, String, Double,
          Double, Double, Double, Double, Double)], table: String): Unit =
        rows.map { case (t, name, code, parent, gis, inj, wd, cons, so,
            dtrs) =>
          (ts(t), name, code, parent, gis, inj, wd, cons, so, dtrs)
        }.toDF("gasdaystart", "name", "code", "parent", "gasinstorage",
          "injection", "withdrawal", "consumption", "sendout", "dtrs")
          .write.mode("overwrite").saveAsTable(table)

      // ALSI country: two DE rows share the 1h bucket (avg), FR keeps
      // its own series, an out-of-window row must vanish.
      gieRows(Seq(
        ("2024-01-05 00:00:00", "Germany", "DE", "", 0, 0, 0, 0, 100, 10),
        ("2024-01-05 00:30:00", "Germany", "DE", "", 0, 0, 0, 0, 200, 30),
        ("2024-01-05 00:15:00", "France", "FR", "", 0, 0, 0, 0, 50, 7),
        ("2023-12-01 00:00:00", "Germany", "DE", "", 0, 0, 0, 0, 999, 999)),
        "gie.gie_alsi_country")
      val sendout = runPanel(entryWhere("gie", "avg(sendout)"))
        .map(r => (r.getTimestamp(0), r.getDouble(1), r.getString(2)))
        .sortBy(r => (r._1.getTime, r._3))
      assert(sendout == Seq(
        (ts("2024-01-05 00:00:00"), 150.0, "DE"),
        (ts("2024-01-05 00:00:00"), 50.0, "FR")),
        s"ALSI sendout panel: $sendout")

      // AGSI country: injection AND withdrawal avg side by side.
      gieRows(Seq(
        ("2024-01-06 00:00:00", "Germany", "DE", "", 1000, 10, 5, 100, 0, 0),
        ("2024-01-06 00:30:00", "Germany", "DE", "", 2000, 30, 15, 300, 0, 0),
        ("2023-11-01 00:00:00", "Germany", "DE", "", 9999, 999, 999, 999,
          0, 0)),
        "gie.gie_agsi_country")
      val injwd = runPanel(entryWhere("gie", "avg(injection)"))
        .map(r => (r.getTimestamp(0), r.getDouble(1), r.getDouble(2),
          r.getString(3)))
      assert(injwd == Seq((ts("2024-01-06 00:00:00"), 20.0, 10.0, "DE")),
        s"AGSI injection/withdrawal panel: $injwd")

      // AGSI by-company: parent = '$country' (template → DE) filters
      // the FR company out; two in-bucket rows average.
      gieRows(Seq(
        ("2024-01-07 00:00:00", "StorCo", "", "DE", 500, 0, 0, 0, 0, 0),
        ("2024-01-07 00:40:00", "StorCo", "", "DE", 700, 0, 0, 0, 0, 0),
        ("2024-01-07 00:10:00", "OtherCo", "", "FR", 999, 0, 0, 0, 0, 0)),
        "gie.gie_agsi_company")
      val byCompany = runPanel(entryWhere("gie", "FROM gie.gie_agsi_company"))
        .map(r => (r.getTimestamp(0), r.getDouble(1), r.getString(2)))
      assert(byCompany == Seq((ts("2024-01-07 00:00:00"), 600.0, "StorCo")),
        s"AGSI by-company panel: $byCompany")

      // ALSI by-location (gie.json's J7 subquery-dim join): the
      // company subquery (DISTINCT parent,name WITHIN the window)
      // keys location.parent by company NAME and filters by company
      // PARENT = country. CompB is French (filtered), CompC's rows
      // are out-of-window (its location must vanish even though the
      // LOCATION rows are in-window).
      gieRows(Seq(
        ("2024-01-08 00:00:00", "CompA", "", "DE", 0, 0, 0, 0, 0, 0),
        ("2024-01-08 00:00:00", "CompA", "", "DE", 0, 0, 0, 0, 0, 0),
        ("2024-01-08 00:00:00", "CompB", "", "FR", 0, 0, 0, 0, 0, 0),
        ("2023-06-01 00:00:00", "CompC", "", "DE", 0, 0, 0, 0, 0, 0)),
        "gie.gie_alsi_company")
      gieRows(Seq(
        ("2024-01-08 00:00:00", "Loc1", "", "CompA", 0, 0, 0, 0, 0, 40),
        ("2024-01-08 00:20:00", "Loc1", "", "CompA", 0, 0, 0, 0, 0, 60),
        ("2024-01-08 00:00:00", "Loc2", "", "CompB", 0, 0, 0, 0, 0, 999),
        ("2024-01-08 00:00:00", "Loc3", "", "CompC", 0, 0, 0, 0, 0, 777)),
        "gie.gie_alsi_location")
      val byLoc = runPanel(entryWhere("gie", "companies ON companies.name"))
        .map(r => (r.getTimestamp(0), r.getDouble(1), r.getString(2)))
      assert(byLoc == Seq((ts("2024-01-08 00:00:00"), 50.0, "Loc1")),
        s"ALSI by-location panel: $byLoc")

      // ---- open_nrw (FIXTURES.md B11): geo dims + PV/heat facts.
      val gDE = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
      val gXX = "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"
      Seq(("DE", gDE), ("XX", gXX)).toDF("nuts_id", "geometry")
        .write.mode("overwrite").saveAsTable("nuts")
      Seq(("DE", 10.0, 180.0, 30.0), ("DE", 30.0, 0.0, 45.0),
        ("DE", 60.0, 90.0, 0.0), ("XX", 5.0, 120.0, 20.0))
        .toDF("nuts_id", "power", "azimuth", "tilt")
        .write.mode("overwrite").saveAsTable("solar")
      Seq(("DE", 7.0), ("DE", 13.0), ("XX", 100.0))
        .toDF("nuts_id", "demand")
        .write.mode("overwrite").saveAsTable("heat")

      val jDE = graft.functions.GeoFuncs.toGeoJson(gDE)
      val jXX = graft.functions.GeoFuncs.toGeoJson(gXX)

      // PV potential by NUTS3 (geo join + ST_AsGeoJSON + sum)
      val pv = runPanel(entryWhereNot("open_nrw", "sum(power) as power",
        "$NUTS3"))
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .sortBy(_._1)
      assert(pv == Seq(("DE", jDE, 100.0), ("XX", jXX, 5.0)),
        s"PV potential panel: $pv")

      // heat demand mirror
      val heat = runPanel(entryWhereNot("open_nrw", "sum(demand) as demand",
        "$NUTS3"))
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .sortBy(_._1)
      assert(heat == Seq(("DE", jDE, 20.0), ("XX", jXX, 100.0)),
        s"heat demand panel: $heat")

      // stat tiles: kWp→MWp scaling and system count for $NUTS3 → DE
      val pot = runPanel(entryWhere("open_nrw", "Potential $NUTS3"))
      assert(pot.size == 1 && pot.head.getString(0) == "DE" &&
        pot.head.getDouble(1) == 0.1, s"potential stat: $pot")
      val cnt = runPanel(entryWhere("open_nrw", "possible Systems"))
      assert(cnt.size == 1 && cnt.head.getLong(1) == 3L,
        s"system count stat: $cnt")

      // histograms: positive-only / upper-bound filters, ordered
      val az = runPanel(entryWhere("open_nrw", "azimuth > 0"))
        .map(_.getDouble(0))
      assert(az == Seq(90.0, 180.0), s"azimuth histogram: $az")
      val tilt = runPanel(entryWhere("open_nrw", "tilt > 0"))
        .map(_.getDouble(0))
      assert(tilt == Seq(30.0, 45.0), s"tilt histogram: $tilt")
      val pw = runPanel(entryWhere("open_nrw", "power < 50"))
        .map(_.getDouble(0))
      assert(pw == Seq(10.0, 30.0), s"power histogram: $pw")

      // irradiation panels share one ecmwf_eu fixture: the Europe
      // panel has NO time filter (averages ALL rows incl. the stale
      // snapshot), while the map panel keeps only the LATEST
      // IN-WINDOW snapshot via the scalar subquery over the OTHER
      // table (weather.ecmwf) and scales J/m² → W/m².
      val t1 = ts("2024-01-10 00:00:00"); val t2 = ts("2024-01-20 00:00:00")
      Seq((t1, 0.0), (t2, 0.0), (ts("2024-03-05 00:00:00"), 0.0))
        .toDF("time", "ghi")
        .write.mode("overwrite").saveAsTable("weather.ecmwf")
      Seq(
        (t2, 7200.0, 6.0, 50.5, "DE"),
        (t2, 3600.0, 6.0, 50.5, "DE"),
        (t1, 99000.0, 6.0, 50.5, "DE"), // stale: map excludes, Europe keeps
        (t2, 1800.0, 9.0, 52.0, "XX"))
        .toDF("time", "ghi", "longitude", "latitude", "nuts_id")
        .write.mode("overwrite").saveAsTable("weather.ecmwf_eu")

      val eu = runPanel(entryWhere("open_nrw", "FROM weather.ecmwf_eu eu"))
        .map(r => (r.getDouble(0), r.getString(1)))
      assert(eu == Seq((1800.0, jXX), (36600.0, jDE)), // ORDER BY avg asc
        s"Europe irradiation panel: $eu")

      val map = runPanel(entryWhere("open_nrw", "SELECT MAX(\"time\")"))
        .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
          r.getString(3)))
        .sortBy(_._1)
      assert(map == Seq((0.5, 9.0, 52.0, "XX"), (1.5, 6.0, 50.5, "DE")),
        s"irradiation map panel: $map")
    } finally {
      spark.conf.set("spark.sql.ansi.enabled", ansiWas)
      wipeFixtures()
    }
  }

  test("jao + smard panels produce hand-checked values over " +
      "reference-shaped fixtures (UNION-dedup CTE, integer-bucket " +
      "histogram, 15-wide generation mix)") {
    TimeFuncs.register(spark)
    wipeFixtures()
    val ansiWas = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    import spark.implicits._
    try {
      spark.sql("CREATE DATABASE IF NOT EXISTS jao")
      spark.sql("CREATE DATABASE IF NOT EXISTS smard")
      spark.sql("CREATE DATABASE IF NOT EXISTS entsoe")

      // jao "Resold quantity": the UNION (not UNION ALL) CTE dedups
      // WHOLE rows across the daily and monthly bid tables — the
      // identical (1, 1440) row must count ONCE; the resold=0 row is
      // filtered; distinct nonzero rows from both sides all count.
      Seq((1.0, 1440.0), (0.0, 720.0), (2.0, 1440.0))
        .toDF("resoldQuantity", "productMinutesDelivered")
        .write.mode("overwrite").saveAsTable("jao.bids_daily")
      Seq((1.0, 1440.0), (3.0, 2880.0), (3.0, 1440.0))
        .toDF("resoldQuantity", "productMinutesDelivered")
        .write.mode("overwrite").saveAsTable("jao.bids_monthly")
      val resold = runPanel(entryWhere("jao", "\"resoldQuantity\" != 0"))
        .map(_.getLong(0))
      // distinct nonzero rows: (1,1440) (2,1440) (3,2880) (3,1440)
      assert(resold == Seq(4L), s"resold-quantity UNION panel: $resold")

      // jao "delivered days": minutes/60/24 buckets the histogram —
      // two 1-day products collapse into one bucket of count 2, the
      // 2-day product keeps its own bucket (COUNT counts non-nulls of
      // the SAME column, so the deduped-union subtlety doesn't apply:
      // this panel reads bids_monthly directly).
      val days = runPanel(entryWhere("jao", "GROUP BY \"days\""))
        .map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
      assert(days == Seq((1.0, 2L), (2.0, 1L)),
        s"delivered-days histogram panel: $days")

      // jao auction-price series: 1h bucket average over the DE-CH
      // corridor only — the FR-CH corridor and the out-of-window row
      // must vanish; two in-bucket rows average.
      Seq(
        (ts("2024-01-03 00:05:00"), "DE-CH-1", 10.0),
        (ts("2024-01-03 00:55:00"), "DE-CH-1", 30.0),
        (ts("2024-01-03 00:10:00"), "FR-CH-1", 999.0),
        (ts("2023-06-01 00:00:00"), "DE-CH-1", 999.0))
        .toDF("date", "corridor", "auctionPrice")
        .write.mode("overwrite").saveAsTable("jao.auctions")
      val auct = runPanel(entryWhere("jao", "avg(\"auctionPrice\")"))
        .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
      assert(auct == Seq((ts("2024-01-03 00:00:00"), "DE-CH-1", 20.0)),
        s"JAO auction price panel: $auct")

      // jao day-ahead overlay: the price column is literally named
      // "0" (the reference lands the ENTSO-E frame with positional
      // columns); CH filter + 1h average.
      Seq(
        (ts("2024-01-04 00:00:00"), "CH", 40.0),
        (ts("2024-01-04 00:30:00"), "CH", 60.0),
        (ts("2024-01-04 00:15:00"), "DE", 999.0))
        .toDF("index", "country", "0")
        .write.mode("overwrite")
        .saveAsTable("entsoe.query_day_ahead_prices")
      val dayAhead = runPanel(
          entryWhere("jao", "query_day_ahead_prices"))
        .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
      assert(dayAhead == Seq((ts("2024-01-04 00:00:00"), "CH", 50.0)),
        s"jao day-ahead overlay panel: $dayAhead")

      // smard generation fact: avg(mwh*4) per (bucket, commodity) —
      // the ×4 converts quarter-hour MWh to MW; two in-bucket rows
      // average AFTER scaling, the out-of-window row vanishes.
      Seq(
        (ts("2024-01-05 00:00:00"), "Braunkohle", 100.0),
        (ts("2024-01-05 00:45:00"), "Braunkohle", 200.0),
        (ts("2024-01-05 00:30:00"), "Solar", 50.0),
        (ts("2023-01-01 00:00:00"), "Braunkohle", 999.0))
        .toDF("timestamp", "commodity_name", "mwh")
        .write.mode("overwrite").saveAsTable("smard.smard")
      val gen = runPanel(entryWhere("smard", "smard.smard"))
        .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
        .sortBy(r => (r._1.getTime, r._2))
      assert(gen == Seq(
        (ts("2024-01-05 00:00:00"), "Braunkohle", 600.0),
        (ts("2024-01-05 00:00:00"), "Solar", 200.0)),
        s"smard generation panel: $gen")

      // smard's 15-wide ENTSO-E generation mix: every fuel column is
      // a separate avg over the same 1h bucket (slash/hyphen column
      // names ride through quoting); fuel i averages 2i from rows
      // (i, 3i); DE_LU filter and the window drop the poison rows.
      val fuels = Seq("biomass", "fossil_hard_coal", "geothermal",
        "nuclear", "fossil_brown_coal/lignite",
        "fossil_coal-derived_gas", "hydro_run-of-river_and_poundage",
        "waste", "hydro_pumped_storage", "solar", "wind_offshore",
        "wind_onshore", "other_renewable", "hydro_water_reservoir",
        "fossil_gas")
      def genRow(t: java.sql.Timestamp, c: String, scale: Double) =
        Row.fromSeq(t +: c +: fuels.indices.map(i => (i + 1) * scale))
      val schema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("index",
          org.apache.spark.sql.types.TimestampType) +:
        org.apache.spark.sql.types.StructField("country",
          org.apache.spark.sql.types.StringType) +:
        fuels.map(f => org.apache.spark.sql.types.StructField(f,
          org.apache.spark.sql.types.DoubleType)))
      spark.createDataFrame(java.util.List.of(
          genRow(ts("2024-01-06 00:10:00"), "DE_LU", 1.0),
          genRow(ts("2024-01-06 00:50:00"), "DE_LU", 3.0),
          genRow(ts("2024-01-06 00:20:00"), "FR", 999.0),
          genRow(ts("2023-03-01 00:00:00"), "DE_LU", 999.0)), schema)
        .write.mode("overwrite").saveAsTable("entsoe.query_generation")
      val mix = runPanel(entryWhere("smard", "query_generation"))
      assert(mix.size == 1, s"generation mix rows: $mix")
      val row = mix.head
      assert(row.getTimestamp(0) == ts("2024-01-06 00:00:00"))
      // select order: biomass, hard_coal, geothermal, nuclear,
      // lignite, coal-derived gas, run-of-river, waste, pumped
      // storage (aliased "storage"), solar, offshore, onshore, other
      // renewable, reservoir, gas — fixture order chosen to match, so
      // column i+1 averages 2(i+1)
      val got = (1 to 15).map(row.getDouble)
      assert(got == (1 to 15).map(_ * 2.0),
        s"generation mix panel values: $got")
    } finally {
      spark.conf.set("spark.sql.ansi.enabled", ansiWas)
      wipeFixtures()
    }
  }

  test("entsog + parkendd + refit panels produce hand-checked values " +
      "(interval_ms algebra, metric concat, raw series, time_bucket + " +
      "EXTRACT) — all 9 dashboards now carry semantic goldens") {
    TimeFuncs.register(spark)
    wipeFixtures()
    val ansiWas = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    import spark.implicits._
    try {
      Seq("entsog", "weather", "parkendd", "londondatastore")
        .foreach(db => spark.sql(s"CREATE DATABASE IF NOT EXISTS $db"))

      // physical_flow drives THREE panel shapes: the interval_ms
      // energy-rate algebra (value/$__interval_ms*1000*60*60 at 1h =
      // value exactly — the units cancel), the per-direction metric
      // concat, and a raw (unaggregated) in-window series. operatorkey
      // must be literally 'DE': the LIKE 'DE%' panel and the
      // '$operator' = substituted-'DE' panel read the same rows.
      Seq(
        (ts("2024-01-10 00:10:00"), 100.0, "DE", "entry", "DE"),
        (ts("2024-01-10 00:40:00"), 50.0, "DE", "entry", "DE"),
        (ts("2024-01-10 00:25:00"), 70.0, "DE", "exit", "DE"),
        (ts("2024-01-10 00:20:00"), 999.0, "FR", "entry", "X"),
        (ts("2023-06-01 00:00:00"), 999.0, "DE", "entry", "DE"))
        .toDF("periodfrom", "value", "operatorkey", "directionkey",
          "pointlabel")
        .write.mode("overwrite").saveAsTable("entsog.physical_flow")
      val flow = runPanel(entryWhere("entsog", "value/$__interval_ms"))
        .map(r => (r.getTimestamp(0), r.getDouble(1)))
      assert(flow == Seq((ts("2024-01-10 00:00:00"), 150.0)),
        s"interval_ms flow panel: $flow")
      val phys = runPanel(entryWhere("entsog", "concat('phys_'"))
        .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
        .sortBy(_._2)
      assert(phys == Seq(
        (ts("2024-01-10 00:00:00"), "phys_entry", 150.0),
        (ts("2024-01-10 00:00:00"), "phys_exit", 70.0)),
        s"per-direction flow panel: $phys")
      val rawPhys = runPanel(entryWhereNot("entsog",
          "value AS \"Physical\"", "sum(value)"))
        .map(r => (r.getTimestamp(0), r.getDouble(1)))
      assert(rawPhys == Seq(
        (ts("2024-01-10 00:10:00"), 100.0),
        (ts("2024-01-10 00:25:00"), 70.0),
        (ts("2024-01-10 00:40:00"), 50.0)),
        s"raw physical series panel: $rawPhys")

      // allocation: avg per alloc_<direction> metric + its raw twin.
      Seq(
        (ts("2024-01-11 00:05:00"), 10.0, "DE", "entry", "DE"),
        (ts("2024-01-11 00:35:00"), 30.0, "DE", "entry", "DE"),
        (ts("2023-06-01 00:00:00"), 999.0, "DE", "entry", "DE"))
        .toDF("periodfrom", "value", "operatorkey", "directionkey",
          "pointlabel")
        .write.mode("overwrite").saveAsTable("entsog.allocation")
      val alloc = runPanel(entryWhere("entsog", "concat('alloc_'"))
        .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
      assert(alloc == Seq(
        (ts("2024-01-11 00:00:00"), "alloc_entry", 20.0)),
        s"allocation metric panel: $alloc")

      // firm technical capacity: sum(index) per operator label.
      Seq(
        (ts("2024-01-12 00:00:00"), "OGE", 5.0),
        (ts("2024-01-12 00:30:00"), "OGE", 7.0),
        (ts("2023-06-01 00:00:00"), "OGE", 999.0))
        .toDF("periodfrom", "operatorlabel", "index")
        .write.mode("overwrite").saveAsTable("entsog.firm_technical")
      val firm = runPanel(entryWhere("entsog", "firm_technical"))
        .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
      assert(firm == Seq((ts("2024-01-12 00:00:00"), "OGE", 12.0)),
        s"firm technical panel: $firm")

      // the entsog map: a constant time-0 coordinate dump.
      Seq((6.1, 50.8), (7.0, 51.2))
        .toDF("pointtpmapx", "pointtpmapy")
        .write.mode("overwrite").saveAsTable("entsog.interconnections")
      val mapPts = runPanel(entryWhere("entsog", "pointtpmapx"))
        .map(r => (r.getDouble(1), r.getDouble(2))).sortBy(_._1)
      assert(mapPts == Seq((6.1, 50.8), (7.0, 51.2)),
        s"interconnections map panel: $mapPts")

      // entsog's weather overlay: Kelvin → °C via avg(temp_air-272.15).
      Seq(
        (ts("2024-01-13 00:10:00"), 282.15, "DE"),
        (ts("2024-01-13 00:50:00"), 292.15, "DE"),
        (ts("2024-01-13 00:20:00"), 999.0, "FR"),
        (ts("2023-06-01 00:00:00"), 999.0, "DE"))
        .toDF("time", "temp_air", "nuts_id")
        .write.mode("overwrite").saveAsTable("weather.ecmwf_eu")
      val temp = runPanel(entryWhere("entsog", "avg(temp_air-272.15)"))
        .map(r => (r.getTimestamp(0), r.getDouble(1)))
      assert(temp == Seq((ts("2024-01-13 00:00:00"), 15.0)),
        s"temperature overlay panel: $temp")

      // parkendd: free-space average per LIKE-filtered parking id.
      Seq(
        (ts("2024-01-14 00:05:00"), "aachen1", 100.0),
        (ts("2024-01-14 00:55:00"), "aachen1", 200.0),
        (ts("2024-01-14 00:30:00"), "aachen2", 40.0),
        (ts("2024-01-14 00:30:00"), "berlin1", 999.0),
        (ts("2023-06-01 00:00:00"), "aachen1", 999.0))
        .toDF("datetime", "parking_id", "free")
        .write.mode("overwrite").saveAsTable("parkendd.timeseries_cleaned")
      val park = runPanel(entryWhere("parkendd", "aachen%"))
        .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
        .sortBy(_._2)
      assert(park == Seq(
        (ts("2024-01-14 00:00:00"), "aachen1", 150.0),
        (ts("2024-01-14 00:00:00"), "aachen2", 40.0)),
        s"parkendd panel: $park")

      // refit: direct time_bucket + EXTRACT(YEAR) — no grafana window
      // at all, so 2011 and ToU rows are dropped by the query's own
      // predicates only.
      Seq(
        (ts("2012-03-01 10:15:00"), 100.0, "Std"),
        (ts("2012-03-01 10:45:00"), 200.0, "Std"),
        (ts("2012-03-01 10:20:00"), 999.0, "ToU"),
        (ts("2011-03-01 10:20:00"), 999.0, "Std"))
        .toDF("DateTime", "power", "tariff")
        .write.mode("overwrite").saveAsTable("londondatastore.consumption")
      val refit = runPanel(entryWhere("refit", "time_bucket('1 hour'"))
        .map(r => (r.getTimestamp(0), r.getDouble(1)))
      assert(refit == Seq((ts("2012-03-01 10:00:00"), 150.0)),
        s"refit hourly panel: $refit")
    } finally {
      spark.conf.set("spark.sql.ansi.enabled", ansiWas)
      wipeFixtures()
    }
  }
}
