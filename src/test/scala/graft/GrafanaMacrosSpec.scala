package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GrafanaMacros

class GrafanaMacrosSpec extends AnyFunSuite {

  test("intervalSeconds parses Grafana literals") {
    assert(GrafanaMacros.intervalSeconds("30s") == 30)
    assert(GrafanaMacros.intervalSeconds("5m") == 300)
    assert(GrafanaMacros.intervalSeconds("1h") == 3600)
    assert(GrafanaMacros.intervalSeconds("2d") == 172800)
    assert(GrafanaMacros.intervalSeconds("500ms") == 1) // floors to 1s
    intercept[IllegalArgumentException] {
      GrafanaMacros.intervalSeconds("fortnight")
    }
  }

  test("expands the entsoe.json load-panel shape verbatim") {
    val raw = "SELECT\n  $__timeGroupAlias(index,$__interval),\n" +
      "  sum(actual_load/($__interval_ms/1000/3600)) AS \"actual_load\"\n" +
      "FROM entsoe.query_load\nWHERE\n  $__timeFilter(index) AND\n" +
      "  country IN ('DE','AT')\nGROUP BY 1\nORDER BY 1"
    val out = GrafanaMacros.expand(raw,
      "2024-01-01 00:00:00", "2024-02-01 00:00:00", "1h")
    assert(out.contains("time_bucket_s(3600, index) AS `time`"))
    assert(out.contains("sum(actual_load/(3600000/1000/3600)) AS `actual_load`"))
    assert(out.contains("index BETWEEN TIMESTAMP '2024-01-01 00:00:00' " +
      "AND TIMESTAMP '2024-02-01 00:00:00'"))
    assert(!out.contains("$__"), s"unexpanded macro left in: $out")
  }

  test("quoted identifiers become backticks; strings untouched") {
    val out = GrafanaMacros.expand(
      """SELECT "fossil_brown_coal/lignite" FROM g WHERE c = 'a"b'""",
      "2024-01-01 00:00:00", "2024-01-02 00:00:00", "5m")
    assert(out.contains("`fossil_brown_coal/lignite`"))
    assert(out.contains("'a\"b'"), "quote inside string literal must survive")
    // a PAIR of double quotes inside a string literal must not be
    // rewritten either (the regex formulation corrupted this case)
    val lit = GrafanaMacros.expand(
      """SELECT "col" FROM g WHERE note = 'say "hi" now' AND e = 'it''s "x"'""",
      "2024-01-01 00:00:00", "2024-01-02 00:00:00", "5m")
    assert(lit.contains("`col`"))
    assert(lit.contains("'say \"hi\" now'"))
    assert(lit.contains("'it''s \"x\"'"))
  }

  test("quoted interval argument form $__timeGroup(col,'1h')") {
    assert(GrafanaMacros.intervalSeconds("'1h'") == 3600)
    val out = GrafanaMacros.expand(
      "SELECT $__timeGroupAlias(ts,'15m') FROM e",
      "2024-01-01 00:00:00", "2024-01-02 00:00:00", "1h")
    assert(out.contains("time_bucket_s(900, ts)"))
  }

  test("timeGroup (no alias), timeFrom/timeTo, unixEpochFilter, explicit interval") {
    val out = GrafanaMacros.expand(
      "SELECT $__timeGroup(ts,15m), $__timeFrom(), $__timeTo() " +
        "FROM e WHERE $__unixEpochFilter(epoch_s)",
      "2024-01-01 00:00:00", "2024-01-02 00:00:00", "1h")
    assert(out.contains("time_bucket_s(900, ts)"))
    assert(out.contains("TIMESTAMP '2024-01-01 00:00:00'"))
    assert(out.contains("epoch_s >= 1704067200 AND epoch_s <= 1704153600"))
  }
}
