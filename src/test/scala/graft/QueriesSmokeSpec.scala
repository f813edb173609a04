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

  Registry.all.foreach { q =>
    test(s"${q.name} executes on sf0.001") {
      val df = q.run(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
