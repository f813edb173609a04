package graft

import org.apache.spark.sql.functions._
/** Pins the round-19 CC checksum fusion: an observe() aggregate is
  * populated by the localCheckpoint materialization job itself (no
  * separate action), and the fused checksum equals the standalone
  * aggregate. NOTE an unpopulated observe() does NOT throw — the
  * metrics map still resolves and yields the accumulator's initial
  * buffer, Row(0, ZERO) — so ConnectedComponents guards the
  * count == 0 case at runtime (cross-checks cp.isEmpty) rather than
  * relying on an exception; this spec makes a population regression
  * loud at test time, the runtime guard makes it loud in production. */
class ObserveFusionSpec extends SparkSpec {

  test("localCheckpoint populates observe() metrics (CC checksum rides it)") {
    val df = spark.range(0, 1000).toDF("u")
      .withColumn("v", col("u") % 7)
    val obs = df.observe("cs",
      count(lit(1)).as("n"),
      coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO)).as("s"))
    val cp = obs.localCheckpoint()
    val row = obs.queryExecution.observedMetrics("cs")
    val ref = df.agg(
      count(lit(1)),
      coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO))).head()
    assert(row.getLong(0) === ref.getLong(0))
    assert(row.getDecimal(1).compareTo(ref.getDecimal(1)) === 0)
    // and the checkpointed frame is intact
    assert(cp.count() === 1000L)
    graft.operators.CacheOps.releaseCheckpoint(cp)
  }

  test("observe() metrics populated on an EMPTY checkpointed frame") {
    val df = spark.range(0, 10).toDF("u")
      .withColumn("v", col("u"))
      .filter(col("u") > 100) // empty
    val obs = df.observe("cs0",
      count(lit(1)).as("n"),
      coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO)).as("s"))
    val cp = obs.localCheckpoint()
    val row = obs.queryExecution.observedMetrics("cs0")
    assert(row.getLong(0) === 0L)
    assert(row.getDecimal(1).compareTo(java.math.BigDecimal.ZERO) === 0)
    assert(cp.count() === 0L)
    graft.operators.CacheOps.releaseCheckpoint(cp)
  }
}
