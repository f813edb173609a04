package graft

import graft.queries.Registry

/** Invariant specs for linear-classifier scoring (q178) and int8
  * embedding quantization (q179); exact cross-engine parity is the
  * DuckDB oracle's job. */
class QuantizeScoreSpec extends SparkSpec {

  test("q178: keep flag is exactly the logit sign, scores vary") {
    val rows = Registry.queries("q178_linear_quality_score")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, logit, keep) =>
      assert(keep == (logit > 0L))
    }
    // the boundary actually separates: both classes occur on the fixture
    assert(rows.exists(_._3) && rows.exists(!_._3))
  }

  test("q179: quantization error bounded by half a step per element") {
    val rows = Registry.queries("q179_int8_quantize")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, scale, sqErr, _) =>
      assert(scale >= 0.0)
      // round-to-nearest: |err| ≤ scale/2 per element, 64 elements
      val bound = 64.0 * (scale / 2.0) * (scale / 2.0) + 1e-12
      assert(sqErr >= 0.0 && sqErr <= bound,
        s"sq_err $sqErr above bound $bound for scale $scale")
    }
  }
}
