package graft

import graft.queries.Registry

/** Shape/invariant specs for the round-7 energy-analytics additions;
  * exact value parity is the DuckDB oracle's job. */
class EnergyOpsSpec extends SparkSpec {

  test("q173 load-duration: 20 points per series, non-increasing load") {
    val rows = Registry.queries("q173_load_duration")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val bySeries = rows.groupBy(_._1)
    assert(bySeries.nonEmpty)
    bySeries.foreach { case (series, pts) =>
      assert(pts.length == 20, s"$series: ${pts.length} points")
      assert(pts.map(_._2).sorted.toSeq == (1 to 20).map(_ * 5L),
        s"$series: duration grid wrong")
      // the defining property: load never increases along duration
      val ordered = pts.sortBy(_._2).map(_._3)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b },
        s"$series: curve not non-increasing")
    }
  }

  test("q175 power curve: output bounded by rated power, all series present") {
    val rows = Registry.queries("q175_power_curve")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (series, n, total, peak) =>
      assert(n > 0)
      assert(peak <= 3000.0, s"$series: peak $peak above rated")
      assert(peak >= 0.0 && total >= 0.0, s"$series: negative power")
      // mean per-observation output can't beat the rated power either
      assert(total / n <= 3000.0, s"$series: mean above rated")
    }
  }
}
