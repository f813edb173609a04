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

  test("q176 day-type profile: closed day-type domain, hour grid, positive counts") {
    val rows = Registry.queries("q176_day_type_profile")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val types = rows.map(_._2).toSet
    assert(types.subsetOf(Set("workday", "saturday", "sunday_holiday")))
    assert(types.contains("workday"))
    rows.foreach { case (_, _, hr, n) =>
      assert(hr >= 0 && hr <= 23)
      assert(n > 0)
    }
  }

  test("q177 OHLC: high/low bound open and close in every bar") {
    val rows = Registry.queries("q177_ohlc_resample")(spark, sf)
      .collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (open, high, low, close, n) =>
      assert(n > 0)
      assert(high >= low)
      assert(open >= low && open <= high)
      assert(close >= low && close <= high)
    }
  }

  test("q182 imputation: grid is complete and gaps actually fill") {
    val rows = Registry.queries("q182_slp_imputation")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3)))
    assert(rows.nonEmpty)
    // hourly grid per series is contiguous: count == span in hours + 1
    rows.groupBy(_._1).foreach { case (series, pts) =>
      val ts = pts.map(_._2.getTime).sorted
      val expected = (ts.last - ts.head) / 3600000L + 1
      assert(pts.length.toLong == expected,
        s"$series: ${pts.length} rows for a $expected-hour span")
    }
    // the operator engages: some rows imputed, and imputed rows carry
    // a value whenever their (day-type, hour) profile cell exists
    assert(rows.exists(_._4) && rows.exists(!_._4))
    rows.filter(!_._4).foreach(r => assert(r._3.nonEmpty))
  }

  test("q195 incidents: disjoint windows, durations match span, peaks above mean") {
    val rows = Registry.queries("q195_incident_windows")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (series, incs) =>
      val sorted = incs.sortBy(_._2.getTime)
      // duration equals the hour span of [start, end]
      sorted.foreach { case (_, st, en, n, _) =>
        assert((en.getTime - st.getTime) / 3600000L + 1 == n,
          s"$series: span/duration mismatch")
      }
      // windows are disjoint AND non-adjacent (else they'd have merged)
      sorted.toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b._2.getTime > a._3.getTime + 3600000L,
            s"$series: windows touch — islands failed to merge")
        case _ =>
      }
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
