package graft

import org.apache.spark.sql.functions._

import graft.expressions.HullAggregate
import graft.functions.Interpolation

class HullInterpSpec extends SparkSpec {
  import spark.implicits._

  test("convexHull drops interior points, survives degenerate input") {
    val square = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    val withInterior = square ++ Seq((2.0, 2.0), (1.0, 3.0))
    assert(HullAggregate.convexHull(withInterior).toSet == square.toSet)
    assert(HullAggregate.convexHull(Seq((1.0, 1.0))) == Seq((1.0, 1.0)))
    assert(HullAggregate.toWkt(Seq.empty) == "POLYGON EMPTY")
  }

  test("hullWkt aggregate is partition-invariant and correct") {
    val pts = (0 until 200).map { i =>
      val a = i * 0.1
      (math.cos(a) * 10, math.sin(a) * 10)
    } ++ Seq((0.0, 0.0), (1.0, 1.0)) // interior
    val df1 = pts.toDF("lon", "lat")
    val w1 = df1.repartition(1)
      .agg(HullAggregate.hullWkt($"lon", $"lat")).as[String].head()
    val w8 = df1.repartition(8)
      .agg(HullAggregate.hullWkt($"lon", $"lat")).as[String].head()
    assert(w1 == w8)
    assert(w1.startsWith("POLYGON (("))
    assert(!w1.contains("1.0 1.0")) // interior point not on hull
  }

  test("hullWkt per group") {
    val df = Seq(("a", 0.0, 0.0), ("a", 1.0, 0.0), ("a", 0.0, 1.0),
      ("b", 5.0, 5.0)).toDF("g", "lon", "lat")
    val out = df.groupBy("g").agg(
      HullAggregate.hullWkt($"lon", $"lat").as("h"))
      .orderBy("g").as[(String, String)].collect()
    assert(out(0)._2.startsWith("POLYGON"))
    assert(out(1)._2 == "POINT (5.0 5.0)")
  }

  test("splineEval reproduces knots exactly and is smooth between") {
    val xs = Array(0.0, 1.0, 2.0, 3.0, 4.0)
    val ys = xs.map(x => x * x)
    xs.zip(ys).foreach { case (x, y) =>
      assert(math.abs(Interpolation.splineEval(xs, ys, x) - y) < 1e-9)
    }
    // natural spline of x² is close to x² mid-interval (not exact —
    // natural BCs bend the ends) and clamps outside the range
    assert(math.abs(Interpolation.splineEval(xs, ys, 1.5) - 2.25) < 0.1)
    assert(Interpolation.splineEval(xs, ys, -5.0) == 0.0)
    assert(Interpolation.splineEval(xs, ys, 99.0) == 16.0)
  }

  test("splineOnGrid interpolates each curve onto the grid") {
    val df = Seq(
      ("t1", 0.0, 0.0), ("t1", 5.0, 100.0), ("t1", 10.0, 200.0),
      ("t2", 0.0, 0.0), ("t2", 10.0, 50.0))
      .toDF("turbine", "wind", "power")
    val grid = Seq(0.0, 2.5, 5.0, 7.5, 10.0)
    val out = Interpolation.splineOnGrid(df, "turbine", "wind", "power",
      grid)
    assert(out.count() == 10)
    val t1 = out.filter($"group" === "t1").orderBy("x")
      .select("y").as[Double].collect()
    assert(math.abs(t1(2) - 100.0) < 1e-9) // knot hit exactly
    assert(t1(1) > 0 && t1(1) < 100)
  }
}
