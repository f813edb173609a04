package graft.functions

import org.apache.spark.sql.DataFrame

/** W5 — within-series interpolation (reference: `windmodel.py:83` fits
  * cubic curves through turbine power points and evaluates them on a
  * regular wind-speed grid).
  *
  * Natural cubic spline per group, computed with `groupByKey.mapGroups`:
  * each curve is small (tens of points — it's a per-entity calibration
  * curve, not a fact table), so per-group materialization is the right
  * plan; groups themselves are distributed. This is the one operator
  * family where per-group imperative math beats any expression
  * composition (SURVEY.md §2.11).
  */
object Interpolation {

  /** Solve the natural-spline tridiagonal system; returns second
    * derivatives M at the knots. */
  private def secondDerivatives(
      xs: Array[Double], ys: Array[Double]): Array[Double] = {
    val n = xs.length
    val m = new Array[Double](n)
    if (n < 3) return m
    val a = new Array[Double](n); val b = new Array[Double](n)
    val c = new Array[Double](n); val d = new Array[Double](n)
    b(0) = 1; b(n - 1) = 1
    for (i <- 1 until n - 1) {
      val h0 = xs(i) - xs(i - 1); val h1 = xs(i + 1) - xs(i)
      a(i) = h0; b(i) = 2 * (h0 + h1); c(i) = h1
      d(i) = 6 * ((ys(i + 1) - ys(i)) / h1 - (ys(i) - ys(i - 1)) / h0)
    }
    // Thomas algorithm
    for (i <- 1 until n) {
      val w = a(i) / b(i - 1)
      b(i) -= w * c(i - 1); d(i) -= w * d(i - 1)
    }
    m(n - 1) = d(n - 1) / b(n - 1)
    for (i <- n - 2 to 0 by -1) m(i) = (d(i) - c(i) * m(i + 1)) / b(i)
    m
  }

  /** Evaluate the natural cubic spline through (xs, ys) at `q`
    * (clamped to the knot range endpoints outside it). */
  def splineEval(xs: Array[Double], ys: Array[Double], q: Double)
      : Double = {
    val n = xs.length
    require(n >= 2, "spline needs at least 2 points")
    if (q <= xs(0)) return ys(0)
    if (q >= xs(n - 1)) return ys(n - 1)
    val m = secondDerivatives(xs, ys)
    var i = java.util.Arrays.binarySearch(xs, q)
    if (i < 0) i = -i - 2
    val h = xs(i + 1) - xs(i)
    val t = q - xs(i)
    ys(i) +
      t * ((ys(i + 1) - ys(i)) / h - h / 6 * (2 * m(i) + m(i + 1))) +
      t * t * m(i) / 2 +
      t * t * t * (m(i + 1) - m(i)) / (6 * h)
  }

  /** Interpolate every group's (x, y) curve onto `grid`: returns
    * (groupCol, x, y) rows, one per grid point per group. */
  def splineOnGrid(df: DataFrame, groupCol: String, xCol: String,
      yCol: String, grid: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = df
      .select(groupCol, xCol, yCol)
      .as[(String, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (g, rows) =>
        val pts = rows.map(r => (r._2, r._3)).toArray.sortBy(_._1)
        val xs = pts.map(_._1); val ys = pts.map(_._2)
        if (xs.length < 2) // degenerate curve: constant extension
          grid.iterator.map(q => (g, q, ys.headOption.getOrElse(0.0)))
        else
          grid.iterator.map(q => (g, q, splineEval(xs, ys, q)))
      }
    out.toDF("group", "x", "y")
  }
}
