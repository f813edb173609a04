package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Tables

/** Energy-analytics operators, part 2: the load-duration curve (the
  * canonical energy-planning summary of any demand/generation series)
  * and piecewise-linear turbine power-curve mapping — the
  * `windmodel.py` shape: the reference crawls measured power curves
  * from wind-turbine-models.com (`windmodel.py:47-77`) and
  * interpolates them onto wind speeds (`windmodel.py:27-28`, scipy
  * interpolation with negative values nulled). Both oracle-checked.
  */
object EnergyOps {

  /** Integer-valued synthetic power curve (kW at integer m/s): cut-in
    * 3 m/s, partial-load ramps, rated 3000 kW at 13 m/s, cut-out past
    * 25 m/s. Breakpoints AND their powers are integers, so the per-bin
    * segment endpoints are exact in both engines and the only
    * floating-point work is the final mirrored interpolation. ONE copy
    * of the curve feeds both the Spark plan and the DuckDB oracle. */
  private def powerAt(v: String): String =
    s"""CASE WHEN $v <= 3 THEN 0.0 WHEN $v = 4 THEN 100.0
       WHEN $v = 5 THEN 200.0 WHEN $v = 6 THEN 450.0
       WHEN $v = 7 THEN 700.0 WHEN $v = 8 THEN 950.0
       WHEN $v = 9 THEN 1200.0 WHEN $v = 10 THEN 1650.0
       WHEN $v = 11 THEN 2100.0 WHEN $v = 12 THEN 2550.0
       WHEN $v <= 25 THEN 3000.0 ELSE 0.0 END"""

  val qs: Seq[Q] = Seq(

    // Load-duration curve — demand values reordered descending and
    // plotted against the fraction of time they are exceeded; THE
    // capacity-planning view of any load/generation series (how many
    // hours a year is demand above X?). Reported at 5 % duration
    // steps so output is 20 rows per series regardless of input size.
    // Exact-rank selection (q52's machinery generalized to 20
    // quantile points): one per-series sort window — partition-local
    // after the shuffle on the series key; rank arithmetic is pure
    // integer ((n·j+19) div 20 = ceil), so engines can't disagree. A
    // row satisfying several duration points (tiny series) emits one
    // row per matched point, exactly like the oracle's cross join.
    // For series too hot for a full sort window, q145's binned
    // sketch is the documented approximate scale path.
    Q("q173_load_duration",
      (s, dir) => {
        val wOrd = Window.partitionBy("event_type")
          .orderBy(col("value").desc, col("event_id"))
        val wAll = Window.partitionBy("event_type")
        Tables.load(s, dir, "events")
          .withColumn("rn", row_number().over(wOrd).cast(LongType))
          .withColumn("n", count(lit(1)).over(wAll))
          // js: the duration points whose exact rank is THIS row
          .withColumn("j", explode(expr(
            "filter(sequence(1, 20), j -> (n * j + 19) div 20 = rn)")))
          .select(col("event_type"),
            (col("j") * 5).cast(LongType).as("duration_pct"),
            col("value").as("load_value"))
          .orderBy("event_type", "duration_pct")
      },
      Some("""WITH ranked AS (
          SELECT event_type, value,
            row_number() OVER (PARTITION BY event_type
              ORDER BY value DESC, event_id) AS rn,
            count(*) OVER (PARTITION BY event_type) AS n
          FROM events)
        SELECT event_type, CAST(5 * j AS BIGINT) AS duration_pct,
          value AS load_value
        FROM ranked, UNNEST(range(1, 21)) AS t(j)
        WHERE rn = (n * j + 19) // 20
        ORDER BY event_type, duration_pct""")),

    // Piecewise-linear power-curve mapping (windmodel.py:27-28,61-77):
    // wind speeds map to turbine output through a broadcast segment
    // table. The curve's integer breakpoints make every integer bin a
    // single linear segment, so the lookup is an EQUI-join on
    // floor(speed) against a 31-row broadcast — never a range join
    // (the q99 binned-range-join principle; a non-equi join against
    // even a tiny broadcast plans as a nested-loop scan per row).
    // Interpolation is p0 + (p1−p0)·(v−bin) — segment width is exactly
    // 1, so there is no division — a fixed double-op sequence both
    // engines execute identically; per-plant totals accumulate in
    // DECIMAL(38,12) (order-free) and surface as DOUBLE.
    Q("q175_power_curve",
      (s, dir) => {
        val curve = s.range(0, 31).select(
          col("id").as("b"),
          expr(powerAt("id")).as("p0"),
          expr(powerAt("id + 1")).as("p1"))
        Tables.load(s, dir, "events")
          .withColumn("wind", expr("least(value / 16.0, 30.0)"))
          .withColumn("b", floor(col("wind")).cast(LongType))
          .join(broadcast(curve), "b")
          .withColumn("p",
            col("p0") + (col("p1") - col("p0")) * (col("wind") - col("b")))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_obs"),
            sum(col("p").cast("decimal(38,12)")).cast(DoubleType)
              .as("total_kw"),
            max(col("p")).as("peak_kw"))
          .orderBy("event_type")
      },
      Some(s"""WITH curve AS (
          SELECT b, ${powerAt("b")} AS p0, ${powerAt("b + 1")} AS p1
          FROM (SELECT CAST(j AS BIGINT) AS b
            FROM UNNEST(range(0, 31)) AS t(j))),
        w AS (SELECT event_type,
            least(value / 16.0, 30.0) AS wind,
            CAST(floor(least(value / 16.0, 30.0)) AS BIGINT) AS b
          FROM events),
        p AS (SELECT event_type,
            p0 + (p1 - p0) * (wind - b) AS p
          FROM w JOIN curve USING (b))
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_obs,
          CAST(sum(CAST(p AS DECIMAL(38,12))) AS DOUBLE) AS total_kw,
          max(p) AS peak_kw
        FROM p GROUP BY event_type ORDER BY event_type"""))
  )
}
