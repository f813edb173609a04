package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GeoFuncs

/** Point-in-polygon spatial join (reference J4: `gpd.sjoin(points,
  * polygons, predicate="within")` at `ecmwf.py:199`; brute-force loops at
  * `dwd.py:46-59`, `scigrid.py:71-100`).
  *
  * Plan shape for 100 TB: the polygon side (NUTS regions ≈ 2k rows) is
  * always small → broadcast it with precomputed bounding boxes; the
  * cheap bbox range predicate prunes before the exact ray-cast runs, so
  * the exact test executes ~once per point instead of once per
  * (point × polygon). No shuffle of the point side at all.
  */
object SpatialJoin {

  /** Pre-parse the WKT ring ONCE into coordinate arrays + bbox columns
    * — the parse cost is paid per polygon at broadcast time, never per
    * (point × polygon) evaluation. */
  def withParsedRing(polygons: DataFrame, wktCol: String): DataFrame = {
    val ringX = udf((w: String) => GeoFuncs.parsePolygon(w).map(_._1))
    val ringY = udf((w: String) => GeoFuncs.parsePolygon(w).map(_._2))
    polygons
      .withColumn("_ring_x", ringX(col(wktCol)))
      .withColumn("_ring_y", ringY(col(wktCol)))
      .withColumn("_bb_minx", array_min(col("_ring_x")))
      .withColumn("_bb_miny", array_min(col("_ring_y")))
      .withColumn("_bb_maxx", array_max(col("_ring_x")))
      .withColumn("_bb_maxy", array_max(col("_ring_y")))
  }

  private val helperCols = Seq(
    "_ring_x", "_ring_y", "_bb_minx", "_bb_miny", "_bb_maxx", "_bb_maxy")

  /** Left join `points` (with lon/lat columns) to the containing polygon
    * row. Polygons are broadcast with pre-parsed rings; the cheap bbox
    * range predicate prunes, then the native codegen'd
    * [[graft.expressions.PointInRing]] ray-cast decides — no WKT
    * parsing and no UDF in the per-pair loop. */
  def pointInPolygon(
      points: DataFrame, lonCol: String, latCol: String,
      polygons: DataFrame, wktCol: String): DataFrame = {
    val polys = withParsedRing(polygons, wktCol)
    val cond =
      col(lonCol) >= col("_bb_minx") && col(lonCol) <= col("_bb_maxx") &&
        col(latCol) >= col("_bb_miny") && col(latCol) <= col("_bb_maxy") &&
        graft.expressions.PointInRing.pointInRing(
          col("_ring_x"), col("_ring_y"), col(lonCol), col(latCol))
    points.join(broadcast(polys), cond, "left")
      .drop(helperCols: _*)
  }
}
