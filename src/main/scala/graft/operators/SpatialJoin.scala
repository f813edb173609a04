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

  /** Attach min/max bbox columns to a polygon dimension. */
  def withBbox(polygons: DataFrame, wktCol: String): DataFrame = {
    val minX = udf((w: String) => GeoFuncs.bbox(GeoFuncs.parsePolygon(w))._1)
    val minY = udf((w: String) => GeoFuncs.bbox(GeoFuncs.parsePolygon(w))._2)
    val maxX = udf((w: String) => GeoFuncs.bbox(GeoFuncs.parsePolygon(w))._3)
    val maxY = udf((w: String) => GeoFuncs.bbox(GeoFuncs.parsePolygon(w))._4)
    polygons
      .withColumn("_bb_minx", minX(col(wktCol)))
      .withColumn("_bb_miny", minY(col(wktCol)))
      .withColumn("_bb_maxx", maxX(col(wktCol)))
      .withColumn("_bb_maxy", maxY(col(wktCol)))
  }

  /** Left join `points` (with lon/lat columns) to the containing polygon
    * row. Polygons are broadcast; bbox prunes; ray-cast decides. */
  def pointInPolygon(
      points: DataFrame, lonCol: String, latCol: String,
      polygons: DataFrame, wktCol: String): DataFrame = {
    val polys = withBbox(polygons, wktCol)
    val cond =
      col(lonCol) >= col("_bb_minx") && col(lonCol) <= col("_bb_maxx") &&
        col(latCol) >= col("_bb_miny") && col(latCol) <= col("_bb_maxy") &&
        GeoFuncs.stContains(col(wktCol), col(lonCol), col(latCol))
    points.join(broadcast(polys), cond, "left")
      .drop("_bb_minx", "_bb_miny", "_bb_maxx", "_bb_maxy")
  }
}
