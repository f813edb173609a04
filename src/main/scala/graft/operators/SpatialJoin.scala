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

  /** Pre-parse the WKT geometry ONCE into NaN-separated flat coordinate
    * arrays (one slot per vertex, `NaN` between rings — the encoding
    * [[graft.expressions.PointInRing]] ray-casts even-odd over) plus
    * bbox columns over ALL rings. The parse cost is paid per polygon at
    * broadcast time, never per (point × polygon) evaluation. Handles
    * POLYGON with holes and MULTIPOLYGON; unknown geometry types throw
    * at parse time. The bbox is computed here rather than via
    * `array_min`/`array_max` because Spark orders NaN above every
    * double, which would poison the max. */
  def withParsedRing(polygons: DataFrame, wktCol: String): DataFrame = {
    val parse = udf { (w: String) =>
      val geom = GeoFuncs.parseGeometry(w)
      val rings = geom.flatten
      val nVerts = rings.map(_.length).sum
      val n = nVerts + rings.length - 1
      val xs = new Array[Double](n)
      val ys = new Array[Double](n)
      var o = 0
      rings.zipWithIndex.foreach { case (ring, r) =>
        if (r > 0) { xs(o) = Double.NaN; ys(o) = Double.NaN; o += 1 }
        ring.foreach { case (x, y) => xs(o) = x; ys(o) = y; o += 1 }
      }
      val (minx, miny, maxx, maxy) = GeoFuncs.bboxGeom(geom)
      (xs, ys, minx, miny, maxx, maxy)
    }
    polygons
      .withColumn("_g", parse(col(wktCol)))
      .withColumn("_ring_x", col("_g._1"))
      .withColumn("_ring_y", col("_g._2"))
      .withColumn("_bb_minx", col("_g._3"))
      .withColumn("_bb_miny", col("_g._4"))
      .withColumn("_bb_maxx", col("_g._5"))
      .withColumn("_bb_maxy", col("_g._6"))
      .drop("_g")
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

  /** Grid-partitioned spatial join — the scale path when the polygon
    * side is itself large (parcel/building layers, not a 2k-row NUTS
    * dimension) and a broadcast nested loop is impossible. Each polygon
    * is replicated to every `cellDeg`-degree grid cell its bbox covers;
    * each point hashes to exactly one cell; the join becomes an
    * EQUI-join on the cell id with the bbox + ray-cast predicate as a
    * residual filter. A (point, polygon) pair can only meet in the
    * point's single cell, so no post-join dedup is needed, and left
    * semantics fall out of the outer join directly. Shuffles both
    * sides once on the cell key — Σ cell² work instead of points ×
    * polygons. */
  def gridJoin(
      points: DataFrame, lonCol: String, latCol: String,
      polygons: DataFrame, wktCol: String, cellDeg: Double): DataFrame = {
    val polys = withParsedRing(polygons, wktCol)
      .withColumn("_cx", explode(sequence(
        floor(col("_bb_minx") / cellDeg).cast("long"),
        floor(col("_bb_maxx") / cellDeg).cast("long"))))
      .withColumn("_cy", explode(sequence(
        floor(col("_bb_miny") / cellDeg).cast("long"),
        floor(col("_bb_maxy") / cellDeg).cast("long"))))
    val pts = points
      .withColumn("_px", floor(col(lonCol) / cellDeg).cast("long"))
      .withColumn("_py", floor(col(latCol) / cellDeg).cast("long"))
    val cond =
      col("_px") === col("_cx") && col("_py") === col("_cy") &&
        col(lonCol) >= col("_bb_minx") && col(lonCol) <= col("_bb_maxx") &&
        col(latCol) >= col("_bb_miny") && col(latCol) <= col("_bb_maxy") &&
        graft.expressions.PointInRing.pointInRing(
          col("_ring_x"), col("_ring_y"), col(lonCol), col(latCol))
    pts.join(polys, cond, "left")
      .drop(helperCols :+ "_cx" :+ "_cy" :+ "_px" :+ "_py": _*)
  }
}
