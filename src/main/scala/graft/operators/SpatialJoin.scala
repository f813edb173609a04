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

  private def sq(a: org.apache.spark.sql.Column) = a * a

  /** Exact nearest-reference assignment with SIZE-THRESHOLDED
    * dispatch. `refs` must expose exactly (refKey, refLon, refLat).
    * Output: `pKeys` ++ refKey ++ `nn_dist2`, tie-broken by smallest
    * refKey (deterministic, engine-portable).
    *
    * - `refs` ≤ `broadcastThreshold` rows → broadcast argmin: the
    *   reference set streams through every point partition, one
    *   map-side-partial struct-min, no shuffle of the points (the
    *   bounded-reference-set shape, right for station dimensions).
    * - above the threshold → grid algorithm, exact in two bucketed
    *   equi-join phases: (1) each point probes an expanding square of
    *   `cellDeg` cells (ring doubling for points whose neighborhood is
    *   empty) for an UPPER BOUND; (2) each point re-probes every cell
    *   within that bound's radius, which provably contains the global
    *   nearest. Work is Σ cell-pair products, never points × refs; both
    *   sides shuffle only on cell keys.
    */
  def nearestJoin(
      points: DataFrame, pKeys: Seq[String], lonCol: String, latCol: String,
      refs: DataFrame, refKey: String, refLon: String, refLat: String,
      cellDeg: Double, broadcastThreshold: Long = 10000L): DataFrame = {
    val d2 = sq(col(lonCol) - col(refLon)) + sq(col(latCol) - col(refLat))
    if (!graft.sources.ParquetStats.exceedsRows(refs, broadcastThreshold)) {
      points.crossJoin(broadcast(refs))
        .withColumn("_d2", d2)
        .groupBy(pKeys.map(col): _*)
        .agg(min(struct(col("_d2"), col(refKey))).as("_m"))
        .select(pKeys.map(col) ++ Seq(
          col(s"_m.$refKey").as(refKey),
          col("_m._d2").as("nn_dist2")): _*)
    } else {
      val keyCols = pKeys.map(col)
      val pts = points
        .select(pKeys.map(col) ++ Seq(col(lonCol), col(latCol)): _*)
        .withColumn("_px", floor(col(lonCol) / cellDeg).cast("long"))
        .withColumn("_py", floor(col(latCol) / cellDeg).cast("long"))
      val rf = refs
        .withColumn("_cx", floor(col(refLon) / cellDeg).cast("long"))
        .withColumn("_cy", floor(col(refLat) / cellDeg).cast("long"))
      def probe(ptsIn: DataFrame, rExpr: org.apache.spark.sql.Column)
          : DataFrame =
        ptsIn
          .withColumn("_gx", explode(sequence(col("_px") - rExpr,
            col("_px") + rExpr)))
          .withColumn("_gy", explode(sequence(col("_py") - rExpr,
            col("_py") + rExpr)))
          .join(rf, col("_gx") === col("_cx") && col("_gy") === col("_cy"))
          .withColumn("_d2", d2)
          .groupBy(keyCols :+ col("_px") :+ col("_py"): _*)
          .agg(min(struct(col("_d2"), col(refKey))).as("_m"))
      // phase 1: upper bound via expanding neighborhood (rounds are
      // O(log gridWidth); round 1 resolves everything when refs are
      // denser than one per cell neighborhood)
      var r = 1L
      var pending = pts
      var bound: DataFrame = null
      while (!pending.isEmpty) {
        val found = probe(pending, lit(r))
        bound = if (bound == null) found else bound.unionByName(found)
        pending = pending.join(
          found.select(keyCols: _*), pKeys, "left_anti")
        r *= 4
      }
      // phase 2: certify — any ref closer than the bound lies within
      // ceil(sqrt(d2)/cellDeg) cells, and the bound's own ref is in
      // that square too, so the re-probed min is the global min
      probe(
        bound.withColumn("_r",
          ceil(sqrt(col("_m._d2")) / cellDeg).cast("long"))
          .select(keyCols ++ Seq(col("_px"), col("_py"), col("_r")): _*)
          .join(pts.select(pKeys.map(col) :+ col(lonCol) :+ col(latCol): _*),
            pKeys),
        col("_r"))
        .select(pKeys.map(col) ++ Seq(
          col(s"_m.$refKey").as(refKey),
          col("_m._d2").as("nn_dist2")): _*)
    }
  }

  /** Inverse-distance-weighted interpolation with the same dispatch.
    * `refs` must expose (refLon, refLat, valueCol). Below the
    * threshold: exact all-references IDW (w = 1/d², decimal-exact
    * sums, exact-hit rule) — the oracle-checked q134 contract. Above:
    * the standard radius-truncated IDW over a grid equi-join — each
    * point aggregates references within `radiusCells` cells (weights
    * beyond that are negligible by construction at real station
    * densities); same decimal-exact aggregation. */
  def idwJoin(
      points: DataFrame, pKeys: Seq[String], lonCol: String, latCol: String,
      refs: DataFrame, refLon: String, refLat: String, valueCol: String,
      cellDeg: Double, radiusCells: Int = 1,
      broadcastThreshold: Long = 10000L): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 12)
    val d2 = sq(col(lonCol) - col(refLon)) + sq(col(latCol) - col(refLat))
    def aggregate(joined: DataFrame): DataFrame =
      joined
        .withColumn("_d2", d2)
        .withColumn("_w", when(col("_d2") > 0d, lit(1.0d) / col("_d2")))
        .groupBy(pKeys.map(col): _*)
        .agg(min(when(col("_d2") === 0d, col(valueCol))).as("_hit"),
          sum(col("_w").cast(dec)).as("_sw"),
          sum((col("_w") * col(valueCol)).cast(dec)).as("_swv"))
        .select(pKeys.map(col) :+
          coalesce(col("_hit"),
            col("_swv").cast("double") / col("_sw").cast("double"))
            .as("idw_value"): _*)
    if (!graft.sources.ParquetStats.exceedsRows(refs, broadcastThreshold))
      aggregate(points.crossJoin(broadcast(refs)))
    else {
      val pts = points
        .withColumn("_px", floor(col(lonCol) / cellDeg).cast("long"))
        .withColumn("_py", floor(col(latCol) / cellDeg).cast("long"))
        .withColumn("_gx", explode(sequence(col("_px") - radiusCells,
          col("_px") + radiusCells)))
        .withColumn("_gy", explode(sequence(col("_py") - radiusCells,
          col("_py") + radiusCells)))
      val rf = refs
        .withColumn("_cx", floor(col(refLon) / cellDeg).cast("long"))
        .withColumn("_cy", floor(col(refLat) / cellDeg).cast("long"))
      aggregate(pts.join(rf,
        col("_gx") === col("_cx") && col("_gy") === col("_cy")))
    }
  }
}
