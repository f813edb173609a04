package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables
import graft.operators.SpatialJoin

/** Geo operators (reference J4 spatial join, F7 geo scalars, Q5 geo-dim
  * aggregation). TESTDATA has no geometry, so points are derived
  * deterministically from customer keys and the polygon dimension is a
  * literal WKT table — the operator surface (WKT parse, bbox prune,
  * ray-cast containment, broadcast join, group-by-zone) is identical to
  * the reference's NUTS enrichment. The oracle re-expresses containment
  * of the convex test polygons as half-plane predicates, so even the
  * spatial join is hash-checked.
  */
object GeoOps {

  // zone -> WKT (convex; offsets .0051 keep the 0.01-grid points off
  // every edge so both engines classify identically)
  private val zones = Seq(
    ("rect_a",
      "POLYGON ((-150.0051 -60.0051, -60.0051 -60.0051, -60.0051 -10.0051, -150.0051 -10.0051, -150.0051 -60.0051))"),
    ("rect_b",
      "POLYGON ((-40.0051 -80.0051, 40.0051 -80.0051, 40.0051 -20.0051, -40.0051 -20.0051, -40.0051 -80.0051))"),
    ("rect_c",
      "POLYGON ((60.0051 10.0051, 170.0051 10.0051, 170.0051 80.0051, 60.0051 80.0051, 60.0051 10.0051))"),
    ("tri_d",
      "POLYGON ((0.0051 0.0051, 120.0051 0.0051, 0.0051 80.0051, 0.0051 0.0051))"))

  /** Deterministic synthetic points from customer keys (2-decimal
    * grid). */
  private val lonExpr = "CAST((c_custkey * 7919) % 36000 AS DOUBLE) / 100.0 - 180.0"
  private val latExpr = "CAST((c_custkey * 104729) % 18000 AS DOUBLE) / 100.0 - 90.0"

  private val zoneSqlConds = Seq(
    "rect_a" ->
      "(lon > -150.0051 AND lon < -60.0051 AND lat > -60.0051 AND lat < -10.0051)",
    "rect_b" ->
      "(lon > -40.0051 AND lon < 40.0051 AND lat > -80.0051 AND lat < -20.0051)",
    "rect_c" ->
      "(lon > 60.0051 AND lon < 170.0051 AND lat > 10.0051 AND lat < 80.0051)",
    "tri_d" ->
      ("(lat > 0.0051 AND lon > 0.0051 AND " +
        "((0.0051 - 120.0051) * (lat - 0.0051) - (80.0051 - 0.0051) * (lon - 120.0051)) > 0)"))

  val qs: Seq[Q] = Seq(

    // J4 + Q5 — point-in-polygon broadcast join then group-by-zone
    // aggregate (the ecmwf_eu NUTS-enrichment shape).
    Q("q29_spatial_join",
      (s, dir) => {
        val pts = Tables.load(s, dir, "customer")
          .select(col("c_custkey"),
            expr(lonExpr).as("lon"), expr(latExpr).as("lat"))
        val polys = s.createDataFrame(zones).toDF("zone", "geometry")
        SpatialJoin.pointInPolygon(pts, "lon", "lat", polys, "geometry")
          .groupBy("zone")
          .agg(count(lit(1)).as("n"), sum(col("c_custkey")).as("keysum"))
          .orderBy(asc_nulls_first("zone"))
      },
      Some {
        val hits = zoneSqlConds.map { case (z, cond) =>
          s"SELECT '$z' AS zone, c_custkey FROM pts WHERE $cond"
        }.mkString(" UNION ALL ")
        val none = zoneSqlConds.map(_._2).mkString(" OR ")
        s"""WITH pts AS (SELECT c_custkey, $lonExpr AS lon, $latExpr AS lat
            FROM customer),
          hits AS ($hits
            UNION ALL
            SELECT CAST(NULL AS VARCHAR) AS zone, c_custkey FROM pts
            WHERE NOT ($none))
          SELECT zone, count(*) AS n, CAST(sum(c_custkey) AS BIGINT) AS keysum
          FROM hits GROUP BY zone ORDER BY zone NULLS FIRST"""
      }),

    // F7 — geo scalar functions: centroid + GeoJSON of the polygon dim.
    // The dimension is a frozen literal, so the oracle pins the exact
    // expected outputs (golden VALUES) — shortest-round-trip double
    // literals parse back bit-identical.
    Q("q30_geo_scalars",
      (s, dir) => {
        val polys = s.createDataFrame(zones).toDF("zone", "geometry")
        polys.select(col("zone"),
            graft.functions.GeoFuncs.stCentroidX(col("geometry"))
              .cast(DoubleType).as("cx"),
            graft.functions.GeoFuncs.stCentroidY(col("geometry"))
              .cast(DoubleType).as("cy"),
            graft.functions.GeoFuncs.stAsGeoJson(col("geometry"))
              .as("geojson"))
          .orderBy("zone")
      },
      Some("""SELECT zone, CAST(cx AS DOUBLE) AS cx,
          CAST(cy AS DOUBLE) AS cy, geojson
        FROM (VALUES
          ('rect_a', '-105.00509999999998', '-35.00509999999999',
           '{"type":"Polygon","coordinates":[[[-150.0051,-60.0051],[-60.0051,-60.0051],[-60.0051,-10.0051],[-150.0051,-10.0051],[-150.0051,-60.0051]]]}'),
          ('rect_b', '0.0', '-50.005100000000006',
           '{"type":"Polygon","coordinates":[[[-40.0051,-80.0051],[40.0051,-80.0051],[40.0051,-20.0051],[-40.0051,-20.0051],[-40.0051,-80.0051]]]}'),
          ('rect_c', '115.00509999999997', '45.00509999999999',
           '{"type":"Polygon","coordinates":[[[60.0051,10.0051],[170.0051,10.0051],[170.0051,80.0051],[60.0051,80.0051],[60.0051,10.0051]]]}'),
          ('tri_d', '40.0051', '26.67176666666666',
           '{"type":"Polygon","coordinates":[[[0.0051,0.0051],[120.0051,0.0051],[0.0051,80.0051],[0.0051,0.0051]]]}'))
        AS t(zone, cx, cy, geojson) ORDER BY zone""")),

    // A11 — bounding-geometry aggregate (metadata concave-hull analog):
    // convex hull WKT of each segment's synthetic point cloud via the
    // custom bounded-state Aggregator (rows-only; hull WKT isn't
    // ANSI-SQL — HullInterpSpec checks correctness + partition
    // invariance).
    Q("q43_hull_aggregate",
      (s, dir) => {
        val pts = Tables.load(s, dir, "customer")
          .select(col("c_mktsegment"),
            expr(lonExpr).as("lon"), expr(latExpr).as("lat"))
        pts.groupBy("c_mktsegment")
          .agg(graft.expressions.HullAggregate
            .hullWkt(col("lon"), col("lat")).as("hull_wkt"))
          .orderBy("c_mktsegment")
      },
      None)
  )
}
