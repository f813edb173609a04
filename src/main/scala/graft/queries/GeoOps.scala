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

  // Real-world NUTS geometries are MULTIPOLYGONs with islands and holes
  // (`nuts_mapper.py:29-47`, `ecmwf.py:188-199`). These fixtures carry
  // an interior ring, a two-part multipolygon, and a part-with-hole +
  // plain-part combination; the oracle re-expresses even-odd
  // containment as half-plane algebra (outer AND NOT hole; part OR
  // part), so hole exclusion is hash-checked, not just spec-asserted.
  private val zones58 = Seq(
    ("holed_a",
      "POLYGON ((-150.0051 -60.0051, -60.0051 -60.0051, -60.0051 -10.0051, -150.0051 -10.0051, -150.0051 -60.0051), " +
        "(-120.0051 -45.0051, -90.0051 -45.0051, -90.0051 -25.0051, -120.0051 -25.0051, -120.0051 -45.0051))"),
    ("multi_b",
      "MULTIPOLYGON (((-40.0051 -80.0051, 0.0051 -80.0051, 0.0051 -50.0051, -40.0051 -50.0051, -40.0051 -80.0051)), " +
        "((10.0051 -40.0051, 40.0051 -40.0051, 40.0051 -20.0051, 10.0051 -20.0051, 10.0051 -40.0051)))"),
    ("multi_holed_c",
      "MULTIPOLYGON (((60.0051 10.0051, 170.0051 10.0051, 170.0051 80.0051, 60.0051 80.0051, 60.0051 10.0051), " +
        "(100.0051 30.0051, 130.0051 30.0051, 130.0051 60.0051, 100.0051 60.0051, 100.0051 30.0051)), " +
        "((60.0051 -80.0051, 170.0051 -80.0051, 170.0051 -30.0051, 60.0051 -30.0051, 60.0051 -80.0051)))"))

  private val zone58SqlConds = Seq(
    "holed_a" ->
      ("((lon > -150.0051 AND lon < -60.0051 AND lat > -60.0051 AND lat < -10.0051) AND NOT " +
        "(lon > -120.0051 AND lon < -90.0051 AND lat > -45.0051 AND lat < -25.0051))"),
    "multi_b" ->
      ("((lon > -40.0051 AND lon < 0.0051 AND lat > -80.0051 AND lat < -50.0051) OR " +
        "(lon > 10.0051 AND lon < 40.0051 AND lat > -40.0051 AND lat < -20.0051))"),
    "multi_holed_c" ->
      ("(((lon > 60.0051 AND lon < 170.0051 AND lat > 10.0051 AND lat < 80.0051) AND NOT " +
        "(lon > 100.0051 AND lon < 130.0051 AND lat > 30.0051 AND lat < 60.0051)) OR " +
        "(lon > 60.0051 AND lon < 170.0051 AND lat > -80.0051 AND lat < -30.0051))"))

  val qs: Seq[Q] = Seq(

    // J4 on real-geometry shapes — MULTIPOLYGON parts and interior
    // rings through the same broadcast bbox + even-odd ray-cast path as
    // q29. A point inside a hole must fall out to the NULL zone.
    Q("q58_multipolygon_join",
      (s, dir) => {
        val pts = Tables.load(s, dir, "customer")
          .select(col("c_custkey"),
            expr(lonExpr).as("lon"), expr(latExpr).as("lat"))
        val polys = s.createDataFrame(zones58).toDF("zone", "geometry")
        SpatialJoin.pointInPolygon(pts, "lon", "lat", polys, "geometry")
          .groupBy("zone")
          .agg(count(lit(1)).as("n"), sum(col("c_custkey")).as("keysum"))
          .orderBy(asc_nulls_first("zone"))
      },
      Some {
        val hits = zone58SqlConds.map { case (z, cond) =>
          s"SELECT '$z' AS zone, c_custkey FROM pts WHERE $cond"
        }.mkString(" UNION ALL ")
        val none = zone58SqlConds.map(_._2).mkString(" OR ")
        s"""WITH pts AS (SELECT c_custkey, $lonExpr AS lon, $latExpr AS lat
            FROM customer),
          hits AS ($hits
            UNION ALL
            SELECT CAST(NULL AS VARCHAR) AS zone, c_custkey FROM pts
            WHERE NOT ($none))
          SELECT zone, count(*) AS n, CAST(sum(c_custkey) AS BIGINT) AS keysum
          FROM hits GROUP BY zone ORDER BY zone NULLS FIRST"""
      }),

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

    // J4 scale path — grid-partitioned spatial join: polygons
    // replicated to covering 30°-grid cells, points hashed to their
    // cell, EQUI-join on cell id + residual bbox/ray-cast — the shape
    // that holds when the polygon side is too big to broadcast. Same
    // semantics as q29, so it shares q29's half-plane oracle.
    Q("q57_spatial_grid_join",
      (s, dir) => {
        val pts = Tables.load(s, dir, "customer")
          .select(col("c_custkey"),
            expr(lonExpr).as("lon"), expr(latExpr).as("lat"))
        val polys = s.createDataFrame(zones).toDF("zone", "geometry")
        SpatialJoin.gridJoin(pts, "lon", "lat", polys, "geometry", 30.0)
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

    // A11 — bounding-geometry aggregate (metadata concave-hull analog):
    // convex hull WKT of each segment's synthetic point cloud via the
    // custom bounded-state Aggregator. Hull WKT isn't ANSI-SQL, so the
    // oracle is a golden-VALUES snapshot pinned to the driver's verify
    // scale (sf0.01), independently validated against a monotone-chain
    // hull of the same synthetic points; HullInterpSpec additionally
    // checks correctness + partition invariance at any SF.
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
      Some("""SELECT c_mktsegment, hull_wkt FROM (VALUES
          ('AUTOMOBILE', 'POLYGON ((-179.92 49.28, -177.42 -53.22, -166.92 -87.72, -144.55 -89.05, 119.97000000000003 -89.73, 133.05 -87.45, 165.20999999999998 -76.89, 169.0 -71.0, 175.5 -49.5, 178.5 43.5, 164.20999999999998 72.11000000000001, 142.33999999999997 88.94, -66.57 89.13, -159.84 88.56, -172.92 86.28, -179.92 49.28))'),
          ('BUILDING', 'POLYGON ((-179.21 2.8900000000000006, -176.21 -84.11, -88.94 -89.54, 62.150000000000006 -89.35, 157.63 -88.67, 178.29000000000002 -74.61, 179.5 74.5, 160.92000000000002 81.72, 13.620000000000005 87.41999999999999, -115.1 85.9, -143.47 81.22999999999999, -157.05 63.44999999999999, -178.21 33.89, -179.21 2.8900000000000006))'),
          ('FURNITURE', 'POLYGON ((-179.71 -12.61, -178.42 -84.22, -156.05 -85.55, -31.120000000000005 -89.92, 168.5 -86.5, 179.29000000000002 -43.61, 179.79000000000002 -28.11, 179.57999999999998 33.78, 179.0 59.0, 136.33999999999997 82.94, 106.88999999999999 87.99000000000001, 26.69999999999999 89.69999999999999, -137.47 87.22999999999999, -178.92 80.28, -179.42 64.78, -179.71 -12.61))'),
          ('HOUSEHOLD', 'POLYGON ((-180.0 -90.0, -86.73 -89.43, 99.81 -88.29, 159.20999999999998 -82.89, 178.79000000000002 -59.11, 177.29000000000002 74.38999999999999, 170.20999999999998 78.11000000000001, 116.18 84.38, -8.75 88.75, -124.39 89.50999999999999, -165.84 82.56, -167.42 76.78, -170.13 61.16999999999999, -176.42 -22.22, -180.0 -90.0))'),
          ('MACHINERY', 'POLYGON ((-177.71 49.389999999999986, -176.92 -37.72, -175.21 -53.11, -165.34 -81.94, -153.84 -85.44, -133.68 -86.88, -28.909999999999997 -89.81, 122.18 -89.62, 155.42000000000002 -88.78, 170.70999999999998 -86.39, 174.5 -80.5, 177.79000000000002 89.88999999999999, 84.51999999999998 89.32, -102.02 88.18, -163.63 82.66999999999999, -176.71 80.38999999999999, -177.71 49.389999999999986))'))
        AS t(c_mktsegment, hull_wkt) ORDER BY c_mktsegment""")),

    // Nearest-station assignment — the reference's station-to-grid
    // matching shape (weather stations ↔ grid cells, units ↔ NUTS
    // centroids): every point gets its closest member of a small
    // reference set. The station dim BROADCASTS into the fact scan
    // (no shuffle of the points), and the argmin is a map-side-partial
    // struct-min — so cost is |points|·|stations| comparisons
    // streaming through codegen, one aggregate shuffle keyed on the
    // point. The metric is squared planar distance: a fixed
    // multiply/add expression evaluated identically in both engines
    // (geodesic haversine would drag in sin/cos, which are NOT
    // correctly-rounded IEEE ops and can differ across libm
    // implementations — for bit-exact verification the planar form is
    // the right contract; at real scale the same plan shape carries
    // any metric). Dispatch is SIZE-THRESHOLDED inside
    // SpatialJoin.nearestJoin: a reference set past the threshold
    // flips to the exact grid-bucketed two-phase join automatically
    // (ScaleSpec asserts the flip); the 25-row nation dim stays on
    // the broadcast path here.
    Q("q133_nearest_station",
      (s, dir) => {
        val pts = Tables.load(s, dir, "customer")
          .select(col("c_custkey"),
            expr(lonExpr).as("lon"), expr(latExpr).as("lat"))
        val stations = Tables.load(s, dir, "nation")
          .select(col("n_nationkey").cast("long").as("station"),
            expr("CAST((n_nationkey * 7919) % 360 AS DOUBLE) - 180.0")
              .as("slon"),
            expr("CAST((n_nationkey * 104729) % 180 AS DOUBLE) - 90.0")
              .as("slat"))
        graft.operators.SpatialJoin.nearestJoin(
            pts, Seq("c_custkey"), "lon", "lat",
            stations, "station", "slon", "slat", cellDeg = 30.0)
          .withColumnRenamed("nn_dist2", "dist2")
          .orderBy("c_custkey")
      },
      Some(s"""WITH pts AS (SELECT c_custkey, $lonExpr AS lon,
            $latExpr AS lat FROM customer),
        st AS (SELECT CAST(n_nationkey AS BIGINT) AS station,
            CAST((n_nationkey * 7919) % 360 AS DOUBLE) - 180.0 AS slon,
            CAST((n_nationkey * 104729) % 180 AS DOUBLE) - 90.0 AS slat
          FROM nation),
        d AS (SELECT c_custkey, station,
            (lon - slon) * (lon - slon) + (lat - slat) * (lat - slat)
              AS d2
          FROM pts CROSS JOIN st),
        r AS (SELECT c_custkey, station, d2, row_number() OVER (
            PARTITION BY c_custkey ORDER BY d2, station) AS rn FROM d)
        SELECT c_custkey, station, d2 AS dist2 FROM r WHERE rn = 1
        ORDER BY c_custkey""")),

    // Inverse-distance-weighted interpolation — the generic form of
    // the reference's grid-to-point weather interpolation (`dwd.py` /
    // `ecmwf.py` map reanalysis cells onto stations/NUTS): each target
    // gets Σ wᵢvᵢ / Σ wᵢ over the broadcast source set with w = 1/d².
    // Float sums are order-dependent, so both weight terms are cast to
    // DECIMAL(38,12) BEFORE summing (associative → partitioning- and
    // engine-independent), and the final ratio is one double division.
    // Same broadcast + map-side-partial aggregate shape as q133.
    Q("q134_idw_interpolation",
      (s, dir) => {
        // SpatialJoin.idwJoin carries the exact contract: decimal
        // (38,12) weight sums — scale 12, NOT higher, because both
        // engines cast double→decimal by rounding at the scale digit
        // and agree only within ~17 significant digits (scale 18
        // measurably diverged by 1 ulp) — and the exact-hit d2 = 0
        // rule (1/0 would poison the sums). Dispatch is size-
        // thresholded: a reference set past the threshold flips to
        // radius-truncated IDW over the cell grid; the 25-row nation
        // dim stays on the exact all-references broadcast path here.
        val pts = Tables.load(s, dir, "customer")
          .filter(col("c_custkey") < 300)
          .select(col("c_custkey"),
            expr(lonExpr).as("lon"), expr(latExpr).as("lat"))
        val st = Tables.load(s, dir, "nation")
          .select(
            expr("CAST((n_nationkey * 7919) % 360 AS DOUBLE) - 180.0")
              .as("slon"),
            expr("CAST((n_nationkey * 104729) % 180 AS DOUBLE) - 90.0")
              .as("slat"),
            expr("CAST((n_nationkey * 37) % 100 AS DOUBLE)").as("v"))
        graft.operators.SpatialJoin.idwJoin(
            pts, Seq("c_custkey"), "lon", "lat",
            st, "slon", "slat", "v", cellDeg = 30.0)
          .orderBy("c_custkey")
      },
      Some(s"""WITH pts AS (SELECT c_custkey, $lonExpr AS lon,
            $latExpr AS lat FROM customer WHERE c_custkey < 300),
        st AS (SELECT
            CAST((n_nationkey * 7919) % 360 AS DOUBLE) - 180.0 AS slon,
            CAST((n_nationkey * 104729) % 180 AS DOUBLE) - 90.0 AS slat,
            CAST((n_nationkey * 37) % 100 AS DOUBLE) AS v
          FROM nation),
        d AS (SELECT c_custkey, v,
            (lon - slon) * (lon - slon)
              + (lat - slat) * (lat - slat) AS d2
          FROM pts CROSS JOIN st),
        w AS (SELECT c_custkey, v, d2,
            CASE WHEN d2 > 0 THEN CAST(1 AS DOUBLE) / d2 END AS w
          FROM d)
        SELECT c_custkey,
          COALESCE(min(CASE WHEN d2 = 0 THEN v END),
            CAST(sum(CAST(w * v AS DECIMAL(38,12))) AS DOUBLE)
              / CAST(sum(CAST(w AS DECIMAL(38,12))) AS DOUBLE))
            AS idw_value
        FROM w GROUP BY c_custkey ORDER BY c_custkey""")),

    // 2-D density grid — the heat-density raster shape
    // (`nrw_kwp_waermedichte`: 12.7M geometries binned onto a map):
    // floor-bin both coordinates to a 10° grid and aggregate count +
    // exact balance sum per cell. ONE hash aggregate on the composite
    // cell key; integer floor-division binning (no float bin edges to
    // disagree on); the output is |cells|, never |points|.
    Q("q136_grid_density",
      (s, dir) => {
        val pts = Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_acctbal"),
            expr(lonExpr).as("lon"), expr(latExpr).as("lat"))
        pts
          .withColumn("cell_x",
            floor(col("lon") / 10d).cast("long"))
          .withColumn("cell_y",
            floor(col("lat") / 10d).cast("long"))
          .groupBy("cell_x", "cell_y")
          .agg(count(lit(1)).as("n"),
            graft.functions.ExactAgg.dsum(col("c_acctbal"))
              .as("balance_sum"))
          .orderBy("cell_x", "cell_y")
      },
      Some(s"""WITH pts AS (SELECT c_custkey, c_acctbal,
            $lonExpr AS lon, $latExpr AS lat FROM customer)
        SELECT CAST(floor(lon / 10) AS BIGINT) AS cell_x,
          CAST(floor(lat / 10) AS BIGINT) AS cell_y,
          count(*) AS n,
          ${graft.functions.ExactAgg.sqlSum("c_acctbal")} AS balance_sum
        FROM pts GROUP BY 1, 2 ORDER BY cell_x, cell_y""")),

    // Grid-partitioned DBSCAN over the integer customer lattice:
    // ε-cell candidate pairs → integer-exact ε-ball degrees → core
    // flag → connected components over core-core edges → deterministic
    // border attachment (min cluster label). At (ε=800, minPts=4) the
    // fixture yields ~99 clusters plus borders and noise, so all three
    // roles sit under the hash. The oracle replays the full density
    // clustering quadratically with a recursive-CTE component pass —
    // fixture-sized there, Σ cell² on the engine side.
    Q("q235_dbscan",
      (s, dir) => {
        val pts = Tables.load(s, dir, "customer")
          .select(col("c_custkey").as("id"),
            expr("(c_custkey * 7919) % 36000").as("x"),
            expr("(c_custkey * 104729) % 18000").as("y"))
        graft.operators.Dbscan.run(pts, "id", "x", "y",
            eps = 800L, minPts = 4)
          .orderBy("id")
      },
      Some("""WITH RECURSIVE pts AS (SELECT c_custkey AS id,
            (c_custkey * 7919) % 36000 AS x,
            (c_custkey * 104729) % 18000 AS y FROM customer),
        pairs AS (SELECT a.id AS u, b.id AS v FROM pts a JOIN pts b
          ON a.id < b.id
          AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
            <= 640000),
        deg AS (SELECT id, count(*) AS n FROM (
            SELECT u AS id FROM pairs
            UNION ALL SELECT v FROM pairs) GROUP BY 1),
        core AS (SELECT d.id FROM deg d WHERE d.n >= 4),
        ce AS (SELECT u, v FROM pairs
          WHERE u IN (SELECT id FROM core)
            AND v IN (SELECT id FROM core)),
        edges AS (SELECT u AS s, v AS d FROM ce
          UNION ALL SELECT v, u FROM ce),
        reach(node, lab) AS (
          SELECT id, id FROM core
          UNION
          SELECT e.d, r.lab FROM reach r JOIN edges e ON e.s = r.node),
        comp AS (SELECT node, min(lab) AS cluster FROM reach GROUP BY 1),
        bc AS (SELECT p.u AS bid, p.v AS cid FROM pairs p
            WHERE p.v IN (SELECT id FROM core)
              AND p.u NOT IN (SELECT id FROM core)
          UNION ALL
          SELECT p.v, p.u FROM pairs p
            WHERE p.u IN (SELECT id FROM core)
              AND p.v NOT IN (SELECT id FROM core)),
        border AS (SELECT bid AS id, min(c.cluster) AS cluster
          FROM bc JOIN comp c ON c.node = bc.cid GROUP BY 1)
        SELECT p.id,
          CASE WHEN co.id IS NOT NULL THEN 'core'
               WHEN b.id IS NOT NULL THEN 'border'
               ELSE 'noise' END AS role,
          coalesce(c.cluster, b.cluster) AS cluster
        FROM pts p
        LEFT JOIN core co ON co.id = p.id
        LEFT JOIN comp c ON c.node = p.id
        LEFT JOIN border b ON b.id = p.id
        ORDER BY p.id""")),

    // Geohash cell ids over the integer customer lattice — the
    // standard base-32 interleaved-bisection encoding
    // (longitude-first bit order), 4 chars ≈ 39 km cells, plus the
    // 2-char prefix roll-up (the multi-zoom density table a tile
    // server reads). ONE term renderer emits both engines' arithmetic
    // (`Geohash.sqlExpr` — the ZOrder discipline), so every base-32
    // character is bit-exact under the hash. Map-side encode, one
    // hash aggregate for the prefix counts.
    Q("q241_geohash",
      (s, dir) => {
        import graft.functions.Geohash
        val gh4 = Geohash.sqlExpr("x", "y", 36000L, 18000L, 4, "DIV")
        val pts = Tables.load(s, dir, "customer")
          .select(col("c_custkey"),
            expr("(c_custkey * 7919) % 36000").as("x"),
            expr("(c_custkey * 104729) % 18000").as("y"))
          .withColumn("gh4", expr(gh4))
          .withColumn("gh2", expr("substr(gh4, 1, 2)"))
        val pref = pts.groupBy("gh2")
          .agg(count(lit(1)).as("cell_n"))
        pts.join(pref, Seq("gh2"))
          .select(col("c_custkey"), col("gh4"), col("gh2"),
            col("cell_n"))
          .orderBy("c_custkey")
      },
      Some {
        import graft.functions.Geohash
        val gh4 = Geohash.sqlExpr("x", "y", 36000L, 18000L, 4, "//")
        s"""WITH pts AS (SELECT c_custkey,
            (c_custkey * 7919) % 36000 AS x,
            (c_custkey * 104729) % 18000 AS y FROM customer),
        g AS (SELECT c_custkey, $gh4 AS gh4 FROM pts),
        g2 AS (SELECT c_custkey, gh4, substr(gh4, 1, 2) AS gh2 FROM g),
        pref AS (SELECT gh2, CAST(count(*) AS BIGINT) AS cell_n
          FROM g2 GROUP BY 1)
        SELECT c_custkey, gh4, g2.gh2, cell_n
        FROM g2 JOIN pref ON pref.gh2 = g2.gh2
        ORDER BY c_custkey"""
      })
  )
}
