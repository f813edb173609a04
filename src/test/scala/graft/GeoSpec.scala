package graft

import org.apache.spark.sql.functions._

import graft.functions.GeoFuncs
import graft.operators.SpatialJoin

class GeoSpec extends SparkSpec {
  import spark.implicits._

  private val square = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
  private val triangle = "POLYGON ((0 0, 10 0, 0 10, 0 0))"

  test("parsePolygon extracts ring vertices; SRID prefix tolerated") {
    assert(GeoFuncs.parsePolygon(square).length == 5)
    assert(GeoFuncs.parsePolygon("SRID=4326;" + square).length == 5)
    assert(GeoFuncs.parsePoint("POINT (3.5 -2.25)") == ((3.5, -2.25)))
  }

  test("containsPoint: inside/outside/concave-safe") {
    val sq = GeoFuncs.parsePolygon(square)
    assert(GeoFuncs.containsPoint(sq, 5, 5))
    assert(!GeoFuncs.containsPoint(sq, 15, 5))
    assert(!GeoFuncs.containsPoint(sq, -1, -1))
    val tri = GeoFuncs.parsePolygon(triangle)
    assert(GeoFuncs.containsPoint(tri, 2, 2))
    assert(!GeoFuncs.containsPoint(tri, 7, 7)) // beyond hypotenuse
  }

  test("centroid of square is its center") {
    val (cx, cy) = GeoFuncs.centroid(GeoFuncs.parsePolygon(square))
    assert(math.abs(cx - 5.0) < 1e-12 && math.abs(cy - 5.0) < 1e-12)
  }

  test("bbox computed from ring") {
    assert(GeoFuncs.bbox(GeoFuncs.parsePolygon(triangle)) ==
      ((0.0, 0.0, 10.0, 10.0)))
  }

  test("pointInPolygon left-join tags points, leaves misses null") {
    val pts = Seq((1L, 5.0, 5.0), (2L, 2.0, 1.0), (3L, 50.0, 50.0))
      .toDF("id", "lon", "lat")
    val polys = Seq(("sq", square)).toDF("zone", "geometry")
    val out = SpatialJoin.pointInPolygon(pts, "lon", "lat",
      polys, "geometry").orderBy("id")
      .select("id", "zone").collect()
    assert(out.map(r => Option(r.get(1))).toSeq ==
      Seq(Some("sq"), Some("sq"), None))
  }

  test("gridJoin matches the broadcast pointInPolygon result") {
    // synthetic points spanning multiple grid cells, polygons straddling
    // cell boundaries (the square crosses the 0° cell edge when
    // cellDeg=4, so replication across cells is exercised)
    val pts = (0 until 200).map { i =>
      (i.toLong, (i * 7 % 60) - 30.0 + 0.5, (i * 13 % 40) - 20.0 + 0.5)
    }.toDF("id", "lon", "lat")
    val polys = Seq(
      ("sq", square),
      ("tri", triangle),
      ("west", "POLYGON ((-25 -15, -5 -15, -5 15, -25 15, -25 -15))"))
      .toDF("zone", "geometry")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "zone").collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString)))
        .toSeq.sorted
    val broadcastJoin = SpatialJoin.pointInPolygon(
      pts, "lon", "lat", polys, "geometry")
    val grid = SpatialJoin.gridJoin(
      pts, "lon", "lat", polys, "geometry", 4.0)
    assert(norm(grid) == norm(broadcastJoin))
    assert(grid.columns.toSet == broadcastJoin.columns.toSet)
  }

  test("stAsGeoJson encodes points and polygons") {
    val df = Seq("POINT (1.5 2.5)").toDF("g")
    val js = df.select(GeoFuncs.stAsGeoJson($"g")).as[String].head()
    assert(js == """{"type":"Point","coordinates":[1.5,2.5]}""")
  }

  // ---- multipart / holed geometry (real NUTS shapes) ----

  private val holed =
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"
  private val multi =
    "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)), ((20 20, 30 20, 30 30, 20 30, 20 20)))"
  private val multiHoled =
    "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3)), " +
      "((20 20, 30 20, 30 30, 20 30, 20 20)))"

  test("parseGeometry: ring structure; unsupported types throw") {
    val g = GeoFuncs.parseGeometry(multiHoled)
    assert(g.length == 2 && g(0).length == 2 && g(1).length == 1)
    assert(GeoFuncs.parseGeometry("SRID=4326;" + holed)(0).length == 2)
    intercept[IllegalArgumentException] {
      GeoFuncs.parseGeometry("LINESTRING (0 0, 1 1)")
    }
    intercept[IllegalArgumentException] {
      GeoFuncs.parsePolygon(multi) // multipart via the single-ring API
    }
  }

  test("even-odd containment: holes excluded, all parts included") {
    val g = GeoFuncs.parseGeometry(multiHoled)
    assert(GeoFuncs.containsPointGeom(g, 1.0, 1.0))   // in part 1, off hole
    assert(!GeoFuncs.containsPointGeom(g, 5.0, 5.0))  // inside the hole
    assert(GeoFuncs.containsPointGeom(g, 25.0, 25.0)) // in part 2
    assert(!GeoFuncs.containsPointGeom(g, 15.0, 15.0)) // between parts
  }

  test("pointInPolygon honors holes and multipolygon parts") {
    val pts = Seq(
      (1L, 1.0, 1.0),   // part 1, outside hole -> hit
      (2L, 5.0, 5.0),   // inside hole -> miss
      (3L, 25.0, 25.0), // part 2 -> hit
      (4L, 15.0, 15.0)) // between parts -> miss
      .toDF("id", "lon", "lat")
    val polys = Seq(("mh", multiHoled)).toDF("zone", "geometry")
    val out = SpatialJoin.pointInPolygon(pts, "lon", "lat",
      polys, "geometry").orderBy("id")
      .select("id", "zone").collect()
    assert(out.map(r => Option(r.get(1))).toSeq ==
      Seq(Some("mh"), None, Some("mh"), None))
  }

  test("gridJoin matches broadcast join on multipart/holed geometry") {
    val pts = (0 until 300).map { i =>
      (i.toLong, (i * 7 % 70) - 5.0 + 0.5, (i * 13 % 70) - 5.0 + 0.5)
    }.toDF("id", "lon", "lat")
    val polys = Seq(("h", holed), ("m", multi)).toDF("zone", "geometry")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "zone").collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString)))
        .toSeq.sorted
    assert(
      norm(SpatialJoin.gridJoin(pts, "lon", "lat", polys, "geometry", 4.0)) ==
        norm(SpatialJoin.pointInPolygon(pts, "lon", "lat", polys, "geometry")))
  }

  test("centroid of holed/multi geometry is area-weighted") {
    // symmetric hole -> centroid stays at the center
    val (hx, hy) = GeoFuncs.centroidGeom(GeoFuncs.parseGeometry(holed))
    assert(math.abs(hx - 5.0) < 1e-12 && math.abs(hy - 5.0) < 1e-12)
    // two equal squares -> midpoint of their centers
    val (mx, my) = GeoFuncs.centroidGeom(GeoFuncs.parseGeometry(multi))
    assert(math.abs(mx - 15.0) < 1e-12 && math.abs(my - 15.0) < 1e-12)
    // asymmetric hole pulls the centroid away from it: hole in the +x
    // half pulls centroid to -x
    val asym =
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (6 4, 9 4, 9 7, 6 7, 6 4))"
    val (ax, _) = GeoFuncs.centroidGeom(GeoFuncs.parseGeometry(asym))
    assert(ax < 5.0)
  }

  test("stAsGeoJson encodes holes and MultiPolygon") {
    assert(GeoFuncs.toGeoJson(holed) ==
      """{"type":"Polygon","coordinates":[[[0.0,0.0],[10.0,0.0],[10.0,10.0],[0.0,10.0],[0.0,0.0]],[[3.0,3.0],[7.0,3.0],[7.0,7.0],[3.0,7.0],[3.0,3.0]]]}""")
    assert(GeoFuncs.toGeoJson(multi).startsWith("""{"type":"MultiPolygon","coordinates":[[["""))
  }

  // ---- ST_Transform (EPSG:25832 <-> 4326) ----

  test("UTM32 transform: central meridian, equator, round trips") {
    // central meridian maps to the false easting exactly
    val (e0, n0) = GeoFuncs.lonLatToUtm32(9.0, 0.0)
    assert(math.abs(e0 - 500000.0) < 1e-6 && math.abs(n0) < 1e-6)
    val (e50, n50) = GeoFuncs.lonLatToUtm32(9.0, 50.0)
    assert(math.abs(e50 - 500000.0) < 1e-6 && n50 > 5000000 && n50 < 6000000)
    // round trip over the zone's usable extent: sub-micrometer residual
    for (lon <- 5 to 13; lat <- 38 to 62 by 3) {
      val (e, n) = GeoFuncs.lonLatToUtm32(lon.toDouble, lat.toDouble)
      val (lon2, lat2) = GeoFuncs.utm32ToLonLat(e, n)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"round trip drifted at ($lon, $lat): ($lon2, $lat2)")
    }
  }

  test("UTM32 transform: central-meridian scale factor is k0 = 0.9996") {
    // ΔN over a short meridian arc divided by the true geodesic arc
    // length M(φ)·Δφ must equal k0 — an independent check of the
    // series constants against the ellipsoid definition
    val f = 1.0 / 298.257222101
    val e2 = f * (2 - f)
    val phi = math.toRadians(50.0)
    val m = 6378137.0 * (1 - e2) /
      math.pow(1 - e2 * math.sin(phi) * math.sin(phi), 1.5)
    val dPhiDeg = 1e-4
    val (_, n1) = GeoFuncs.lonLatToUtm32(9.0, 50.0)
    val (_, n2) = GeoFuncs.lonLatToUtm32(9.0, 50.0 + dPhiDeg)
    val scale = (n2 - n1) / (m * math.toRadians(dPhiDeg))
    assert(math.abs(scale - 0.9996) < 1e-6, s"meridian scale $scale")
  }

  test("UTM32 transform: plausible easting away from the meridian") {
    // ~2.6° east at 48°N ≈ 192 km of easting offset (+ convergence)
    val (e, n) = GeoFuncs.lonLatToUtm32(11.575, 48.137)
    assert(e > 688000 && e < 695000, s"easting $e")
    assert(n > 5300000 && n < 5370000, s"northing $n")
  }

  test("transformWkt maps polygon coords; unsupported pair throws") {
    val utmSquare = GeoFuncs.transformWkt(square, 4326, 25832)
    val back = GeoFuncs.transformWkt(utmSquare, 25832, 4326)
    val orig = GeoFuncs.parseGeometry(square).head.head
    val rt = GeoFuncs.parseGeometry(back).head.head
    orig.zip(rt).foreach { case ((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) < 1e-9 && math.abs(y1 - y2) < 1e-9)
    }
    assert(GeoFuncs.transformWkt("POINT (3 4)", 4326, 4326) ==
      "POINT (3.0 4.0)")
    intercept[IllegalArgumentException] {
      GeoFuncs.transformWkt(square, 3857, 4326)
    }
  }

  // ---- ST_Simplify (Douglas–Peucker) ----

  test("simplifyWkt drops sub-tolerance vertices, keeps shape") {
    // square with collinear midpoints and a 0.1-deep notch
    val noisy = "POLYGON ((0 0, 5 0.1, 10 0, 10 5, 10 10, 5 10, " +
      "0 10, 0 5, 0 0))"
    val out = GeoFuncs.simplifyWkt(noisy, 0.5)
    val ring = GeoFuncs.parseGeometry(out).head.head
    assert(ring.length == 5, s"expected the 4 corners + closure: $out")
    // under-tolerance: the above-tolerance notch survives, while
    // EXACTLY-collinear edge midpoints drop at any tolerance (their
    // deviation is zero — standard Douglas–Peucker)
    val keep = GeoFuncs.simplifyWkt(noisy, 0.01)
    assert(GeoFuncs.parseGeometry(keep).head.head.length == 6)
    assert(keep.contains("5.0 0.1"), s"notch must survive: $keep")
  }

  test("simplifyWkt never collapses a ring below a valid polygon") {
    val sliver = "POLYGON ((0 0, 10 0.001, 20 0, 0 0))"
    val out = GeoFuncs.simplifyWkt(sliver, 5.0)
    assert(GeoFuncs.parseGeometry(out).head.head.length >= 4)
  }

  test("st_transform and st_simplify are registered SQL functions") {
    GeoFuncs.register(spark)
    val r = spark.sql(
      s"SELECT st_simplify(st_transform('SRID=4326;$square', 25832), 1.0) AS g")
      .collect().head.getString(0)
    assert(r.startsWith("SRID=25832;POLYGON"), r)
  }

  // ---- the reference's bounding-geometry metadata helpers, VERBATIM --

  private def hullProps(wkt: String,
      inputs: Seq[(Double, Double)]): Unit = {
    val (_, bare) = GeoFuncs.splitSrid(wkt)
    assert(bare.startsWith("POLYGON"), s"expected POLYGON: $wkt")
    val ring = GeoFuncs.parseGeometry(bare).head.head
    // hull vertices are drawn from the input points (within transform
    // round-off)
    ring.dropRight(1).foreach { case (x, y) =>
      assert(inputs.exists { case (px, py) =>
        math.abs(px - x) < 1e-6 && math.abs(py - y) < 1e-6
      }, s"hull vertex ($x, $y) is not an input point")
    }
  }

  test("point-table bounding-geometry helper runs verbatim") {
    GeoFuncs.register(spark)
    import spark.implicits._
    val pts = Seq(
      (6.0, 50.0), (7.0, 50.0), (8.0, 50.0), (8.0, 51.0), (8.0, 52.0),
      (7.0, 52.0), (6.0, 52.0), (6.0, 51.0), (6.9, 50.9), (7.1, 51.1),
      (7.0, 51.0))
    pts.toDF("lon", "lat").createOrReplaceTempView("buildings")
    // metadata_sql_helpers.sql:84-97, schema prefix dropped
    val wkt = spark.sql("""SELECT
    ST_Transform(
        ST_ConcaveHull(
            ST_Collect(
                ST_SetSRID(
                    ST_MakePoint(lon, lat),
                    4326
                )
            ),
            0.5
        ),
        4326
    ) AS bounding_geometry
FROM
    buildings""").collect().head.getString(0)
    hullProps(wkt, pts)
  }

  test("geometry-table bounding-geometry helper runs verbatim") {
    GeoFuncs.register(spark)
    import spark.implicits._
    // small parcel polygons in EPSG:25832 around the zone center
    def sq(cx: Double, cy: Double, r: Double) =
      s"SRID=25832;POLYGON ((${cx - r} ${cy - r}, ${cx + r} ${cy - r}, " +
        s"${cx + r} ${cy + r}, ${cx - r} ${cy + r}, ${cx - r} ${cy - r}))"
    val geoms = Seq(sq(500000, 5640000, 100), sq(510000, 5650000, 100),
      sq(490000, 5655000, 100), sq(505000, 5660000, 100))
    geoms.toDF("geometry").createOrReplaceTempView("waermedichte")
    // metadata_sql_helpers.sql:100-104, schema prefix dropped
    val wkt = spark.sql(
      """SELECT
    ST_Transform(ST_ConcaveHull(ST_Collect(ST_Points(ST_Simplify(geometry, 20))),0.5), 4326) AS bounding_geometry
FROM
    waermedichte""").collect().head.getString(0)
    val (srid, bare) = GeoFuncs.splitSrid(wkt)
    assert(srid.contains(4326) && bare.startsWith("POLYGON"), wkt)
    // the transformed hull must land in lon/lat around the UTM32 zone
    GeoFuncs.parseGeometry(bare).head.head.foreach { case (lon, lat) =>
      assert(lon > 8 && lon < 10 && lat > 50 && lat < 52,
        s"implausible transformed vertex ($lon, $lat)")
    }
  }

  test("concaveHull digs below the convex area; pct=1 is convex") {
    // plus-shape point set: concave hull should dig into the notches
    val pts = (for (x <- 0 to 10; y <- 0 to 10
      if (x >= 4 && x <= 6) || (y >= 4 && y <= 6))
      yield s"(${x}.0 ${y}.0)").mkString("MULTIPOINT (", ", ", ")")
    val convex = GeoFuncs.concaveHull(pts, 1.0)
    val concave = GeoFuncs.concaveHull(pts, 0.55)
    def area(wkt: String): Double = {
      val ring = GeoFuncs.parseGeometry(wkt).head.head
      math.abs(ring.dropRight(1).zipWithIndex.map { case ((x0, y0), i) =>
        val (x1, y1) = ring((i + 1) % (ring.length - 1))
        x0 * y1 - x1 * y0
      }.sum) / 2
    }
    assert(area(concave) < area(convex),
      s"concave ${area(concave)} !< convex ${area(convex)}")
    assert(area(concave) <= 0.55 * area(convex) * 1.05 ||
      area(concave) < area(convex) * 0.8,
      s"dig did not approach target: ${area(concave)} vs ${area(convex)}")
  }

  test("Dbscan: planted blobs get distinct clusters, roles and " +
      "min-label border attachment hold across partitionings") {
    import spark.implicits._
    // blob A: 5 points in a tight knot around (0,0); blob B: same
    // around (1000,1000); a lone point far away; a border point 90
    // units from blob A's edge (within eps of ONE core only)
    val a = Seq((0L, 0L, 0L), (1L, 10L, 0L), (2L, 0L, 10L),
      (3L, 10L, 10L), (4L, 5L, 5L))
    val b = Seq((10L, 1000L, 1000L), (11L, 1010L, 1000L),
      (12L, 1000L, 1010L), (13L, 1010L, 1010L), (14L, 1005L, 1005L))
    val lone = Seq((20L, 5000L, 5000L))
    val borderPt = Seq((30L, 105L, 0L)) // within 100 of ids 1,3 only
    val pts = (a ++ b ++ lone ++ borderPt).toDF("id", "x", "y")
    def runIt(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Dbscan.run(df, "id", "x", "y",
          eps = 100L, minPts = 3)
        .collect()
        .map(r => r.getLong(0) ->
          (r.getString(1),
            if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    val out = runIt(pts)
    // every blob member is core (4 in-knot neighbors each)
    a.foreach { case (id, _, _) => assert(out(id)._1 == "core") }
    b.foreach { case (id, _, _) => assert(out(id)._1 == "core") }
    // blobs are distinct clusters, labelled by their min member
    assert(out(0L)._2 == 0L && out(10L)._2 == 10L)
    assert(a.forall { case (id, _, _) => out(id)._2 == 0L })
    assert(b.forall { case (id, _, _) => out(id)._2 == 10L })
    assert(out(20L) == ("noise", -1L))
    // the edge point neighbors cores 1 and 3 but only has 2 neighbors
    // itself: border, attached to blob A's label
    assert(out(30L) == ("border", 0L))
    // partitioning-invariant
    assert(runIt(pts.repartition(7)) == out)
  }

  test("Geohash: lattice encoding matches the public geohash of the " +
      "same coordinates") {
    import spark.implicits._
    import graft.functions.Geohash
    // x=19041 → lon 10.41, y=14765 → lat 57.65: the canonical
    // Jutland example point rounds to geohash prefix u4pr
    val got = Seq((19041L, 14765L)).toDF("x", "y")
      .selectExpr(Geohash.sqlExpr("x", "y", 36000L, 18000L, 4, "DIV"))
      .as[String].head()
    assert(got == "u4pr", s"got $got")
    // origin corner and max corner stay in-alphabet and distinct
    val corners = Seq((0L, 0L), (35999L, 17999L)).toDF("x", "y")
      .selectExpr(Geohash.sqlExpr("x", "y", 36000L, 18000L, 4, "DIV"))
      .as[String].collect().toSeq
    assert(corners.distinct.size == 2 &&
      corners.forall(_.forall(Geohash.Alphabet.contains(_))))
    assert(corners.head == "0000") // (-180,-90) is all-zero bits
  }
}
