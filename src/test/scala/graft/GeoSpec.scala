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
}
