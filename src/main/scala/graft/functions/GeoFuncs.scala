package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** Geospatial primitives without an external geo dependency (the build
  * is offline): WKT codecs, ray-casting point-in-polygon, centroid,
  * GeoJSON encoding — the exact function set the reference uses
  * (`ST_MakePoint`/`ST_Contains`-style sites: `dwd.py:46-59`,
  * `scigrid.py:71-100`, `ecmwf.py:193-206`, `nuts_mapper.py:44-46`,
  * `metadata_sql_helpers.sql:84-124`, `open_nrw.json:188`).
  *
  * Geometry travels as WKT strings (SURVEY.md §1.1); functions are Scala
  * UDFs in v0 (SURVEY.md §2.11) — all are broadcast-side or map-side, so
  * they never gate a shuffle.
  */
object GeoFuncs {

  /** Parse `POLYGON ((x y, x y, ...))` → outer ring vertices.
    * Tolerates an optional `SRID=nnnn;` prefix (reference strips SRIDs
    * at `scigrid.py:48-61`). */
  def parsePolygon(wkt: String): Array[(Double, Double)] = {
    val body = wkt.substring(wkt.indexOf('(')).replace("(", "").replace(")", "")
    body.split(",").map { pt =>
      val xs = pt.trim.split("\\s+")
      (xs(0).toDouble, xs(1).toDouble)
    }
  }

  def parsePoint(wkt: String): (Double, Double) = {
    val body = wkt.substring(wkt.indexOf('(') + 1, wkt.indexOf(')'))
    val xs = body.trim.split("\\s+")
    (xs(0).toDouble, xs(1).toDouble)
  }

  /** Ray-casting even-odd point-in-polygon on the outer ring. Points on
    * an edge follow the half-open convention (deterministic). */
  def containsPoint(ring: Array[(Double, Double)], x: Double, y: Double)
      : Boolean = {
    var inside = false
    var i = 0
    var j = ring.length - 1
    while (i < ring.length) {
      val (xi, yi) = ring(i)
      val (xj, yj) = ring(j)
      if ((yi > y) != (yj > y) &&
          x < (xj - xi) * (y - yi) / (yj - yi) + xi) {
        inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  def bbox(ring: Array[(Double, Double)]): (Double, Double, Double, Double) =
    (ring.map(_._1).min, ring.map(_._2).min,
      ring.map(_._1).max, ring.map(_._2).max)

  def centroid(ring: Array[(Double, Double)]): (Double, Double) = {
    // area-weighted polygon centroid (shoelace); ring closed or open
    val closed = if (ring.head == ring.last) ring else ring :+ ring.head
    var a = 0.0; var cx = 0.0; var cy = 0.0
    var i = 0
    while (i < closed.length - 1) {
      val (x0, y0) = closed(i); val (x1, y1) = closed(i + 1)
      val cross = x0 * y1 - x1 * y0
      a += cross; cx += (x0 + x1) * cross; cy += (y0 + y1) * cross
      i += 1
    }
    if (a == 0.0) (ring.map(_._1).sum / ring.length,
      ring.map(_._2).sum / ring.length)
    else (cx / (3 * a), cy / (3 * a))
  }

  // ---- Column-level API (UDFs registered once per session) ----

  val stContains =
    udf((polyWkt: String, x: Double, y: Double) =>
      containsPoint(parsePolygon(polyWkt), x, y))

  val stPoint =
    udf((x: Double, y: Double) => s"POINT ($x $y)")

  val stCentroidX = udf((wkt: String) => centroid(parsePolygon(wkt))._1)
  val stCentroidY = udf((wkt: String) => centroid(parsePolygon(wkt))._2)

  val stAsGeoJson = udf { (wkt: String) =>
    if (wkt.startsWith("POINT")) {
      val (x, y) = parsePoint(wkt)
      s"""{"type":"Point","coordinates":[$x,$y]}"""
    } else {
      val ring = parsePolygon(wkt)
      val coords = ring.map { case (x, y) => s"[$x,$y]" }.mkString(",")
      s"""{"type":"Polygon","coordinates":[[$coords]]}"""
    }
  }

  def stContains(poly: Column, x: Column, y: Column): Column =
    stContains.apply(poly, x, y)

  /** SQL registration for dashboard-parity queries. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("st_contains", stContains)
    spark.udf.register("st_point", stPoint)
    spark.udf.register("st_asgeojson", stAsGeoJson)
    spark.udf.register("st_centroid_x", stCentroidX)
    spark.udf.register("st_centroid_y", stCentroidY)
  }
}
