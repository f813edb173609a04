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
  *
  * Supported geometry: POINT, POLYGON (with interior rings / holes),
  * MULTIPOLYGON — the types NUTS region files actually carry
  * (`nuts_mapper.py:29-47`, `ecmwf.py:188-199` read multipart
  * geometries with islands and holes). Anything else throws at parse
  * time: a silent mis-parse would return plausible-but-wrong
  * containment answers, which is strictly worse than failing.
  */
object GeoFuncs {

  /** One linear ring: closed or open vertex list. */
  type Ring = Array[(Double, Double)]

  /** One polygon: head = outer ring, tail = interior rings (holes). */
  type Poly = Array[Ring]

  // ---- WKT parsing ----

  /** Split a WKT body on commas at parenthesis depth 0. */
  private def splitTop(s: String): Array[String] = {
    val out = Array.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }

  private def stripOuterParens(s: String): String = {
    val t = s.trim
    require(t.length >= 2 && t.charAt(0) == '(' && t.charAt(t.length - 1) == ')',
      s"malformed WKT fragment (expected parenthesised group): $t")
    t.substring(1, t.length - 1)
  }

  private def parseRing(s: String): Ring =
    stripOuterParens(s).split(",").map { pt =>
      val xs = pt.trim.split("\\s+")
      (xs(0).toDouble, xs(1).toDouble)
    }

  private def parsePolyBody(s: String): Poly =
    splitTop(stripOuterParens(s)).map(parseRing)

  /** Parse POLYGON / MULTIPOLYGON WKT (optionally `SRID=nnnn;`-prefixed
    * — reference strips SRIDs at `scigrid.py:48-61`) into a polygon
    * list; each polygon is (outer ring, holes...). Unsupported geometry
    * types throw — no silent garbage. */
  def parseGeometry(wkt: String): Array[Poly] = {
    val w = wkt.trim.replaceFirst("(?i)^SRID=\\d+;", "").trim
    val p = w.indexOf('(')
    require(p > 0, s"malformed WKT (no geometry body): $wkt")
    val typ = w.substring(0, p).trim.toUpperCase
    val body = w.substring(p)
    typ match {
      case "POLYGON" => Array(parsePolyBody(body))
      case "MULTIPOLYGON" => splitTop(stripOuterParens(body)).map(parsePolyBody)
      case other => throw new IllegalArgumentException(
        s"unsupported geometry type '$other' (expected POLYGON or MULTIPOLYGON) in: $wkt")
    }
  }

  /** Every ring of the geometry, flattened (outer rings and holes alike
    * — even-odd containment treats them uniformly). */
  def allRings(wkt: String): Array[Ring] = parseGeometry(wkt).flatten

  /** Back-compat single-ring accessor: the outer ring of a single-part
    * POLYGON. Throws on MULTIPOLYGON or holed input — callers that can
    * see real-world geometry must use [[parseGeometry]]/[[allRings]]. */
  def parsePolygon(wkt: String): Ring = {
    val geom = parseGeometry(wkt)
    require(geom.length == 1 && geom(0).length == 1,
      s"parsePolygon expects a single-ring POLYGON; " +
        s"got ${geom.length} part(s) / ${geom.map(_.length).sum} ring(s): $wkt")
    geom(0)(0)
  }

  def parsePoint(wkt: String): (Double, Double) = {
    val w = wkt.trim.replaceFirst("(?i)^SRID=\\d+;", "").trim
    require(w.toUpperCase.startsWith("POINT"),
      s"parsePoint expects POINT WKT, got: $wkt")
    val body = w.substring(w.indexOf('(') + 1, w.indexOf(')'))
    val xs = body.trim.split("\\s+")
    (xs(0).toDouble, xs(1).toDouble)
  }

  // ---- containment ----

  /** Ray-casting even-odd point-in-ring test. Points on an edge follow
    * the half-open convention (deterministic). */
  def containsPoint(ring: Ring, x: Double, y: Double): Boolean = {
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

  /** Even-odd containment over a full geometry: XOR across all rings.
    * A hole ring flips the parity back to outside; disjoint multipolygon
    * parts contribute independently (a point lies in at most one). */
  def containsPointGeom(geom: Array[Poly], x: Double, y: Double): Boolean = {
    var inside = false
    var p = 0
    while (p < geom.length) {
      val rings = geom(p)
      var r = 0
      while (r < rings.length) {
        if (containsPoint(rings(r), x, y)) inside = !inside
        r += 1
      }
      p += 1
    }
    inside
  }

  // ---- bbox / centroid ----

  def bbox(ring: Ring): (Double, Double, Double, Double) =
    (ring.map(_._1).min, ring.map(_._2).min,
      ring.map(_._1).max, ring.map(_._2).max)

  def bboxGeom(geom: Array[Poly]): (Double, Double, Double, Double) = {
    val pts = geom.flatten.flatten
    (pts.map(_._1).min, pts.map(_._2).min,
      pts.map(_._1).max, pts.map(_._2).max)
  }

  /** (signed shoelace area ×2, Σ(x0+x1)·cross, Σ(y0+y1)·cross) — the
    * raw accumulators the centroid formula needs. */
  private def shoelace(ring: Ring): (Double, Double, Double) = {
    val closed = if (ring.head == ring.last) ring else ring :+ ring.head
    var a = 0.0; var cx = 0.0; var cy = 0.0
    var i = 0
    while (i < closed.length - 1) {
      val (x0, y0) = closed(i); val (x1, y1) = closed(i + 1)
      val cross = x0 * y1 - x1 * y0
      a += cross; cx += (x0 + x1) * cross; cy += (y0 + y1) * cross
      i += 1
    }
    (a, cx, cy)
  }

  def centroid(ring: Ring): (Double, Double) = {
    val (a, cx, cy) = shoelace(ring)
    if (a == 0.0) (ring.map(_._1).sum / ring.length,
      ring.map(_._2).sum / ring.length)
    else (cx / (3 * a), cy / (3 * a))
  }

  /** Area-weighted centroid of a (multi)polygon with holes: outer rings
    * weigh +|area|, interior rings −|area|. The single-ring case takes
    * the exact [[centroid]] path so frozen golden values stay
    * bit-identical. */
  def centroidGeom(geom: Array[Poly]): (Double, Double) = {
    if (geom.length == 1 && geom(0).length == 1) return centroid(geom(0)(0))
    var aTot = 0.0; var cxTot = 0.0; var cyTot = 0.0
    for (poly <- geom; (ring, idx) <- poly.zipWithIndex) {
      val (a2, cxs, cys) = shoelace(ring)
      val w = if (idx == 0) math.abs(a2) else -math.abs(a2)
      if (a2 != 0.0) {
        // ring centroid = (cxs/(3·a2), cys/(3·a2)); weight by ±|a2|/2.
        // Multiply through so the /2 cancels in the final division.
        val sign = if (a2 > 0) 1.0 else -1.0
        cxTot += (if (idx == 0) sign else -sign) * cxs / 3.0
        cyTot += (if (idx == 0) sign else -sign) * cys / 3.0
        aTot += w
      }
    }
    if (aTot == 0.0) {
      val pts = geom.flatten.flatten
      (pts.map(_._1).sum / pts.length, pts.map(_._2).sum / pts.length)
    } else (cxTot / aTot, cyTot / aTot)
  }

  // ---- GeoJSON ----

  private def ringJson(ring: Ring): String =
    ring.map { case (x, y) => s"[$x,$y]" }.mkString("[", ",", "]")

  private def polyJson(poly: Poly): String =
    poly.map(ringJson).mkString("[", ",", "]")

  def toGeoJson(wkt: String): String = {
    val w = wkt.trim.replaceFirst("(?i)^SRID=\\d+;", "").trim
    if (w.toUpperCase.startsWith("POINT")) {
      val (x, y) = parsePoint(w)
      s"""{"type":"Point","coordinates":[$x,$y]}"""
    } else {
      val geom = parseGeometry(w)
      if (geom.length == 1)
        s"""{"type":"Polygon","coordinates":${polyJson(geom(0))}}"""
      else
        s"""{"type":"MultiPolygon","coordinates":${geom.map(polyJson).mkString("[", ",", "]")}}"""
    }
  }

  // ---- Column-level API (UDFs registered once per session) ----

  val stContains =
    udf((polyWkt: String, x: Double, y: Double) =>
      containsPointGeom(parseGeometry(polyWkt), x, y))

  val stPoint =
    udf((x: Double, y: Double) => s"POINT ($x $y)")

  val stCentroidX = udf((wkt: String) => centroidGeom(parseGeometry(wkt))._1)
  val stCentroidY = udf((wkt: String) => centroidGeom(parseGeometry(wkt))._2)

  val stAsGeoJson = udf { (wkt: String) => toGeoJson(wkt) }

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
