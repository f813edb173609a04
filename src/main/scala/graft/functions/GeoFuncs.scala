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

  // ---- Coordinate transform (ST_Transform, EPSG:25832 ↔ 4326) ----
  //
  // The reference's metadata helpers reproject constant 25832 → 4326
  // (`metadata_sql_helpers.sql:100-124`); SURVEY scopes reprojection to
  // exactly this pair. Implemented with the standard Krüger series for
  // the transverse Mercator (public-domain formulas; ETRS89/GRS80
  // ellipsoid, UTM zone 32N: k0 = 0.9996, λ0 = 9°E, E0 = 500 000).
  // 3rd-order series ≈ sub-millimeter over the zone.

  private val TmA = 6378137.0
  private val TmF = 1.0 / 298.257222101 // GRS80
  private val TmN = TmF / (2.0 - TmF)
  private val TmK0 = 0.9996
  private val TmE0 = 500000.0
  private val TmLon0 = math.toRadians(9.0)
  private val TmAbar = TmA / (1 + TmN) *
    (1 + TmN * TmN / 4 + math.pow(TmN, 4) / 64)
  // 4th-order Krüger coefficients: truncation residual ~nanometers
  // over the zone (3rd order measured a 0.3 mm round-trip drift)
  private val TmAlpha = Array(
    TmN / 2 - 2 * TmN * TmN / 3 + 5 * math.pow(TmN, 3) / 16 +
      41 * math.pow(TmN, 4) / 180,
    13 * TmN * TmN / 48 - 3 * math.pow(TmN, 3) / 5 +
      557 * math.pow(TmN, 4) / 1440,
    61 * math.pow(TmN, 3) / 240 - 103 * math.pow(TmN, 4) / 140,
    49561 * math.pow(TmN, 4) / 161280)
  private val TmBeta = Array(
    TmN / 2 - 2 * TmN * TmN / 3 + 37 * math.pow(TmN, 3) / 96 -
      math.pow(TmN, 4) / 360,
    TmN * TmN / 48 + math.pow(TmN, 3) / 15 -
      437 * math.pow(TmN, 4) / 1440,
    17 * math.pow(TmN, 3) / 480 - 37 * math.pow(TmN, 4) / 840,
    4397 * math.pow(TmN, 4) / 161280)
  private val TmDelta = Array(
    2 * TmN - 2 * TmN * TmN / 3 - 2 * math.pow(TmN, 3) +
      116 * math.pow(TmN, 4) / 45,
    7 * TmN * TmN / 3 - 8 * math.pow(TmN, 3) / 5 -
      227 * math.pow(TmN, 4) / 45,
    56 * math.pow(TmN, 3) / 15 - 136 * math.pow(TmN, 4) / 35,
    4279 * math.pow(TmN, 4) / 630)

  /** (lon°, lat°) → UTM 32N (easting, northing) in meters. */
  def lonLatToUtm32(lon: Double, lat: Double): (Double, Double) = {
    val phi = math.toRadians(lat)
    val dLam = math.toRadians(lon) - TmLon0
    val c = 2 * math.sqrt(TmN) / (1 + TmN)
    val t = math.sinh(atanh(math.sin(phi)) - c * atanh(c * math.sin(phi)))
    val xiP = math.atan2(t, math.cos(dLam))
    val etaP = atanh(math.sin(dLam) / math.sqrt(1 + t * t))
    var xi = xiP; var eta = etaP
    var j = 1
    while (j <= 4) {
      xi += TmAlpha(j - 1) * math.sin(2 * j * xiP) * math.cosh(2 * j * etaP)
      eta += TmAlpha(j - 1) * math.cos(2 * j * xiP) * math.sinh(2 * j * etaP)
      j += 1
    }
    (TmE0 + TmK0 * TmAbar * eta, TmK0 * TmAbar * xi)
  }

  /** UTM 32N (easting, northing) → (lon°, lat°). */
  def utm32ToLonLat(e: Double, n: Double): (Double, Double) = {
    val xi = n / (TmK0 * TmAbar)
    val eta = (e - TmE0) / (TmK0 * TmAbar)
    var xiP = xi; var etaP = eta
    var j = 1
    while (j <= 4) {
      xiP -= TmBeta(j - 1) * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
      etaP -= TmBeta(j - 1) * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
      j += 1
    }
    val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
    var phi = chi
    j = 1
    while (j <= 4) { phi += TmDelta(j - 1) * math.sin(2 * j * chi); j += 1 }
    val lam = TmLon0 + math.atan2(math.sinh(etaP), math.cos(xiP))
    (math.toDegrees(lam), math.toDegrees(phi))
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))

  /** ST_Transform for WKT (POINT / POLYGON / MULTIPOLYGON). Only the
    * reference's constant pair is supported: 25832 → 4326 and its
    * inverse; anything else throws (the adapter contract — reprojection
    * between arbitrary CRSs is adapter-side). */
  def transformWkt(wkt: String, srcSrid: Int, dstSrid: Int): String = {
    val f: (Double, Double) => (Double, Double) = (srcSrid, dstSrid) match {
      case (25832, 4326) => utm32ToLonLat
      case (4326, 25832) => lonLatToUtm32
      case (a, b) if a == b => (x, y) => (x, y)
      case _ => throw new IllegalArgumentException(
        s"unsupported transform $srcSrid -> $dstSrid " +
          "(engine supports the reference's constant 25832 <-> 4326)")
    }
    mapWktCoords(wkt, f)
  }

  // ---- ST_Simplify (Douglas–Peucker) ----

  /** Douglas–Peucker over an open point sequence; endpoints kept. */
  private def douglasPeucker(pts: Array[(Double, Double)], tol: Double)
      : Array[(Double, Double)] = {
    if (pts.length < 3) return pts
    val keep = new Array[Boolean](pts.length)
    keep(0) = true; keep(pts.length - 1) = true
    def perpDist(p: (Double, Double), a: (Double, Double),
        b: (Double, Double)): Double = {
      val (px, py) = p; val (ax, ay) = a; val (bx, by) = b
      val dx = bx - ax; val dy = by - ay
      val len = math.hypot(dx, dy)
      if (len == 0.0) math.hypot(px - ax, py - ay)
      else math.abs(dx * (ay - py) - dy * (ax - px)) / len
    }
    def rec(i: Int, j: Int): Unit = {
      if (j <= i + 1) return
      var maxD = -1.0; var maxK = -1
      var k = i + 1
      while (k < j) {
        val d = perpDist(pts(k), pts(i), pts(j))
        if (d > maxD) { maxD = d; maxK = k }
        k += 1
      }
      if (maxD > tol) { keep(maxK) = true; rec(i, maxK); rec(maxK, j) }
    }
    rec(0, pts.length - 1)
    pts.zipWithIndex.collect { case (p, i) if keep(i) => p }
  }

  /** ST_Simplify for WKT polygons/multipolygons: Douglas–Peucker per
    * ring (`ST_Simplify(geometry, 20)` in the reference's metadata
    * helpers). A ring that would collapse below 4 points (3 vertices +
    * closure) is kept unsimplified — the conservative choice, vs
    * PostGIS emitting an invalid or NULL geometry. POINTs pass
    * through. */
  def simplifyWkt(wkt: String, tolerance: Double): String = {
    val w = wkt.trim.replaceFirst("(?i)^SRID=\\d+;", "").trim
    if (w.toUpperCase.startsWith("POINT")) w
    else {
      val geom = parseGeometry(w)
      val out = geom.map(_.map { ring =>
        val simplified = douglasPeucker(ring, tolerance)
        if (simplified.length < 4) ring else simplified
      })
      geomToWkt(out)
    }
  }

  private def mapWktCoords(wkt: String,
      f: (Double, Double) => (Double, Double)): String = {
    val w = wkt.trim.replaceFirst("(?i)^SRID=\\d+;", "").trim
    if (w.toUpperCase.startsWith("POINT")) {
      val (x, y) = parsePoint(w)
      val (nx, ny) = f(x, y)
      s"POINT ($nx $ny)"
    } else {
      val geom = parseGeometry(w)
      geomToWkt(geom.map(_.map(_.map { case (x, y) => f(x, y) })))
    }
  }

  private def ringWkt(ring: Ring): String =
    ring.map { case (x, y) => s"$x $y" }.mkString("(", ", ", ")")

  private def geomToWkt(geom: Seq[Poly]): String =
    if (geom.length == 1)
      "POLYGON " + geom.head.map(ringWkt).mkString("(", ", ", ")")
    else
      "MULTIPOLYGON " + geom.map(p =>
        p.map(ringWkt).mkString("(", ", ", ")")).mkString("(", ", ", ")")

  // ---- Column-level API (UDFs registered once per session) ----

  val stContains =
    udf((polyWkt: String, x: Double, y: Double) =>
      containsPointGeom(parseGeometry(polyWkt), x, y))

  val stPoint =
    udf((x: Double, y: Double) => s"POINT ($x $y)")

  val stCentroidX = udf((wkt: String) => centroidGeom(parseGeometry(wkt))._1)
  val stCentroidY = udf((wkt: String) => centroidGeom(parseGeometry(wkt))._2)

  val stAsGeoJson = udf { (wkt: String) => toGeoJson(wkt) }

  val stTransform = udf { (wkt: String, src: Int, dst: Int) =>
    transformWkt(wkt, src, dst)
  }

  val stSimplify = udf { (wkt: String, tol: Double) =>
    simplifyWkt(wkt, tol)
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
    spark.udf.register("st_transform", stTransform)
    spark.udf.register("st_simplify", stSimplify)
  }
}
