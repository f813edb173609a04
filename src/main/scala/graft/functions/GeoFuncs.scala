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

  // ---- EWKT SRID plumbing + the bounding-geometry surface ----
  //
  // The reference's metadata helpers (`metadata_sql_helpers.sql:84-124`)
  // build `ST_Transform(ST_ConcaveHull(ST_Collect(ST_SetSRID(
  // ST_MakePoint(lon,lat),4326)),0.5),4326)` and the geometry-column
  // variant with `ST_Points(ST_Simplify(g,20))`. These run VERBATIM
  // through spark.sql with the functions below; SRIDs travel as
  // PostGIS-style EWKT prefixes (`SRID=25832;POLYGON …`).

  private val SridPrefix = "(?i)^SRID=(\\d+);".r

  /** (srid, bare wkt) — EWKT prefix split; None when unprefixed. */
  def splitSrid(wkt: String): (Option[Int], String) = {
    val t = wkt.trim
    SridPrefix.findFirstMatchIn(t) match {
      case Some(m) => (Some(m.group(1).toInt), t.substring(m.end).trim)
      case None => (None, t)
    }
  }

  def setSrid(wkt: String, srid: Int): String =
    s"SRID=$srid;${splitSrid(wkt)._2}"

  private def withSrid(srid: Option[Int], wkt: String): String =
    srid.map(s => s"SRID=$s;$wkt").getOrElse(wkt)

  def parseMultiPoint(wkt: String): Array[(Double, Double)] = {
    val (_, w) = splitSrid(wkt)
    require(w.toUpperCase.startsWith("MULTIPOINT"),
      s"expected MULTIPOINT WKT, got: $wkt")
    if (w.toUpperCase.contains("EMPTY")) Array.empty
    else splitTop(stripOuterParens(w.substring(w.indexOf('(')))).map { tok =>
      val t = tok.trim
      val inner = if (t.startsWith("(")) stripOuterParens(t) else t
      val xs = inner.trim.split("\\s+")
      (xs(0).toDouble, xs(1).toDouble)
    }
  }

  private def multiPointWkt(pts: Seq[(Double, Double)]): String =
    if (pts.isEmpty) "MULTIPOINT EMPTY"
    else "MULTIPOINT " + pts.map { case (x, y) => s"($x $y)" }
      .mkString("(", ", ", ")")

  /** Vertices of any supported geometry (ST_Points). */
  def verticesOf(wkt: String): Array[(Double, Double)] = {
    val (_, w) = splitSrid(wkt)
    val u = w.toUpperCase
    if (u.startsWith("MULTIPOINT")) parseMultiPoint(w)
    else if (u.startsWith("POINT")) Array(parsePoint(w))
    else parseGeometry(w).flatten.flatten
  }

  /** ST_Points: every vertex as a MULTIPOINT, SRID preserved. */
  def pointsOf(wkt: String): String = {
    val (srid, _) = splitSrid(wkt)
    withSrid(srid, multiPointWkt(verticesOf(wkt).toSeq))
  }

  /** ST_Transform, PostGIS 2-arg form: source CRS from the EWKT
    * prefix (unprefixed input is taken as 4326, the engine's canonical
    * CRS per SURVEY §1.1); output carries the target SRID. Supported
    * pairs as in [[transformWkt]]. */
  def transformToSrid(wkt: String, dstSrid: Int): String = {
    val (srid, w) = splitSrid(wkt)
    s"SRID=$dstSrid;${transformWkt(w, srid.getOrElse(4326), dstSrid)}"
  }

  private def ringArea2(ring: Seq[(Double, Double)]): Double = {
    var a = 0.0
    var i = 0
    val n = ring.length
    while (i < n) {
      val (x0, y0) = ring(i); val (x1, y1) = ring((i + 1) % n)
      a += x0 * y1 - x1 * y0
      i += 1
    }
    math.abs(a)
  }

  private def properIntersect(p1: (Double, Double), p2: (Double, Double),
      q1: (Double, Double), q2: (Double, Double)): Boolean = {
    def orient(a: (Double, Double), b: (Double, Double),
        c: (Double, Double)): Double =
      (b._1 - a._1) * (c._2 - a._2) - (b._2 - a._2) * (c._1 - a._1)
    // segments sharing an endpoint are adjacency, not intersection
    if (p1 == q1 || p1 == q2 || p2 == q1 || p2 == q2) return false
    val d1 = orient(q1, q2, p1); val d2 = orient(q1, q2, p2)
    val d3 = orient(p1, p2, q1); val d4 = orient(p1, p2, q2)
    ((d1 > 0) != (d2 > 0)) && ((d3 > 0) != (d4 > 0))
  }

  /** ST_ConcaveHull over the vertices of `wkt`.
    *
    * `pctConvex` follows PostGIS's `param_pctconvex` contract: 1 →
    * the convex hull; smaller values dig concavities until the hull
    * area is ≤ pctConvex × convex-hull area or no further simple dig
    * exists. The dig rule is the published edge-erosion heuristic
    * (concaveman family): take the longest remaining edge, insert the
    * interior point with the deepest perpendicular detour whose two
    * new edges keep the ring simple. Deterministic; terminates (each
    * dig consumes one interior point and strictly shrinks the area).
    * Runs over bounded collected point sets (metadata queries), never
    * per-row fact data. */
  def concaveHull(wkt: String, pctConvex: Double): String = {
    import graft.expressions.HullAggregate
    val (srid, _) = splitSrid(wkt)
    val pts = verticesOf(wkt).distinct.toSeq
    val hull = HullAggregate.convexHull(pts)
    if (hull.length < 3 || pctConvex >= 1.0)
      return withSrid(srid, HullAggregate.toWkt(hull))
    val target = math.max(pctConvex, 0.0) * ringArea2(hull)
    val ring = scala.collection.mutable.ArrayBuffer(hull: _*)
    val interior = scala.collection.mutable.ArrayBuffer(
      pts.filterNot(hull.contains): _*)
    def perp(p: (Double, Double), a: (Double, Double),
        b: (Double, Double)): Double = {
      val dx = b._1 - a._1; val dy = b._2 - a._2
      val len = math.hypot(dx, dy)
      if (len == 0) 0.0
      else math.abs(dx * (a._2 - p._2) - dy * (a._1 - p._1)) / len
    }
    var dug = true
    while (dug && ringArea2(ring.toSeq) > target && interior.nonEmpty) {
      dug = false
      // edges by descending length; first edge with a valid dig wins
      val edges = ring.indices
        .map(i => (i, math.hypot(
          ring((i + 1) % ring.length)._1 - ring(i)._1,
          ring((i + 1) % ring.length)._2 - ring(i)._2)))
        .sortBy(-_._2)
      val it = edges.iterator
      while (!dug && it.hasNext) {
        val (i, _) = it.next()
        val a = ring(i); val b = ring((i + 1) % ring.length)
        // deepest valid candidate for this edge
        var best = -1; var bestD = 0.0
        var c = 0
        while (c < interior.length) {
          val p = interior(c)
          val d = perp(p, a, b)
          // p must lie strictly inside the CURRENT ring (a point left
          // outside by an earlier dig would grow the area back)
          if (d > bestD && containsPoint(ring.toArray, p._1, p._2)) {
            // simplicity: neither new edge may cross an existing one
            val ok = ring.indices.forall { j =>
              val e1 = ring(j); val e2 = ring((j + 1) % ring.length)
              !properIntersect(a, p, e1, e2) &&
                !properIntersect(p, b, e1, e2)
            }
            if (ok) { best = c; bestD = d }
          }
          c += 1
        }
        if (best >= 0) {
          ring.insert(i + 1, interior.remove(best))
          dug = true
        }
      }
    }
    withSrid(srid, HullAggregate.toWkt(ring.toSeq))
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

  /** PostGIS 2-arg ST_Transform: source CRS from the EWKT prefix. */
  val stTransform = udf { (wkt: String, dst: Int) =>
    transformToSrid(wkt, dst)
  }

  val stSimplify = udf { (wkt: String, tol: Double) =>
    val (srid, w) = splitSrid(wkt)
    withSrid(srid, simplifyWkt(w, tol))
  }

  val stSetSrid = udf { (wkt: String, srid: Int) => setSrid(wkt, srid) }

  val stPoints = udf { (wkt: String) => pointsOf(wkt) }

  val stConcaveHull = udf { (wkt: String, pct: Double) =>
    concaveHull(wkt, pct)
  }

  /** ST_Collect: aggregate POINT/MULTIPOINT rows into one MULTIPOINT.
    * The buffer is the coordinate list (metadata-sized inputs — the
    * reference collects per-dataset coverage points, never fact-scale
    * rows); finish() sorts, so the output is partitioning-invariant.
    * The first seen SRID is preserved. */
  final case class CollectBuf(
      var srid: Int, var pts: List[(Double, Double)])

  val collectAgg: org.apache.spark.sql.expressions.Aggregator[
      String, CollectBuf, String] =
    new org.apache.spark.sql.expressions.Aggregator[
        String, CollectBuf, String] {
      def zero: CollectBuf = CollectBuf(-1, Nil)
      def reduce(b: CollectBuf, wkt: String): CollectBuf = {
        if (wkt != null) {
          val (srid, _) = splitSrid(wkt)
          if (b.srid < 0) b.srid = srid.getOrElse(-2)
          b.pts = verticesOf(wkt).toList ::: b.pts
        }
        b
      }
      def merge(a: CollectBuf, b: CollectBuf): CollectBuf = {
        if (a.srid < 0) a.srid = b.srid
        a.pts = b.pts ::: a.pts
        a
      }
      def finish(b: CollectBuf): String = {
        val sorted = b.pts.sorted
        withSrid(if (b.srid >= 0) Some(b.srid) else None,
          multiPointWkt(sorted))
      }
      def bufferEncoder: org.apache.spark.sql.Encoder[CollectBuf] =
        org.apache.spark.sql.Encoders.kryo[CollectBuf]
      def outputEncoder: org.apache.spark.sql.Encoder[String] =
        org.apache.spark.sql.Encoders.STRING
    }

  def stContains(poly: Column, x: Column, y: Column): Column =
    stContains.apply(poly, x, y)

  /** SQL registration for dashboard-parity queries and the metadata
    * bounding-geometry helpers (which run VERBATIM — GeoSpec). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("st_contains", stContains)
    spark.udf.register("st_point", stPoint)
    spark.udf.register("st_makepoint", stPoint)
    spark.udf.register("st_asgeojson", stAsGeoJson)
    spark.udf.register("st_centroid_x", stCentroidX)
    spark.udf.register("st_centroid_y", stCentroidY)
    spark.udf.register("st_transform", stTransform)
    spark.udf.register("st_simplify", stSimplify)
    spark.udf.register("st_setsrid", stSetSrid)
    spark.udf.register("st_points", stPoints)
    spark.udf.register("st_concavehull", stConcaveHull)
    spark.udf.register("st_collect",
      org.apache.spark.sql.functions.udaf(collectAgg))
  }
}
