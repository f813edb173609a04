package graft.operators

/** VP8 in-loop deblocking filter (RFC 6386 §15), normal and simple
  * profiles, applied in macroblock raster order over the reconstructed
  * (unfiltered) frame — intra prediction reads unfiltered neighbors,
  * so [[Vp8Codec]] reconstructs the whole frame first and filters as a
  * second pass, which is bit-equivalent to the reference's row-delayed
  * interleaving. */
private[operators] object Vp8LoopFilter {

  private def clampS8(v: Int): Int =
    if (v < -128) -128 else if (v > 127) 127 else v
  private def u2s(v: Int): Int = v - 128
  private def s2u(v: Int): Int = {
    val c = if (v < -128) -128 else if (v > 127) 127 else v
    c + 128
  }

  /** pixel accessor bundle: an edge filter reads/writes 8 pixels in a
    * line across the edge at positions -4..3 relative to the edge. */
  private final class Edge(p: Array[Byte], base: Int, step: Int) {
    def get(i: Int): Int = p(base + i * step) & 0xff
    def set(i: Int, v: Int): Unit = p(base + i * step) = v.toByte
  }

  private def needsFilter(e: Edge, limit: Int, interior: Int): Boolean = {
    val p3 = e.get(-4); val p2 = e.get(-3); val p1 = e.get(-2)
    val p0 = e.get(-1); val q0 = e.get(0); val q1 = e.get(1)
    val q2 = e.get(2); val q3 = e.get(3)
    (math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2) <= limit &&
      math.abs(p3 - p2) <= interior && math.abs(p2 - p1) <= interior &&
      math.abs(p1 - p0) <= interior && math.abs(q3 - q2) <= interior &&
      math.abs(q2 - q1) <= interior && math.abs(q1 - q0) <= interior
  }

  private def hev(e: Edge, t: Int): Boolean =
    math.abs(e.get(-2) - e.get(-1)) > t ||
      math.abs(e.get(1) - e.get(0)) > t

  /** common 4-tap filter; `useOuter` = include the p1/q1 taps in the
    * filter value (hev case and the simple profile). */
  private def commonFilter(e: Edge, useOuter: Boolean,
      adjustOuter: Boolean): Unit = {
    val ps1 = u2s(e.get(-2)); val ps0 = u2s(e.get(-1))
    val qs0 = u2s(e.get(0)); val qs1 = u2s(e.get(1))
    var f = if (useOuter) clampS8(ps1 - qs1) else 0
    f = clampS8(f + 3 * (qs0 - ps0))
    val f1 = clampS8(f + 4) >> 3
    val f2 = clampS8(f + 3) >> 3
    e.set(0, s2u(qs0 - f1))
    e.set(-1, s2u(ps0 + f2))
    if (adjustOuter) {
      val u = (f1 + 1) >> 1
      e.set(1, s2u(qs1 - u))
      e.set(-2, s2u(ps1 + u))
    }
  }

  /** 6-tap macroblock-edge filter (normal profile, non-hev branch). */
  private def mbFilter(e: Edge): Unit = {
    val ps2 = u2s(e.get(-3)); val ps1 = u2s(e.get(-2))
    val ps0 = u2s(e.get(-1)); val qs0 = u2s(e.get(0))
    val qs1 = u2s(e.get(1)); val qs2 = u2s(e.get(2))
    val w = clampS8(clampS8(ps1 - qs1) + 3 * (qs0 - ps0))
    var u = (27 * w + 63) >> 7
    e.set(0, s2u(qs0 - u)); e.set(-1, s2u(ps0 + u))
    u = (18 * w + 63) >> 7
    e.set(1, s2u(qs1 - u)); e.set(-2, s2u(ps1 + u))
    u = (9 * w + 63) >> 7
    e.set(2, s2u(qs2 - u)); e.set(-3, s2u(ps2 + u))
  }

  private def filterEdgeNormal(e: Edge, limit: Int, interior: Int,
      hevT: Int, isMbEdge: Boolean): Unit =
    if (needsFilter(e, limit, interior)) {
      val h = hev(e, hevT)
      if (isMbEdge) {
        if (h) commonFilter(e, useOuter = true, adjustOuter = false)
        else mbFilter(e)
      } else {
        commonFilter(e, useOuter = h, adjustOuter = !h)
      }
    }

  private def filterEdgeSimple(e: Edge, limit: Int): Unit =
    if (math.abs(e.get(-1) - e.get(0)) * 2 +
        math.abs(e.get(-2) - e.get(1)) / 2 <= limit)
      commonFilter(e, useOuter = true, adjustOuter = false)

  // edge walkers: vertical edge at x (filtering along columns of the
  // edge for `n` rows), horizontal edge at y for `n` columns
  private def vEdge(p: Array[Byte], stride: Int, x: Int, y0: Int,
      n: Int)(f: Edge => Unit): Unit = {
    var r = 0
    while (r < n) { f(new Edge(p, (y0 + r) * stride + x, 1)); r += 1 }
  }
  private def hEdge(p: Array[Byte], stride: Int, x0: Int, y: Int,
      n: Int)(f: Edge => Unit): Unit = {
    var c = 0
    while (c < n) { f(new Edge(p, y * stride + x0 + c, stride)); c += 1 }
  }

  def filterFrame(yPix: Array[Byte], uPix: Array[Byte],
      vPix: Array[Byte], yStride: Int, cStride: Int,
      mbW: Int, mbH: Int, simple: Boolean, baseLevel: Int,
      sharpness: Int, segEnabled: Boolean, segAbsDelta: Boolean,
      segLf: Array[Int], mbSeg: Array[Byte], lfDeltaEnabled: Boolean,
      intraRefDelta: Int, bPredModeDelta: Int, mbYMode: Array[Byte],
      mbHasCoeffs: Array[Boolean]): Unit = {
    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        val i = mbY * mbW + mbX
        val isB = mbYMode(i) == 4
        var level = {
          val seg = if (segEnabled) mbSeg(i).toInt else 0
          val l0 =
            if (!segEnabled) baseLevel
            else if (segAbsDelta) segLf(seg)
            else baseLevel + segLf(seg)
          // single clamp, AFTER the lf deltas are added to the
          // unclamped segment-adjusted base — an intermediate clamp
          // diverges from the reference when the segment level leaves
          // [0,63] and the deltas pull it back (r15 ADVICE)
          var l = l0
          if (lfDeltaEnabled) {
            l += intraRefDelta
            if (isB) l += bPredModeDelta
          }
          if (l < 0) 0 else if (l > 63) 63 else l
        }
        if (level > 0) {
          var interior = level
          if (sharpness > 0) {
            interior >>= (if (sharpness > 4) 2 else 1)
            if (interior > 9 - sharpness) interior = 9 - sharpness
          }
          if (interior < 1) interior = 1
          val hevT =
            if (level >= 40) 2 else if (level >= 15) 1 else 0
          val mbLim = (level + 2) * 2 + interior
          val sbLim = level * 2 + interior
          val inner = mbHasCoeffs(i) || isB
          val px = mbX * 16; val py = mbY * 16
          val cx = mbX * 8; val cy = mbY * 8
          if (simple) {
            if (mbX > 0)
              vEdge(yPix, yStride, px, py, 16)(filterEdgeSimple(_, mbLim))
            if (inner) {
              var k = 4
              while (k < 16) {
                vEdge(yPix, yStride, px + k, py, 16)(
                  filterEdgeSimple(_, sbLim))
                k += 4
              }
            }
            if (mbY > 0)
              hEdge(yPix, yStride, px, py, 16)(filterEdgeSimple(_, mbLim))
            if (inner) {
              var k = 4
              while (k < 16) {
                hEdge(yPix, yStride, px, py + k, 16)(
                  filterEdgeSimple(_, sbLim))
                k += 4
              }
            }
          } else {
            if (mbX > 0) {
              vEdge(yPix, yStride, px, py, 16)(
                filterEdgeNormal(_, mbLim, interior, hevT, isMbEdge = true))
              vEdge(uPix, cStride, cx, cy, 8)(
                filterEdgeNormal(_, mbLim, interior, hevT, isMbEdge = true))
              vEdge(vPix, cStride, cx, cy, 8)(
                filterEdgeNormal(_, mbLim, interior, hevT, isMbEdge = true))
            }
            if (inner) {
              var k = 4
              while (k < 16) {
                vEdge(yPix, yStride, px + k, py, 16)(
                  filterEdgeNormal(_, sbLim, interior, hevT,
                    isMbEdge = false))
                k += 4
              }
              vEdge(uPix, cStride, cx + 4, cy, 8)(
                filterEdgeNormal(_, sbLim, interior, hevT,
                  isMbEdge = false))
              vEdge(vPix, cStride, cx + 4, cy, 8)(
                filterEdgeNormal(_, sbLim, interior, hevT,
                  isMbEdge = false))
            }
            if (mbY > 0) {
              hEdge(yPix, yStride, px, py, 16)(
                filterEdgeNormal(_, mbLim, interior, hevT, isMbEdge = true))
              hEdge(uPix, cStride, cx, cy, 8)(
                filterEdgeNormal(_, mbLim, interior, hevT, isMbEdge = true))
              hEdge(vPix, cStride, cx, cy, 8)(
                filterEdgeNormal(_, mbLim, interior, hevT, isMbEdge = true))
            }
            if (inner) {
              var k = 4
              while (k < 16) {
                hEdge(yPix, yStride, px, py + k, 16)(
                  filterEdgeNormal(_, sbLim, interior, hevT,
                    isMbEdge = false))
                k += 4
              }
              hEdge(uPix, cStride, cx, cy + 4, 8)(
                filterEdgeNormal(_, sbLim, interior, hevT,
                  isMbEdge = false))
              hEdge(vPix, cStride, cx, cy + 4, 8)(
                filterEdgeNormal(_, sbLim, interior, hevT,
                  isMbEdge = false))
            }
          }
        }
        mbX += 1
      }
      mbY += 1
    }
  }
}
