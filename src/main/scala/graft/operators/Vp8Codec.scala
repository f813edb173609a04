package graft.operators

/** VP8 (lossy WebP) intra-frame decoder — RFC 6386 keyframe path.
  *
  * Every WebP lossy still is a single VP8 keyframe, which needs no
  * inter prediction, no motion vectors and no golden/altref state —
  * the complete still-image decode is: boolean-arithmetic header +
  * mode parsing, token (DCT coefficient) decoding with banded
  * probability contexts, dequantization, 4×4 IDCT / Walsh–Hadamard
  * for the second-order luma DC, spatial intra prediction (4 16×16
  * luma modes, 10 4×4 B_PRED sub-modes, 4 8×8 chroma modes) and the
  * in-loop deblocking filter (normal and simple profiles).
  *
  * Output is the raw reconstructed YUV420 planes — the decoder's
  * canonical product BEFORE any RGB color conversion, which is also
  * what the reference implementation exposes via WebPDecodeYUV; the
  * Vp8CodecSpec goldens pin this output BYTE-EXACT against
  * libwebp-decoded planes for libwebp-encoded fixtures, so the
  * probability tables ([[Vp8Tables]], extracted from the reference
  * binary), the reconstruction math and the loop filter are all
  * end-to-end validated — a single wrong probability desynchronizes
  * the boolean decoder and fails the comparison outright.
  *
  * Bomb guards: dimensions are capped by MediaCodecs.MaxImagePixels
  * before any allocation; every bitstream read is bounds-checked (the
  * boolean decoder pads with zero bits past the partition end, the
  * spec's defined behavior for truncated streams, and the caller
  * treats any structural violation as a refusal).
  */
object Vp8Codec {

  import Vp8Tables._

  final case class Planes(width: Int, height: Int,
    y: Array[Byte], u: Array[Byte], v: Array[Byte])

  /** YUV420 → RGB with libwebp's fixed-point BT.601 coefficients and
    * the SIMPLE (nearest, non-fancy) chroma upsampler. The YUV planes
    * are the reference-pinned surface; this conversion is the
    * library's documented choice for RGB consumers (dHash, channel
    * stats) — libwebp's default "fancy" bilinear upsampler is a
    * presentation nicety, not part of the VP8 decode contract. */
  def toRgb(p: Planes): MediaCodecs.Image = {
    val cw = (p.width + 1) >> 1
    def clip8(v: Int): Int = { // value in <<6 fixed point
      if ((v & ~16383) != 0) { if (v < 0) 0 else 255 } else v >> 6
    }
    def mh(v: Int, coeff: Int): Int = (v * coeff) >> 8
    val rgb = new Array[Byte](p.width * p.height * 3)
    var yy = 0
    while (yy < p.height) {
      var xx = 0
      while (xx < p.width) {
        val yv = p.y(yy * p.width + xx) & 0xff
        val ci = (yy >> 1) * cw + (xx >> 1)
        val uv = p.u(ci) & 0xff
        val vv = p.v(ci) & 0xff
        val o = (yy * p.width + xx) * 3
        rgb(o) = clip8(mh(yv, 19077) + mh(vv, 26149) - 14234).toByte
        rgb(o + 1) = clip8(mh(yv, 19077) - mh(uv, 6419) -
          mh(vv, 13320) + 8708).toByte
        rgb(o + 2) = clip8(mh(yv, 19077) + mh(uv, 33050) - 17685).toByte
        xx += 1
      }
      yy += 1
    }
    MediaCodecs.Image(p.width, p.height, rgb)
  }

  /** Boolean arithmetic decoder (RFC 6386 §7). Reads past-the-end
    * return zero bits — the spec's convention for trailing reads. */
  private final class BoolDec(buf: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var range = 255
    private var value = {
      val b0 = if (pos < end) buf(pos) & 0xff else 0
      val b1 = if (pos + 1 < end) buf(pos + 1) & 0xff else 0
      pos += 2
      (b0 << 8) | b1
    }
    private var bitCount = 0

    def getBit(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var ret = 0
      if (value >= bigSplit) { ret = 1; range -= split; value -= bigSplit }
      else range = split
      while (range < 128) {
        value <<= 1
        range <<= 1
        bitCount += 1
        if (bitCount == 8) {
          bitCount = 0
          value |= (if (pos < end) buf(pos) & 0xff else 0)
          pos += 1
        }
      }
      ret
    }

    def literal(bits: Int): Int = {
      var v = 0
      var i = 0
      while (i < bits) { v = (v << 1) | getBit(128); i += 1 }
      v
    }

    /** magnitude-then-sign signed value of `bits` magnitude bits. */
    def signed(bits: Int): Int = {
      val v = literal(bits)
      if (getBit(128) == 1) -v else v
    }

    /** flag-guarded signed delta (the header's "delta present" form) */
    def maybeSigned(bits: Int): Int =
      if (getBit(128) == 1) signed(bits) else 0

    def tree(t: Array[Int], probs: Array[Int], probOff: Int = 0): Int = {
      var i = 0
      while (true) {
        i = t(i + getBit(probs(probOff + (i >> 1))))
        if (i <= 0) return -i
      }
      0 // unreachable
    }
  }

  private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v
  private def clampQ(v: Int): Int =
    if (v < 0) 0 else if (v > 127) 127 else v
  private def avg2(a: Int, b: Int): Int = (a + b + 1) >> 1
  private def avg3(a: Int, b: Int, c: Int): Int = (a + 2 * b + c + 2) >> 2

  // 16x16 Y mode ids (bitstream order): DC V H TM B_PRED
  private final val MY_DC = 0
  private final val MY_B = 4
  // 4x4 B mode ids (bitstream order, = KfBModeProba indexing):
  private final val B_DC = 0; private final val B_TM = 1
  private final val B_VE = 2; private final val B_HE = 3

  /** implied 4x4 context mode of a 16x16 prediction mode */
  private def impliedB(ymode: Int): Int = ymode match {
    case 0 => B_DC
    case 1 => B_VE
    case 2 => B_HE
    case _ => B_TM
  }

  /** Decode the VP8 frame at buf[off, off+len) (the "VP8 " chunk
    * payload, starting at the 3-byte frame tag). None on any
    * structural violation or a non-keyframe. */
  def decode(buf: Array[Byte], off: Int, len: Int): Option[Planes] = try {
    if (len < 10) return None
    val tag = (buf(off) & 0xff) | ((buf(off + 1) & 0xff) << 8) |
      ((buf(off + 2) & 0xff) << 16)
    val keyframe = (tag & 1) == 0
    val profile = (tag >>> 1) & 7
    val part0Len = tag >>> 5
    if (!keyframe) return None
    // the reference rejects profile > 3 outright; profiles 1-3 only
    // alter INTER reconstruction (bilinear/no-filter motion comp), so
    // keyframe stills decode identically and stay accepted (r15 ADVICE)
    if (profile > 3) return None
    if ((buf(off + 3) & 0xff) != 0x9d || (buf(off + 4) & 0xff) != 0x01 ||
      (buf(off + 5) & 0xff) != 0x2a) return None
    val w = ((buf(off + 6) & 0xff) | ((buf(off + 7) & 0xff) << 8)) & 0x3fff
    val h = ((buf(off + 8) & 0xff) | ((buf(off + 9) & 0xff) << 8)) & 0x3fff
    if (w <= 0 || h <= 0 ||
      w.toLong * h > MediaCodecs.MaxImagePixels) return None
    val part0Start = off + 10
    if (part0Len <= 0 || part0Start + part0Len > off + len) return None
    val bd = new BoolDec(buf, part0Start, part0Start + part0Len)

    // ---- frame header (§9) ----
    bd.literal(1) // color space
    bd.literal(1) // clamping type
    var segEnabled = false; var segUpdateMap = false
    var segAbsDelta = false
    val segQ = new Array[Int](4)
    val segLf = new Array[Int](4)
    val segTreeProbs = Array(255, 255, 255)
    if (bd.getBit(128) == 1) {
      segEnabled = true
      segUpdateMap = bd.getBit(128) == 1
      val updateData = bd.getBit(128) == 1
      if (updateData) {
        segAbsDelta = bd.getBit(128) == 1
        var i = 0
        while (i < 4) { segQ(i) = bd.maybeSigned(7); i += 1 }
        i = 0
        while (i < 4) { segLf(i) = bd.maybeSigned(6); i += 1 }
      }
      if (segUpdateMap) {
        var i = 0
        while (i < 3) {
          segTreeProbs(i) =
            if (bd.getBit(128) == 1) bd.literal(8) else 255
          i += 1
        }
      }
    }
    val simpleFilter = bd.literal(1) == 1
    val filterLevel = bd.literal(6)
    val sharpness = bd.literal(3)
    var lfDeltaEnabled = false
    val refLfDelta = new Array[Int](4)
    val modeLfDelta = new Array[Int](4)
    if (bd.getBit(128) == 1) {
      lfDeltaEnabled = true
      if (bd.getBit(128) == 1) {
        var i = 0
        while (i < 4) {
          if (bd.getBit(128) == 1) refLfDelta(i) = bd.signed(6)
          i += 1
        }
        i = 0
        while (i < 4) {
          if (bd.getBit(128) == 1) modeLfDelta(i) = bd.signed(6)
          i += 1
        }
      }
    }
    val numParts = 1 << bd.literal(2)
    // token partition layout after partition 0
    val sizesAt = part0Start + part0Len
    if (sizesAt + 3 * (numParts - 1) > off + len) return None
    val partStart = new Array[Int](numParts)
    val partEnd = new Array[Int](numParts)
    var cursor = sizesAt + 3 * (numParts - 1)
    var pi = 0
    while (pi < numParts) {
      val sz =
        if (pi == numParts - 1) off + len - cursor
        else (buf(sizesAt + 3 * pi) & 0xff) |
          ((buf(sizesAt + 3 * pi + 1) & 0xff) << 8) |
          ((buf(sizesAt + 3 * pi + 2) & 0xff) << 16)
      if (sz < 0 || cursor + sz > off + len) return None
      partStart(pi) = cursor; partEnd(pi) = cursor + sz
      cursor += sz
      pi += 1
    }
    val parts = Array.tabulate(numParts)(i =>
      new BoolDec(buf, partStart(i), partEnd(i)))

    // quantizers
    val yacQi = bd.literal(7)
    val ydcDelta = bd.maybeSigned(4)
    val y2dcDelta = bd.maybeSigned(4)
    val y2acDelta = bd.maybeSigned(4)
    val uvdcDelta = bd.maybeSigned(4)
    val uvacDelta = bd.maybeSigned(4)

    def quantFor(seg: Int): Array[Int] = {
      val qi = clampQ(
        if (!segEnabled) yacQi
        else if (segAbsDelta) segQ(seg)
        else yacQi + segQ(seg))
      val ydc = DcQLookup(clampQ(qi + ydcDelta))
      val yac = AcQLookup(qi)
      val y2dc = DcQLookup(clampQ(qi + y2dcDelta)) * 2
      val y2ac = {
        val v = AcQLookup(clampQ(qi + y2acDelta)) * 155 / 100
        if (v < 8) 8 else v
      }
      val uvdc = {
        val v = DcQLookup(clampQ(qi + uvdcDelta))
        if (v > 132) 132 else v
      }
      val uvac = AcQLookup(clampQ(qi + uvacDelta))
      Array(ydc, yac, y2dc, y2ac, uvdc, uvac)
    }
    val segQuants = Array.tabulate(4)(quantFor)

    bd.literal(1) // refresh entropy probs (keyframe: no-op)

    // coefficient probability updates
    val proba = Array.ofDim[Int](4, 8, 3, 11)
    var t = 0; var idx = 0
    while (t < 4) {
      var b = 0
      while (b < 8) {
        var c = 0
        while (c < 3) {
          var p = 0
          while (p < 11) {
            val base = CoeffProba0(idx)
            proba(t)(b)(c)(p) =
              if (bd.getBit(CoeffUpdateProba(idx)) == 1) bd.literal(8)
              else base
            idx += 1
            p += 1
          }
          c += 1
        }
        b += 1
      }
      t += 1
    }
    val mbNoSkip = bd.getBit(128) == 1
    val probSkip = if (mbNoSkip) bd.literal(8) else 0

    // ---- per-MB mode parse (partition 0, all MBs sequential) ----
    val mbW = (w + 15) >> 4
    val mbH = (h + 15) >> 4
    val nMb = mbW * mbH
    val mbSeg = new Array[Byte](nMb)
    val mbSkipF = new Array[Boolean](nMb)
    val mbYMode = new Array[Byte](nMb)
    val mbUvMode = new Array[Byte](nMb)
    val mbBModes = new Array[Byte](nMb * 16) // only for B_PRED MBs
    val aboveB = new Array[Byte](mbW * 4)
    val leftB = new Array[Byte](4)
    var mbY = 0
    while (mbY < mbH) {
      java.util.Arrays.fill(leftB, 0.toByte)
      var mbX = 0
      while (mbX < mbW) {
        val i = mbY * mbW + mbX
        if (segUpdateMap)
          mbSeg(i) = bd.tree(SegmentTree, segTreeProbs).toByte
        if (mbNoSkip) mbSkipF(i) = bd.getBit(probSkip) == 1
        val ym = bd.tree(KfYModeTree, KfYModeProba)
        mbYMode(i) = ym.toByte
        if (ym == MY_B) {
          var sb = 0
          while (sb < 16) {
            val sx = sb & 3; val sy = sb >> 2
            val a = if (sy == 0) aboveB(mbX * 4 + sx) else
              mbBModes(i * 16 + sb - 4)
            val l = if (sx == 0) leftB(sy) else mbBModes(i * 16 + sb - 1)
            val bm = bd.tree(BModeTree, KfBModeProba,
              (a * 10 + l) * 9)
            mbBModes(i * 16 + sb) = bm.toByte
            if (sy == 3) aboveB(mbX * 4 + sx) = bm.toByte
            if (sx == 3) leftB(sy) = bm.toByte
            sb += 1
          }
        } else {
          val imp = impliedB(ym).toByte
          var k = 0
          while (k < 4) {
            aboveB(mbX * 4 + k) = imp; leftB(k) = imp; k += 1
          }
        }
        mbUvMode(i) = bd.tree(UvModeTree, KfUvModeProba).toByte
        mbX += 1
      }
      mbY += 1
    }

    // ---- residuals + reconstruction ----
    val yStride = mbW * 16
    val cStride = mbW * 8
    val yPix = new Array[Byte](yStride * mbH * 16)
    val uPix = new Array[Byte](cStride * mbH * 8)
    val vPix = new Array[Byte](cStride * mbH * 8)

    // nnz contexts
    val aboveYnz = new Array[Int](mbW * 4)
    val aboveUnz = new Array[Int](mbW * 2)
    val aboveVnz = new Array[Int](mbW * 2)
    val aboveY2nz = new Array[Int](mbW)
    val leftYnz = new Array[Int](4)
    val leftUnz = new Array[Int](2)
    val leftVnz = new Array[Int](2)
    var leftY2nz = 0

    val mbHasCoeffs = new Array[Boolean](nMb)
    val coeffs = new Array[Int](25 * 16) // 16 Y + 4 U + 4 V + Y2

    /** token decode for one 4x4 block into out[16] (dequantized,
      * de-zigzagged); returns 1 if any nonzero coefficient. */
    def decodeBlock(part: BoolDec, typ: Int, firstCoeff: Int, ctx0: Int,
        dqDc: Int, dqAc: Int, out: Array[Int], outOff: Int): Int = {
      // firstCoeff==1 (Y blocks of an i16 MB): raster position 0 holds
      // the WHT-distributed second-order DC — never zero it here
      java.util.Arrays.fill(out, outOff + firstCoeff, outOff + 16, 0)
      var n = firstCoeff
      var ctx = ctx0
      var any = 0
      var skipEob = false
      while (n < 16) {
        val p = proba(typ)(Bands(n))(ctx)
        if (!skipEob && part.getBit(p(0)) == 0) return any
        if (part.getBit(p(1)) == 0) {
          ctx = 0; skipEob = true; n += 1
        } else {
          skipEob = false
          var v = 0
          if (part.getBit(p(2)) == 0) { v = 1; ctx = 1 }
          else {
            ctx = 2
            if (part.getBit(p(3)) == 0) {
              if (part.getBit(p(4)) == 0) v = 2
              else v = 3 + part.getBit(p(5))
            } else {
              def cat(probs: Array[Int], base: Int): Int = {
                var extra = 0
                var k = 0
                while (k < probs.length) {
                  extra = (extra << 1) | part.getBit(probs(k)); k += 1
                }
                base + extra
              }
              if (part.getBit(p(6)) == 0) {
                if (part.getBit(p(7)) == 0) v = cat(Cat1, CatBase(0))
                else v = cat(Cat2, CatBase(1))
              } else {
                if (part.getBit(p(8)) == 0) {
                  if (part.getBit(p(9)) == 0) v = cat(Cat3, CatBase(2))
                  else v = cat(Cat4, CatBase(3))
                } else {
                  if (part.getBit(p(10)) == 0) v = cat(Cat5, CatBase(4))
                  else v = cat(Cat6, CatBase(5))
                }
              }
            }
          }
          if (part.getBit(128) == 1) v = -v
          out(outOff + Zigzag(n)) = v * (if (n == 0) dqDc else dqAc)
          any = 1
          n += 1
        }
      }
      any
    }

    // ---- transforms ----
    def idct4x4(c: Array[Int], o: Int, dst: Array[Byte], dOff: Int,
        stride: Int): Unit = {
      val tmp = new Array[Int](16)
      var i = 0
      while (i < 4) {
        val a1 = c(o + i) + c(o + 8 + i)
        val b1 = c(o + i) - c(o + 8 + i)
        val t1 = (c(o + 4 + i) * 35468) >> 16
        val t2 = c(o + 12 + i) + ((c(o + 12 + i) * 20091) >> 16)
        val c1 = t1 - t2
        val t3 = c(o + 4 + i) + ((c(o + 4 + i) * 20091) >> 16)
        val t4 = (c(o + 12 + i) * 35468) >> 16
        val d1 = t3 + t4
        tmp(i) = a1 + d1
        tmp(12 + i) = a1 - d1
        tmp(4 + i) = b1 + c1
        tmp(8 + i) = b1 - c1
        i += 1
      }
      i = 0
      while (i < 4) {
        val a1 = tmp(4 * i) + tmp(4 * i + 2)
        val b1 = tmp(4 * i) - tmp(4 * i + 2)
        val t1 = (tmp(4 * i + 1) * 35468) >> 16
        val t2 = tmp(4 * i + 3) + ((tmp(4 * i + 3) * 20091) >> 16)
        val c1 = t1 - t2
        val t3 = tmp(4 * i + 1) + ((tmp(4 * i + 1) * 20091) >> 16)
        val t4 = (tmp(4 * i + 3) * 35468) >> 16
        val d1 = t3 + t4
        val base = dOff + i * stride
        dst(base) = clamp255(((a1 + d1 + 4) >> 3) +
          (dst(base) & 0xff)).toByte
        dst(base + 3) = clamp255(((a1 - d1 + 4) >> 3) +
          (dst(base + 3) & 0xff)).toByte
        dst(base + 1) = clamp255(((b1 + c1 + 4) >> 3) +
          (dst(base + 1) & 0xff)).toByte
        dst(base + 2) = clamp255(((b1 - c1 + 4) >> 3) +
          (dst(base + 2) & 0xff)).toByte
        i += 1
      }
    }

    def invWht(c: Array[Int], o: Int, dcOut: Array[Int]): Unit = {
      val tmp = new Array[Int](16)
      var i = 0
      while (i < 4) {
        val a1 = c(o + i) + c(o + 12 + i)
        val b1 = c(o + 4 + i) + c(o + 8 + i)
        val c1 = c(o + 4 + i) - c(o + 8 + i)
        val d1 = c(o + i) - c(o + 12 + i)
        tmp(i) = a1 + b1
        tmp(4 + i) = c1 + d1
        tmp(8 + i) = a1 - b1
        tmp(12 + i) = d1 - c1
        i += 1
      }
      i = 0
      while (i < 4) {
        val a1 = tmp(4 * i) + tmp(4 * i + 3)
        val b1 = tmp(4 * i + 1) + tmp(4 * i + 2)
        val c1 = tmp(4 * i + 1) - tmp(4 * i + 2)
        val d1 = tmp(4 * i) - tmp(4 * i + 3)
        dcOut(4 * i) = (a1 + b1 + 3) >> 3
        dcOut(4 * i + 1) = (c1 + d1 + 3) >> 3
        dcOut(4 * i + 2) = (a1 - b1 + 3) >> 3
        dcOut(4 * i + 3) = (d1 - c1 + 3) >> 3
        i += 1
      }
    }

    // ---- prediction helpers over the padded plane ----
    // border conventions: the whole above row at frame top — including
    // the above-left corner — is 127 (libwebp memsets the top border
    // row to 127 before the corner is ever written); left col = 129 at
    // frame left. Below the top row the above-left of the frame's left
    // column is the left border, 129.
    def pget(p: Array[Byte], stride: Int, x: Int, y: Int,
        maxX: Int): Int =
      if (y < 0) 127
      else if (x < 0) 129
      else if (x >= maxX) p(y * stride + maxX - 1) & 0xff
      else p(y * stride + x) & 0xff

    /** NxN DC/V/H/TM prediction into dst at (x0,y0). */
    def predNxN(p: Array[Byte], stride: Int, x0: Int, y0: Int, n: Int,
        mode: Int, maxX: Int): Unit = {
      mode match {
        case 0 => // DC
          val haveA = y0 > 0; val haveL = x0 > 0
          var sum = 0
          if (haveA) { var i = 0; while (i < n) {
            sum += pget(p, stride, x0 + i, y0 - 1, maxX); i += 1 } }
          if (haveL) { var i = 0; while (i < n) {
            sum += pget(p, stride, x0 - 1, y0 + i, maxX); i += 1 } }
          val dc =
            if (haveA && haveL) (sum + n) / (2 * n)
            else if (haveA || haveL) (sum + n / 2) / n
            else 128
          var yy = 0
          while (yy < n) { var xx = 0; while (xx < n) {
            p((y0 + yy) * stride + x0 + xx) = dc.toByte; xx += 1 }
            yy += 1 }
        case 1 => // V
          var yy = 0
          while (yy < n) { var xx = 0; while (xx < n) {
            p((y0 + yy) * stride + x0 + xx) =
              pget(p, stride, x0 + xx, y0 - 1, maxX).toByte; xx += 1 }
            yy += 1 }
        case 2 => // H
          var yy = 0
          while (yy < n) {
            val l = pget(p, stride, x0 - 1, y0 + yy, maxX)
            var xx = 0
            while (xx < n) {
              p((y0 + yy) * stride + x0 + xx) = l.toByte; xx += 1 }
            yy += 1 }
        case _ => // TM
          val tl = pget(p, stride, x0 - 1, y0 - 1, maxX)
          var yy = 0
          while (yy < n) {
            val l = pget(p, stride, x0 - 1, y0 + yy, maxX)
            var xx = 0
            while (xx < n) {
              p((y0 + yy) * stride + x0 + xx) = clamp255(
                l + pget(p, stride, x0 + xx, y0 - 1, maxX) - tl).toByte
              xx += 1 }
            yy += 1 }
      }
    }

    /** 4x4 B_PRED prediction. A(0..7) = above incl. above-right,
      * L(0..3) = left, P = above-left. */
    def predB(p: Array[Byte], stride: Int, x0: Int, y0: Int, mode: Int,
        tr: Array[Int]): Unit = {
      val A = new Array[Int](8)
      var i = 0
      while (i < 4) {
        A(i) = pget(p, stride, x0 + i, y0 - 1, yStride); i += 1 }
      // above-right: from the caller-provided MB-top-right convention
      while (i < 8) { A(i) = tr(i - 4); i += 1 }
      val L = new Array[Int](4)
      i = 0
      while (i < 4) {
        L(i) = pget(p, stride, x0 - 1, y0 + i, yStride); i += 1 }
      val P = pget(p, stride, x0 - 1, y0 - 1, yStride)
      def s(x: Int, y: Int, v: Int): Unit =
        p((y0 + y) * stride + x0 + x) = v.toByte
      mode match {
        case 0 => // B_DC
          val dc = (A(0) + A(1) + A(2) + A(3) +
            L(0) + L(1) + L(2) + L(3) + 4) >> 3
          var y = 0
          while (y < 4) { var x = 0; while (x < 4) {
            s(x, y, dc); x += 1 }; y += 1 }
        case 1 => // B_TM
          var y = 0
          while (y < 4) { var x = 0; while (x < 4) {
            s(x, y, clamp255(L(y) + A(x) - P)); x += 1 }; y += 1 }
        case 2 => // B_VE
          val r = Array(avg3(P, A(0), A(1)), avg3(A(0), A(1), A(2)),
            avg3(A(1), A(2), A(3)), avg3(A(2), A(3), A(4)))
          var y = 0
          while (y < 4) { var x = 0; while (x < 4) {
            s(x, y, r(x)); x += 1 }; y += 1 }
        case 3 => // B_HE
          val r = Array(avg3(P, L(0), L(1)), avg3(L(0), L(1), L(2)),
            avg3(L(1), L(2), L(3)), avg3(L(2), L(3), L(3)))
          var y = 0
          while (y < 4) { var x = 0; while (x < 4) {
            s(x, y, r(y)); x += 1 }; y += 1 }
        case 4 => // B_RD (down-right)
          // edge sequence E = L3 L2 L1 L0 P A0 A1 A2 A3
          val e = Array(L(3), L(2), L(1), L(0), P, A(0), A(1), A(2), A(3))
          var y = 0
          while (y < 4) { var x = 0; while (x < 4) {
            val k = x - y + 4 // 1..7 center index
            s(x, y, avg3(e(k - 1), e(k), e(k + 1))); x += 1 }; y += 1 }
        case 5 => // B_VR (vertical-right)
          val e = Array(L(3), L(2), L(1), L(0), P, A(0), A(1), A(2), A(3))
          s(0, 3, avg3(e(1), e(2), e(3)))
          s(0, 2, avg3(e(2), e(3), e(4)))
          s(0, 1, avg3(e(3), e(4), e(5))); s(1, 3, avg3(e(3), e(4), e(5)))
          s(0, 0, avg2(e(4), e(5))); s(1, 2, avg2(e(4), e(5)))
          s(1, 1, avg3(e(4), e(5), e(6))); s(2, 3, avg3(e(4), e(5), e(6)))
          s(1, 0, avg2(e(5), e(6))); s(2, 2, avg2(e(5), e(6)))
          s(2, 1, avg3(e(5), e(6), e(7))); s(3, 3, avg3(e(5), e(6), e(7)))
          s(2, 0, avg2(e(6), e(7))); s(3, 2, avg2(e(6), e(7)))
          s(3, 1, avg3(e(6), e(7), e(8)))
          s(3, 0, avg2(e(7), e(8)))
        case 6 => // B_LD (down-left)
          def a(k: Int) = if (k < 7) A(k) else A(7)
          var y = 0
          while (y < 4) { var x = 0; while (x < 4) {
            s(x, y, avg3(a(x + y), a(x + y + 1), a(x + y + 2)))
            x += 1 }; y += 1 }
        case 7 => // B_VL (vertical-left)
          s(0, 0, avg2(A(0), A(1)))
          s(0, 1, avg3(A(0), A(1), A(2)))
          s(0, 2, avg2(A(1), A(2))); s(1, 0, avg2(A(1), A(2)))
          s(1, 1, avg3(A(1), A(2), A(3))); s(0, 3, avg3(A(1), A(2), A(3)))
          s(1, 2, avg2(A(2), A(3))); s(2, 0, avg2(A(2), A(3)))
          s(2, 1, avg3(A(2), A(3), A(4))); s(1, 3, avg3(A(2), A(3), A(4)))
          s(2, 2, avg2(A(3), A(4))); s(3, 0, avg2(A(3), A(4)))
          s(3, 1, avg3(A(3), A(4), A(5))); s(2, 3, avg3(A(3), A(4), A(5)))
          s(3, 2, avg3(A(4), A(5), A(6)))
          s(3, 3, avg3(A(5), A(6), A(7)))
        case 8 => // B_HD (horizontal-down)
          val e = Array(L(3), L(2), L(1), L(0), P, A(0), A(1), A(2))
          s(0, 3, avg2(e(0), e(1)))
          s(1, 3, avg3(e(0), e(1), e(2)))
          s(0, 2, avg2(e(1), e(2))); s(2, 3, avg2(e(1), e(2)))
          s(1, 2, avg3(e(1), e(2), e(3))); s(3, 3, avg3(e(1), e(2), e(3)))
          s(2, 2, avg2(e(2), e(3))); s(0, 1, avg2(e(2), e(3)))
          s(3, 2, avg3(e(2), e(3), e(4))); s(1, 1, avg3(e(2), e(3), e(4)))
          s(2, 1, avg2(e(3), e(4))); s(0, 0, avg2(e(3), e(4)))
          s(3, 1, avg3(e(3), e(4), e(5))); s(1, 0, avg3(e(3), e(4), e(5)))
          s(2, 0, avg3(e(4), e(5), e(6)))
          s(3, 0, avg3(e(5), e(6), e(7)))
        case _ => // B_HU (horizontal-up)
          s(0, 0, avg2(L(0), L(1)))
          s(1, 0, avg3(L(0), L(1), L(2)))
          s(2, 0, avg2(L(1), L(2))); s(0, 1, avg2(L(1), L(2)))
          s(3, 0, avg3(L(1), L(2), L(3))); s(1, 1, avg3(L(1), L(2), L(3)))
          s(2, 1, avg2(L(2), L(3))); s(0, 2, avg2(L(2), L(3)))
          s(3, 1, avg3(L(2), L(3), L(3))); s(1, 2, avg3(L(2), L(3), L(3)))
          s(2, 2, L(3)); s(3, 2, L(3))
          s(0, 3, L(3)); s(1, 3, L(3)); s(2, 3, L(3)); s(3, 3, L(3))
      }
    }

    val dbg = sys.env.contains("GRAFT_VP8_DEBUG")
    if (dbg) {
      System.err.println(s"[vp8] ${w}x$h mb=${mbW}x$mbH parts=$numParts " +
        s"seg=$segEnabled/$segUpdateMap filter=${
          if (simpleFilter) "simple" else "normal"}/$filterLevel/" +
        s"$sharpness lfDelta=$lfDeltaEnabled(${refLfDelta.mkString(",")};${
          modeLfDelta.mkString(",")}) qi=$yacQi deltas=" +
        s"$ydcDelta,$y2dcDelta,$y2acDelta,$uvdcDelta,$uvacDelta " +
        s"noSkip=$mbNoSkip($probSkip) dq0=${segQuants(0).mkString(",")}")
      for (i <- 0 until math.min(nMb, 6))
        System.err.println(s"[vp8] mb$i ymode=${mbYMode(i)} uv=${
          mbUvMode(i)} skip=${mbSkipF(i)} bmodes=${
          if (mbYMode(i) == 4) mbBModes.slice(i * 16, i * 16 + 16)
            .mkString(",") else "-"}")
    }

    val y2dc = new Array[Int](16)
    mbY = 0
    while (mbY < mbH) {
      java.util.Arrays.fill(leftYnz, 0)
      java.util.Arrays.fill(leftUnz, 0)
      java.util.Arrays.fill(leftVnz, 0)
      leftY2nz = 0
      val part = parts(mbY % numParts)
      var mbX = 0
      while (mbX < mbW) {
        val i = mbY * mbW + mbX
        val seg = if (segEnabled) mbSeg(i).toInt else 0
        val dq = segQuants(seg)
        val ym = mbYMode(i).toInt
        val isB = ym == MY_B
        var hasCoeffs = false
        java.util.Arrays.fill(coeffs, 0)
        var y2nz = 0
        if (mbSkipF(i)) {
          // all-zero MB: contexts reset; the Y2 context only when the
          // MB carries a Y2 block (the spec's B_PRED persistence rule)
          var k = 0
          while (k < 4) { leftYnz(k) = 0; aboveYnz(mbX * 4 + k) = 0
            k += 1 }
          k = 0
          while (k < 2) {
            leftUnz(k) = 0; aboveUnz(mbX * 2 + k) = 0
            leftVnz(k) = 0; aboveVnz(mbX * 2 + k) = 0; k += 1 }
          if (!isB) { leftY2nz = 0; aboveY2nz(mbX) = 0 }
        } else {
          if (!isB) {
            val ctx = leftY2nz + aboveY2nz(mbX)
            y2nz = decodeBlock(part, 1, 0, ctx, dq(2), dq(3),
              coeffs, 24 * 16)
            leftY2nz = y2nz; aboveY2nz(mbX) = y2nz
            if (y2nz != 0) hasCoeffs = true
            invWht(coeffs, 24 * 16, y2dc)
            var b = 0
            while (b < 16) { coeffs(b * 16) = y2dc(b); b += 1 }
            if (y2dc.exists(_ != 0)) hasCoeffs = true
            if (dbg && i == 0)
              System.err.println(s"[vp8] mb0 y2nz=$y2nz y2dc=${
                y2dc.mkString(",")}")
          }
          val typ = if (isB) 3 else 0
          val first = if (isB) 0 else 1
          var b = 0
          while (b < 16) {
            val bx = b & 3; val by = b >> 2
            val ctx = leftYnz(by) + aboveYnz(mbX * 4 + bx)
            val nz = decodeBlock(part, typ, first, ctx,
              dq(0), dq(1), coeffs, b * 16)
            leftYnz(by) = nz; aboveYnz(mbX * 4 + bx) = nz
            if (nz != 0) hasCoeffs = true
            b += 1
          }
          b = 0
          while (b < 4) {
            val bx = b & 1; val by = b >> 1
            val ctxU = leftUnz(by) + aboveUnz(mbX * 2 + bx)
            val nzU = decodeBlock(part, 2, 0, ctxU, dq(4), dq(5),
              coeffs, (16 + b) * 16)
            leftUnz(by) = nzU; aboveUnz(mbX * 2 + bx) = nzU
            if (nzU != 0) hasCoeffs = true
            b += 1
          }
          b = 0
          while (b < 4) {
            val bx = b & 1; val by = b >> 1
            val ctxV = leftVnz(by) + aboveVnz(mbX * 2 + bx)
            val nzV = decodeBlock(part, 2, 0, ctxV, dq(4), dq(5),
              coeffs, (20 + b) * 16)
            leftVnz(by) = nzV; aboveVnz(mbX * 2 + bx) = nzV
            if (nzV != 0) hasCoeffs = true
            b += 1
          }
        }
        mbHasCoeffs(i) = hasCoeffs

        // ---- reconstruct luma ----
        val px = mbX * 16; val py = mbY * 16
        if (!isB) {
          predNxN(yPix, yStride, px, py, 16, ym, yStride)
          var b = 0
          while (b < 16) {
            idct4x4(coeffs, b * 16, yPix,
              (py + (b >> 2) * 4) * yStride + px + (b & 3) * 4, yStride)
            b += 1
          }
        } else {
          // MB top-right pixels for all 4x4 rows (the spec quirk: every
          // sub-block uses the MACROBLOCK's above-right, not its own)
          val tr = new Array[Int](4)
          var k = 0
          while (k < 4) {
            val x = px + 16 + k
            tr(k) =
              if (mbY == 0) 127
              else if (x < yStride) yPix((py - 1) * yStride + x) & 0xff
              else yPix((py - 1) * yStride + yStride - 1) & 0xff
            k += 1
          }
          var sb = 0
          while (sb < 16) {
            val sx = (sb & 3) * 4; val sy = (sb >> 2) * 4
            val trArr = if ((sb & 3) == 3) tr else {
              // interior blocks: above-right = 4 pixels to the right
              // in the row above the sub-block
              val a = new Array[Int](4)
              var j = 0
              while (j < 4) {
                a(j) = pget(yPix, yStride, px + sx + 4 + j,
                  py + sy - 1, yStride)
                j += 1
              }
              if (py + sy == 0) { var j = 0
                while (j < 4) { a(j) = 127; j += 1 } }
              a
            }
            predB(yPix, yStride, px + sx, py + sy,
              mbBModes(i * 16 + sb).toInt, trArr)
            idct4x4(coeffs, sb * 16, yPix,
              (py + sy) * yStride + px + sx, yStride)
            sb += 1
          }
        }
        // ---- chroma ----
        val cx = mbX * 8; val cy = mbY * 8
        val uvm = mbUvMode(i).toInt
        predNxN(uPix, cStride, cx, cy, 8, uvm, cStride)
        predNxN(vPix, cStride, cx, cy, 8, uvm, cStride)
        var b = 0
        while (b < 4) {
          val bx = (b & 1) * 4; val by = (b >> 1) * 4
          idct4x4(coeffs, (16 + b) * 16, uPix,
            (cy + by) * cStride + cx + bx, cStride)
          idct4x4(coeffs, (20 + b) * 16, vPix,
            (cy + by) * cStride + cx + bx, cStride)
          b += 1
        }
        mbX += 1
      }
      mbY += 1
    }

    // ---- loop filter ----
    if (filterLevel > 0) {
      Vp8LoopFilter.filterFrame(
        yPix, uPix, vPix, yStride, cStride, mbW, mbH,
        simpleFilter, filterLevel, sharpness,
        segEnabled, segAbsDelta, segLf, mbSeg,
        lfDeltaEnabled, refLfDelta(0), modeLfDelta(0),
        mbYMode, mbHasCoeffs)
    }

    // crop to w x h
    val cw = (w + 1) >> 1
    val ch = (h + 1) >> 1
    val yOut = new Array[Byte](w * h)
    var r = 0
    while (r < h) {
      System.arraycopy(yPix, r * yStride, yOut, r * w, w); r += 1 }
    val uOut = new Array[Byte](cw * ch)
    val vOut = new Array[Byte](cw * ch)
    r = 0
    while (r < ch) {
      System.arraycopy(uPix, r * cStride, uOut, r * cw, cw)
      System.arraycopy(vPix, r * cStride, vOut, r * cw, cw)
      r += 1
    }
    Some(Planes(w, h, yOut, uOut, vOut))
  } catch { case scala.util.control.NonFatal(_) => None }
}
