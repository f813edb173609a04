package graft.operators

import java.io.ByteArrayOutputStream

import graft.operators.MediaCodecs.Image

/** Pure-JVM baseline JPEG codec (ITU-T T.81 / ISO 10918-1, public
  * spec), closing the last honest media stub: the multimodal pipeline
  * can now decode the format real image corpora actually arrive in.
  *
  * Decoder: baseline sequential DCT (SOF0/1) and progressive DCT
  * (SOF2, Annex G: spectral selection + successive approximation +
  * EOB runs), 8-bit precision, 1 or 3 components, sampling factors
  * 1–2 (covers 4:4:4, 4:2:2, 4:2:0), byte stuffing, DRI/RSTn restart
  * markers, multiple DQT/DHT segments, 8- and 16-bit quantization
  * tables. Arithmetic coding and hierarchical/lossless SOFs are
  * rejected with a clear error.
  *
  * Encoder: baseline, JFIF APP0, Annex K quantization tables scaled by
  * the usual quality curve, Annex K huffman tables, 4:4:4 or 4:2:0
  * subsampling, optional restart interval.
  *
  * Both directions run the exact same double-precision orthonormal
  * 8×8 DCT basis (separable; validated against the direct O(n⁴)
  * definition in JpegCodecSpec), so roundtrip error is bounded by
  * quantization alone. Executor-side pure byte transforms — payloads
  * never shuffle (the [[Multimodal]] discipline).
  */
object JpegCodec {

  // ---- constants from the public spec -------------------------------

  /** Zig-zag scan order: zigzag(k) = natural (row-major) index of the
    * k-th coefficient in scan order. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.1 luminance / K.2 chrominance quantization tables, in
    * NATURAL order. */
  private val StdLumaQ: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  private val StdChromaQ: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Annex K.3 typical huffman tables: (bits[1..16], values). */
  private val DcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).map(_.toByte).toArray
  private val DcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).map(_.toByte).toArray
  private val AcLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)
  private val AcChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)

  /** Orthonormal 8×8 DCT basis a(u,x) = C(u)/2 · cos((2x+1)uπ/16):
    * forward S = A f Aᵀ, inverse f = Aᵀ S A — one table, both ways. */
  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** f = Aᵀ S A, separable: in/out are 64-length natural-order. */
  private[graft] def idct(in: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var x = 0
    while (x < 8) { // tmp(x,v) = Σu a(u,x)·S(u,v)
      var v = 0
      while (v < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += Basis(u)(x) * in(u * 8 + v); u += 1 }
        tmp(x * 8 + v) = s; v += 1
      }
      x += 1
    }
    x = 0
    while (x < 8) { // out(x,y) = Σv tmp(x,v)·a(v,y)
      var y = 0
      while (y < 8) {
        var s = 0.0; var v = 0
        while (v < 8) { s += tmp(x * 8 + v) * Basis(v)(y); v += 1 }
        out(x * 8 + y) = s; y += 1
      }
      x += 1
    }
  }

  /** S = A f Aᵀ, separable. */
  private[graft] def fdct(in: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) { // tmp(u,y) = Σx a(u,x)·f(x,y)
      var y = 0
      while (y < 8) {
        var s = 0.0; var x = 0
        while (x < 8) { s += Basis(u)(x) * in(x * 8 + y); x += 1 }
        tmp(u * 8 + y) = s; y += 1
      }
      u += 1
    }
    u = 0
    while (u < 8) { // out(u,v) = Σy tmp(u,y)·a(v,y)
      var v = 0
      while (v < 8) {
        var s = 0.0; var y = 0
        while (y < 8) { s += tmp(u * 8 + y) * Basis(v)(y); y += 1 }
        out(u * 8 + v) = s; v += 1
      }
      u += 1
    }
  }

  // ---- huffman tables -------------------------------------------------

  /** Canonical huffman per Annex C: parallel (code, length, value). */
  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    val nCodes: Int = vals.length
    val codes = new Array[Int](nCodes)
    val lengths = new Array[Int](nCodes)
    val values: Array[Byte] = vals
    // decoder acceleration per Annex F.2.2.3: minCode/maxCode/valPtr
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var len = 1
      while (len <= 16) {
        valPtr(len) = k
        minCode(len) = code
        var i = 0
        while (i < bits(len)) {
          codes(k) = code; lengths(k) = len
          code += 1; k += 1; i += 1
        }
        maxCode(len) = if (bits(len) > 0) code - 1 else -1
        code <<= 1
        len += 1
      }
      require(k == nCodes, s"huffman BITS sums $k but ${nCodes} values")
    }
    /** Encoder lookup: value → (code, length). */
    val encCode = new Array[Int](256)
    val encLen = new Array[Int](256)
    locally {
      var k = 0
      while (k < nCodes) {
        encCode(values(k) & 0xff) = codes(k)
        encLen(values(k) & 0xff) = lengths(k)
        k += 1
      }
    }
  }

  private lazy val StdDcLuma = new HuffTable(DcLumaBits, DcLumaVals)
  private lazy val StdDcChroma = new HuffTable(DcChromaBits, DcChromaVals)
  private lazy val StdAcLuma = new HuffTable(AcLumaBits, AcLumaVals)
  private lazy val StdAcChroma = new HuffTable(AcChromaBits, AcChromaVals)

  // ---- bit I/O --------------------------------------------------------

  /** Entropy-coded-segment reader: byte stuffing (FF 00 → FF) and RST
    * marker awareness. */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    var hitMarker: Int = -1 // marker byte (e.g. 0xD0) seen mid-stream

    def align(): Unit = { bitBuf = 0; bitCnt = 0 }

    private def fill(): Unit = {
      while (bitCnt <= 24 && hitMarker < 0) {
        if (pos >= data.length) { bitBuf |= 0 << (24 - bitCnt); bitCnt += 8 }
        else {
          val b = data(pos) & 0xff
          if (b == 0xff) {
            val nxt = if (pos + 1 < data.length) data(pos + 1) & 0xff else 0xd9
            if (nxt == 0x00) { // stuffed FF
              bitBuf |= 0xff << (24 - bitCnt); bitCnt += 8; pos += 2
            } else { // real marker: stop consuming, pad with zeros
              hitMarker = nxt
              bitBuf |= 0 << (24 - bitCnt); bitCnt += 8
            }
          } else { bitBuf |= b << (24 - bitCnt); bitCnt += 8; pos += 1 }
        }
      }
      // keep padding with zeros once a marker was hit
      while (bitCnt <= 24) { bitCnt += 8 }
    }

    def bit(): Int = {
      if (bitCnt == 0) fill()
      val b = (bitBuf >>> 31) & 1
      bitBuf <<= 1; bitCnt -= 1
      b
    }

    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** Skip to and consume an expected RST marker. */
    def restart(): Int = {
      align()
      // scan forward to the FF xx marker (pos sits just before it)
      while (pos + 1 < data.length &&
        !((data(pos) & 0xff) == 0xff && (data(pos + 1) & 0xff) != 0x00))
        pos += 1
      val m = if (pos + 1 < data.length) data(pos + 1) & 0xff else 0xd9
      pos += 2
      hitMarker = -1
      m
    }

    def decodeHuff(t: HuffTable): Int = {
      var code = bit()
      var len = 1
      while (len <= 16) {
        if (t.maxCode(len) >= 0 && code <= t.maxCode(len))
          return t.values(t.valPtr(len) + code - t.minCode(len)) & 0xff
        code = (code << 1) | bit()
        len += 1
      }
      throw new IllegalArgumentException("invalid huffman code in scan")
    }
  }

  /** EXTEND per F.2.2.1: map magnitude bits to a signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0
    else if (v < (1 << (t - 1))) v - (1 << t) + 1
    else v

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >>> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf & 0xff)
          if ((buf & 0xff) == 0xff) out.write(0x00) // stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits, per the spec. */
    def flush(): Unit = if (cnt > 0) { write(0xff, 8 - cnt) }
  }

  private def category(v: Int): Int = {
    var m = math.abs(v); var t = 0
    while (m != 0) { m >>= 1; t += 1 }
    t
  }

  // ---- decoder --------------------------------------------------------

  private final case class Component(
      id: Int, h: Int, v: Int, tq: Int,
      var dcTable: Int = 0, var acTable: Int = 0)

  /** Decode a baseline JPEG to row-major top-down RGB. */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "not a JPEG (missing SOI)")
    var pos = 2
    val qTables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var width = -1; var height = -1
    var comps: Array[Component] = null
    var restartInterval = 0

    def u16(off: Int): Int = ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)

    var scanComps: Array[Component] = null
    var scanStart = -1
    while (scanStart < 0 && pos + 4 <= bytes.length) {
      require((bytes(pos) & 0xff) == 0xff, f"expected marker at $pos")
      // T.81 B.1.1.2: any marker may be preceded by any number of
      // optional 0xFF fill bytes — skip to the first non-0xFF code
      // byte, else a conformant padded stream misparses a fill byte as
      // a marker and reads a bogus segment length
      while (pos + 4 < bytes.length && (bytes(pos + 1) & 0xff) == 0xff)
        pos += 1
      val marker = bytes(pos + 1) & 0xff
      val seg = pos + 4
      val len = if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) 0
        else u16(pos + 2)
      marker match {
        case 0xc0 | 0xc1 => // SOF0/1 — baseline (extended sequential ok)
          require((bytes(seg) & 0xff) == 8, "only 8-bit precision supported")
          height = u16(seg + 1); width = u16(seg + 3)
          val n = bytes(seg + 5) & 0xff
          require(n == 1 || n == 3, s"only 1 or 3 components (got $n)")
          comps = Array.tabulate(n) { i =>
            val o = seg + 6 + i * 3
            val hv = bytes(o + 1) & 0xff
            val c = Component(bytes(o) & 0xff, hv >> 4, hv & 0xf,
              bytes(o + 2) & 0xff)
            require(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2,
              s"sampling factors ${c.h}x${c.v} unsupported (1-2 only)")
            c
          }
        case 0xc2 => return decodeProgressive(bytes)
        case m if m >= 0xc3 && m <= 0xcf && m != 0xc4 && m != 0xc8 =>
          throw new IllegalArgumentException(
            f"unsupported SOF marker 0x$m%02x — baseline only")
        case 0xc4 => // DHT — possibly several tables in one segment
          var o = seg
          while (o < pos + 2 + len) {
            val tcTh = bytes(o) & 0xff
            val tc = tcTh >> 4; val th = tcTh & 0xf
            val bits = new Array[Int](17)
            var total = 0
            var i = 1
            while (i <= 16) {
              bits(i) = bytes(o + i) & 0xff; total += bits(i); i += 1
            }
            val vals = new Array[Byte](total)
            System.arraycopy(bytes, o + 17, vals, 0, total)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTables(th) = t else acTables(th) = t
            o += 17 + total
          }
        case 0xdb => // DQT — possibly several tables, 8- or 16-bit
          var o = seg
          while (o < pos + 2 + len) {
            val pqTq = bytes(o) & 0xff
            val pq = pqTq >> 4; val tq = pqTq & 0xf
            val tab = new Array[Int](64)
            var k = 0
            while (k < 64) {
              // stored in zigzag order; keep natural order internally
              val v = if (pq == 0) bytes(o + 1 + k) & 0xff
                else u16(o + 1 + k * 2)
              tab(Zigzag(k)) = v
              k += 1
            }
            qTables(tq) = tab
            o += 1 + (if (pq == 0) 64 else 128)
          }
        case 0xdd => restartInterval = u16(seg)
        case 0xda => // SOS
          val n = bytes(seg) & 0xff
          scanComps = Array.tabulate(n) { i =>
            val cid = bytes(seg + 1 + i * 2) & 0xff
            val tdTa = bytes(seg + 2 + i * 2) & 0xff
            val c = comps.find(_.id == cid).getOrElse(
              throw new IllegalArgumentException(s"SOS refers to unknown component $cid"))
            c.dcTable = tdTa >> 4; c.acTable = tdTa & 0xf
            c
          }
          scanStart = pos + 2 + len
        case 0xd9 => throw new IllegalArgumentException("EOI before SOS")
        case _ => // APPn / COM / others — skip
      }
      if (scanStart < 0) pos += 2 + len
    }
    require(scanStart >= 0 && comps != null, "missing SOS/SOF")
    require(scanComps.length == comps.length,
      "non-interleaved multi-scan not supported")

    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)

    // Decompression-bomb guard: a corrupt SOF claiming huge dims on a
    // tiny stream must fail cleanly (opaque path), never allocate
    // gigabytes and OOM the task. Each 8x8 block costs >= 2 entropy
    // bits (DC + EOB), so a legitimate stream has far more than one
    // byte per 1024 pixels.
    require(width.toLong * height <= bytes.length.toLong * 1024,
      s"jpeg dims ${width}x$height implausible for ${bytes.length} bytes")
    // absolute cap regardless of file size (MediaCodecs.MaxImagePixels
    // rationale): a ~660 KB file claiming 26000x26000 passes the
    // ratio above but would allocate a ~676 MB plane per component
    // and a ~2 GB rgb buffer; larger dims overflow width*height*3
    require(width.toLong * height <= MediaCodecs.MaxImagePixels,
      s"jpeg dims ${width}x$height exceed the " +
        s"${MediaCodecs.MaxImagePixels}-pixel cap")

    // per-component pixel planes at the component's own resolution
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = comps.indices.map(i =>
      new Array[Byte](planeW(i) * planeH(i))).toArray

    val reader = new BitReader(bytes, scanStart)
    val dcPred = new Array[Int](comps.length)
    val coef = new Array[Double](64)
    val pix = new Array[Double](64)
    var expectedRst = 0
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        val m = reader.restart()
        require(m == 0xd0 + expectedRst,
          f"expected RST$expectedRst, got marker 0x$m%02x")
        expectedRst = (expectedRst + 1) & 7
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = qTables(c.tq)
        require(q != null, s"missing quantization table ${c.tq}")
        val dcT = dcTables(c.dcTable); val acT = acTables(c.acTable)
        require(dcT != null && acT != null, "missing huffman table")
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0.0)
            // DC
            val t = reader.decodeHuff(dcT)
            val diff = extend(reader.bits(t), t)
            dcPred(ci) += diff
            coef(0) = dcPred(ci).toDouble * q(0)
            // AC
            var k = 1
            var eob = false
            while (k <= 63 && !eob) {
              val rs = reader.decodeHuff(acT)
              val r = rs >> 4; val s = rs & 0xf
              if (s == 0) {
                if (r == 15) k += 16 else eob = true
              } else {
                k += r
                require(k <= 63, "AC run past end of block")
                val nat = Zigzag(k)
                coef(nat) = extend(reader.bits(s), s).toDouble * q(nat)
                k += 1
              }
            }
            idct(coef, pix)
            // place block into the component plane (level shift + clamp)
            val px0 = (mx * c.h + bx) * 8
            val py0 = (my * c.v + by) * 8
            val pw = planeW(ci)
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                val v = math.round(pix(xx * 8 + yy) + 128.0).toInt
                planes(ci)((py0 + xx) * pw + px0 + yy) =
                  (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    toRgb(comps, planes, planeW, width, height, maxH, maxV)
  }

  /** Upsample component planes (nearest) + YCbCr→RGB (or replicate a
    * single gray plane) — shared by the baseline and progressive
    * decode paths. */
  private def toRgb(comps: Array[Component], planes: Array[Array[Byte]],
      planeW: Array[Int], width: Int, height: Int,
      maxH: Int, maxV: Int): Image = {
    val rgb = new Array[Byte](width * height * 3)
    if (comps.length == 1) {
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val g = planes(0)(y * pw + x)
          val d = (y * width + x) * 3
          rgb(d) = g; rgb(d + 1) = g; rgb(d + 2) = g
          x += 1
        }
        y += 1
      }
    } else {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          def sample(ci: Int): Int = {
            val c = comps(ci)
            val sx = x * c.h / maxH; val sy = y * c.v / maxV
            planes(ci)(sy * planeW(ci) + sx) & 0xff
          }
          val yv = sample(0).toDouble
          val cb = sample(1) - 128.0
          val cr = sample(2) - 128.0
          def clamp(d: Double): Byte = {
            val v = math.round(d).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          val d = (y * width + x) * 3
          rgb(d) = clamp(yv + 1.402 * cr)
          rgb(d + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
          rgb(d + 2) = clamp(yv + 1.772 * cb)
          x += 1
        }
        y += 1
      }
    }
    Image(width, height, rgb)
  }

  // ---- progressive decoder (ITU-T T.81 Annex G) -----------------------

  /** Decode a progressive-DCT JPEG (SOF2): spectral selection and
    * successive approximation per Annex G. Coefficients accumulate in
    * a per-component block store across scans — DC first/refinement
    * (interleaved or single-component), AC first with EOB runs
    * (G.1.2.2), AC refinement with correction bits (G.1.2.3) — then a
    * single dequantize+IDCT pass reconstructs the planes. Restart
    * markers reset DC predictors AND the EOB run, per G.1.2.
    *
    * Non-interleaved scans cover ceil(compW/8)×ceil(compH/8) blocks of
    * the COMPONENT's own dimensions (A.2.2), not the MCU-padded grid —
    * the store is MCU-padded so interleaved DC scans can write the
    * padding blocks, and the unwritten padding simply IDCTs to flat
    * gray that the crop discards. */
  private def decodeProgressive(bytes: Array[Byte]): Image = {
    var pos = 2
    val qTables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var width = -1; var height = -1
    var comps: Array[Component] = null
    var restartInterval = 0
    var maxH = 1; var maxV = 1; var mcusX = 0; var mcusY = 0
    // per component: MCU-padded block grid (storage) and the
    // non-interleaved scan's own block grid (iteration bounds)
    var blocksW: Array[Int] = null; var blocksH: Array[Int] = null
    var nonIntW: Array[Int] = null; var nonIntH: Array[Int] = null
    var coefs: Array[Array[Short]] = null
    var sawScan = false

    def u16(off: Int): Int =
      ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)

    /** One scan's entropy decode into the coefficient store. */
    def decodeScan(reader: BitReader, scanComps: Array[Component],
        ss: Int, se: Int, ah: Int, al: Int): Unit = {
      val dcPred = new Array[Int](scanComps.length)
      var eobrun = 0
      var expectedRst = 0

      def restart(): Unit = {
        val m = reader.restart()
        require(m == 0xd0 + expectedRst,
          f"expected RST$expectedRst, got marker 0x$m%02x")
        expectedRst = (expectedRst + 1) & 7
        java.util.Arrays.fill(dcPred, 0)
        eobrun = 0
      }

      /** DC pass on one block (first or refinement). */
      def dcBlock(sci: Int, coef: Array[Short], off: Int): Unit =
        if (ah == 0) {
          val t = reader.decodeHuff(dcTables(scanComps(sci).dcTable))
          dcPred(sci) += extend(reader.bits(t), t)
          coef(off) = (dcPred(sci) << al).toShort
        } else if (reader.bit() == 1) {
          coef(off) = (coef(off) | (1 << al)).toShort
        }

      /** AC first pass (Ah=0) on one block — G.1.2.2 with EOB runs. */
      def acFirst(acT: HuffTable, coef: Array[Short], off: Int): Unit =
        if (eobrun > 0) eobrun -= 1
        else {
          var k = ss
          while (k <= se) {
            val rs = reader.decodeHuff(acT)
            val r = rs >> 4; val s = rs & 0xf
            if (s == 0) {
              if (r < 15) { // EOBn: this block ends, r more follow
                eobrun = (1 << r) - 1 + (if (r > 0) reader.bits(r) else 0)
                k = se + 1
              } else k += 16 // ZRL
            } else {
              k += r
              require(k <= se, "AC run past Se")
              coef(off + Zigzag(k)) =
                (extend(reader.bits(s), s) << al).toShort
              k += 1
            }
          }
        }

      /** AC refinement pass (Ah>0) on one block — G.1.2.3: each
        * already-nonzero coefficient in the band consumes a correction
        * bit; zero-history coefficients count against the run and may
        * become ±1<<Al. */
      def acRefine(acT: HuffTable, coef: Array[Short], off: Int): Unit = {
        val p1 = 1 << al; val m1 = -1 << al
        def correct(z: Int): Unit =
          if (reader.bit() == 1 && (coef(z) & p1) == 0)
            coef(z) = (coef(z) + (if (coef(z) >= 0) p1 else m1)).toShort
        var k = ss
        if (eobrun == 0) {
          var brk = false
          while (k <= se && !brk) {
            val rs = reader.decodeHuff(acT)
            var r = rs >> 4; val s = rs & 0xf
            var newVal = 0
            if (s == 0) {
              if (r < 15) { // EOBn: remaining coefs still get corrections
                eobrun = (1 << r) + (if (r > 0) reader.bits(r) else 0)
                brk = true
              } // r == 15: ZRL — skip 16 zero-history coefs below
            } else {
              require(s == 1, s"AC refinement magnitude $s (must be 1)")
              newVal = if (reader.bit() == 1) p1 else m1
            }
            if (!brk) {
              var placed = false
              while (k <= se && !placed) {
                val z = off + Zigzag(k)
                if (coef(z) != 0) correct(z)
                else if (r == 0) {
                  if (newVal != 0) coef(z) = newVal.toShort
                  placed = true
                } else r -= 1
                k += 1
              }
            }
          }
        }
        if (eobrun > 0) { // EOB stretch: corrections only, then count down
          while (k <= se) {
            val z = off + Zigzag(k)
            if (coef(z) != 0) correct(z)
            k += 1
          }
          eobrun -= 1
        }
      }

      if (scanComps.length == 1) {
        // non-interleaved: raster order over the component's own grid
        val c = scanComps(0)
        val ci = comps.indexWhere(_.id == c.id)
        val bw = nonIntW(ci); val bh = nonIntH(ci)
        val stride = blocksW(ci)
        val acT = if (ss > 0) acTables(c.acTable) else null
        require(ss == 0 || acT != null, "missing AC huffman table")
        var blk = 0
        val total = bw * bh
        while (blk < total) {
          if (restartInterval > 0 && blk > 0 && blk % restartInterval == 0)
            restart()
          val off = ((blk / bw) * stride + (blk % bw)) * 64
          if (ss == 0) dcBlock(0, coefs(ci), off)
          else if (ah == 0) acFirst(acT, coefs(ci), off)
          else acRefine(acT, coefs(ci), off)
          blk += 1
        }
      } else {
        // interleaved MCU order — only legal for DC scans (B.2.3)
        require(ss == 0 && se == 0, "interleaved AC scan is invalid")
        var mcu = 0
        val totalMcus = mcusX * mcusY
        while (mcu < totalMcus) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0)
            restart()
          val mx = mcu % mcusX; val my = mcu / mcusX
          var sci = 0
          while (sci < scanComps.length) {
            val c = scanComps(sci)
            val ci = comps.indexWhere(_.id == c.id)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                val off = ((my * c.v + by) * blocksW(ci) +
                  (mx * c.h + bx)) * 64
                dcBlock(sci, coefs(ci), off)
                bx += 1
              }
              by += 1
            }
            sci += 1
          }
          mcu += 1
        }
      }
    }

    var done = false
    while (!done && pos + 4 <= bytes.length) {
      require((bytes(pos) & 0xff) == 0xff, f"expected marker at $pos")
      // T.81 B.1.1.2: any marker may be preceded by any number of
      // optional 0xFF fill bytes — skip to the first non-0xFF code
      // byte, else a conformant padded stream misparses a fill byte as
      // a marker and reads a bogus segment length
      while (pos + 4 < bytes.length && (bytes(pos + 1) & 0xff) == 0xff)
        pos += 1
      val marker = bytes(pos + 1) & 0xff
      val seg = pos + 4
      val len = if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) 0
        else u16(pos + 2)
      var posSet = false
      marker match {
        case 0xc2 =>
          require((bytes(seg) & 0xff) == 8, "only 8-bit precision supported")
          height = u16(seg + 1); width = u16(seg + 3)
          val n = bytes(seg + 5) & 0xff
          require(n == 1 || n == 3, s"only 1 or 3 components (got $n)")
          comps = Array.tabulate(n) { i =>
            val o = seg + 6 + i * 3
            val hv = bytes(o + 1) & 0xff
            val c = Component(bytes(o) & 0xff, hv >> 4, hv & 0xf,
              bytes(o + 2) & 0xff)
            require(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2,
              s"sampling factors ${c.h}x${c.v} unsupported (1-2 only)")
            c
          }
          // same bomb guards as baseline: entropy-bits plausibility
          // ratio, then the absolute pixel cap — BEFORE the coefficient
          // store (2 bytes/pixel/component) allocates anything
          require(width.toLong * height <= bytes.length.toLong * 1024,
            s"jpeg dims ${width}x$height implausible for " +
              s"${bytes.length} bytes")
          require(width.toLong * height <= MediaCodecs.MaxImagePixels,
            s"jpeg dims ${width}x$height exceed the " +
              s"${MediaCodecs.MaxImagePixels}-pixel cap")
          maxH = comps.map(_.h).max; maxV = comps.map(_.v).max
          mcusX = (width + 8 * maxH - 1) / (8 * maxH)
          mcusY = (height + 8 * maxV - 1) / (8 * maxV)
          blocksW = comps.map(c => mcusX * c.h)
          blocksH = comps.map(c => mcusY * c.v)
          nonIntW = comps.map(c => ((width * c.h + maxH - 1) / maxH + 7) / 8)
          nonIntH = comps.map(c => ((height * c.v + maxV - 1) / maxV + 7) / 8)
          coefs = comps.indices.map(i =>
            new Array[Short](blocksW(i) * blocksH(i) * 64)).toArray
        case 0xc4 =>
          var o = seg
          while (o < pos + 2 + len) {
            val tcTh = bytes(o) & 0xff
            val tc = tcTh >> 4; val th = tcTh & 0xf
            val bits = new Array[Int](17)
            var total = 0
            var i = 1
            while (i <= 16) {
              bits(i) = bytes(o + i) & 0xff; total += bits(i); i += 1
            }
            val vals = new Array[Byte](total)
            System.arraycopy(bytes, o + 17, vals, 0, total)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTables(th) = t else acTables(th) = t
            o += 17 + total
          }
        case 0xdb =>
          var o = seg
          while (o < pos + 2 + len) {
            val pqTq = bytes(o) & 0xff
            val pq = pqTq >> 4; val tq = pqTq & 0xf
            val tab = new Array[Int](64)
            var k = 0
            while (k < 64) {
              val v = if (pq == 0) bytes(o + 1 + k) & 0xff
                else u16(o + 1 + k * 2)
              tab(Zigzag(k)) = v
              k += 1
            }
            qTables(tq) = tab
            o += 1 + (if (pq == 0) 64 else 128)
          }
        case 0xdd => restartInterval = u16(seg)
        case 0xda =>
          require(comps != null, "SOS before SOF2")
          val n = bytes(seg) & 0xff
          val scanComps = Array.tabulate(n) { i =>
            val cid = bytes(seg + 1 + i * 2) & 0xff
            val tdTa = bytes(seg + 2 + i * 2) & 0xff
            val c = comps.find(_.id == cid).getOrElse(
              throw new IllegalArgumentException(
                s"SOS refers to unknown component $cid"))
            c.dcTable = tdTa >> 4; c.acTable = tdTa & 0xf
            c
          }
          val ss = bytes(seg + 1 + n * 2) & 0xff
          val se = bytes(seg + 2 + n * 2) & 0xff
          val ahal = bytes(seg + 3 + n * 2) & 0xff
          require(ss <= 63 && se <= 63 && ss <= se &&
            (ss == 0 || n == 1), s"invalid scan header Ss=$ss Se=$se")
          val reader = new BitReader(bytes, pos + 2 + len)
          decodeScan(reader, scanComps, ss, se, ahal >> 4, ahal & 0xf)
          sawScan = true
          // resume the marker walk at the next true marker (skip any
          // unconsumed entropy bytes, stuffed FFs and RSTns)
          var p = reader.pos
          var found = false
          while (!found && p + 1 < bytes.length) {
            val m2 = bytes(p + 1) & 0xff
            if ((bytes(p) & 0xff) == 0xff && m2 != 0x00 &&
              !(m2 >= 0xd0 && m2 <= 0xd7)) found = true
            else p += 1
          }
          pos = if (found) p else bytes.length
          posSet = true
        case 0xd9 => done = true
        case _ => // APPn / COM — skip
      }
      if (!posSet && !done) pos += 2 + len
    }
    require(comps != null && sawScan, "missing SOF2/SOS")

    // dequantize + IDCT every stored block into the component planes
    val planes = new Array[Array[Byte]](comps.length)
    val pws = new Array[Int](comps.length)
    val freq = new Array[Double](64)
    val pix = new Array[Double](64)
    var ci = 0
    while (ci < comps.length) {
      val c = comps(ci)
      val q = qTables(c.tq)
      require(q != null, s"missing quantization table ${c.tq}")
      val pw = blocksW(ci) * 8
      pws(ci) = pw
      val plane = new Array[Byte](pw * blocksH(ci) * 8)
      val coef = coefs(ci)
      var blk = 0
      val total = blocksW(ci) * blocksH(ci)
      while (blk < total) {
        val off = blk * 64
        var k = 0
        while (k < 64) { freq(k) = coef(off + k).toDouble * q(k); k += 1 }
        idct(freq, pix)
        val px0 = (blk % blocksW(ci)) * 8
        val py0 = (blk / blocksW(ci)) * 8
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            val v = math.round(pix(xx * 8 + yy) + 128.0).toInt
            plane((py0 + xx) * pw + px0 + yy) =
              (if (v < 0) 0 else if (v > 255) 255 else v).toByte
            xx += 1
          }
          yy += 1
        }
        blk += 1
      }
      planes(ci) = plane
      ci += 1
    }
    toRgb(comps, planes, pws, width, height, maxH, maxV)
  }

  // ---- encoder --------------------------------------------------------

  /** Scale an Annex K base table by the usual quality curve (1–100). */
  private def scaledQ(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map { b =>
      val v = (b * scale + 50) / 100
      math.max(1, math.min(255, v))
    }
  }

  /** Encode row-major RGB as a baseline JFIF JPEG.
    *
    * @param subsample420 true → 4:2:0 chroma (2×2 box-averaged), the
    *                     layout real-world JPEGs overwhelmingly use;
    *                     false → 4:4:4
    * @param restartInterval MCUs between RSTn markers; 0 = none
    */
  def encode(img: Image, quality: Int = 90,
      subsample420: Boolean = false, restartInterval: Int = 0): Array[Byte] = {
    require(img.rgb.length == img.width * img.height * 3)
    val w = img.width; val h = img.height
    val lumaQ = scaledQ(StdLumaQ, quality)
    val chromaQ = scaledQ(StdChromaQ, quality)

    // RGB → YCbCr planes (full resolution)
    val yP = new Array[Double](w * h)
    val cbP = new Array[Double](w * h)
    val crP = new Array[Double](w * h)
    var i = 0
    while (i < w * h) {
      val r = img.rgb(i * 3) & 0xff
      val g = img.rgb(i * 3 + 1) & 0xff
      val b = img.rgb(i * 3 + 2) & 0xff
      yP(i) = 0.299 * r + 0.587 * g + 0.114 * b
      cbP(i) = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
      crP(i) = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
      i += 1
    }

    val (hY, vY) = if (subsample420) (2, 2) else (1, 1)
    val maxH = hY; val maxV = vY
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)

    // chroma planes at subsampled resolution (box average, edge clamp)
    val cw = if (subsample420) (w + 1) / 2 else w
    val ch = if (subsample420) (h + 1) / 2 else h
    val cbS = new Array[Double](cw * ch)
    val crS = new Array[Double](cw * ch)
    if (subsample420) {
      var cy = 0
      while (cy < ch) {
        var cx = 0
        while (cx < cw) {
          var sCb = 0.0; var sCr = 0.0; var n = 0
          var dy = 0
          while (dy < 2) {
            var dx = 0
            while (dx < 2) {
              val x = math.min(cx * 2 + dx, w - 1)
              val y = math.min(cy * 2 + dy, h - 1)
              sCb += cbP(y * w + x); sCr += crP(y * w + x); n += 1
              dx += 1
            }
            dy += 1
          }
          cbS(cy * cw + cx) = sCb / n; crS(cy * cw + cx) = sCr / n
          cx += 1
        }
        cy += 1
      }
    } else {
      System.arraycopy(cbP, 0, cbS, 0, w * h)
      System.arraycopy(crP, 0, crS, 0, w * h)
    }

    val out = new ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      out.write(((body.length + 2) >> 8) & 0xff)
      out.write((body.length + 2) & 0xff)
      out.write(body)
    }
    marker(0xd8) // SOI
    seg(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    def dqtBody(id: Int, tab: Array[Int]): Array[Byte] = {
      val b = new Array[Byte](65)
      b(0) = id.toByte
      var k = 0
      while (k < 64) { b(1 + k) = tab(Zigzag(k)).toByte; k += 1 }
      b
    }
    seg(0xdb, dqtBody(0, lumaQ))
    seg(0xdb, dqtBody(1, chromaQ))
    val sof = new ByteArrayOutputStream()
    sof.write(8)
    sof.write((h >> 8) & 0xff); sof.write(h & 0xff)
    sof.write((w >> 8) & 0xff); sof.write(w & 0xff)
    sof.write(3)
    sof.write(1); sof.write((hY << 4) | vY); sof.write(0) // Y
    sof.write(2); sof.write(0x11); sof.write(1)           // Cb
    sof.write(3); sof.write(0x11); sof.write(1)           // Cr
    seg(0xc0, sof.toByteArray)
    def dhtBody(tc: Int, th: Int, bits: Array[Int], vals: Array[Byte]): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      b.write((tc << 4) | th)
      var i = 1
      while (i <= 16) { b.write(bits(i) & 0xff); i += 1 }
      b.write(vals)
      b.toByteArray
    }
    seg(0xc4, dhtBody(0, 0, DcLumaBits, DcLumaVals))
    seg(0xc4, dhtBody(1, 0, AcLumaBits, AcLumaVals))
    seg(0xc4, dhtBody(0, 1, DcChromaBits, DcChromaVals))
    seg(0xc4, dhtBody(1, 1, AcChromaBits, AcChromaVals))
    if (restartInterval > 0)
      seg(0xdd, Array[Byte](((restartInterval >> 8) & 0xff).toByte,
        (restartInterval & 0xff).toByte))
    seg(0xda, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))

    val bw = new BitWriter(out)
    val block = new Array[Double](64)
    val freq = new Array[Double](64)
    val dcPred = new Array[Int](3)

    /** Grab an 8×8 block (edge clamp), FDCT, quantize, huffman-emit. */
    def emitBlock(plane: Array[Double], pw: Int, ph: Int,
        px0: Int, py0: Int, q: Array[Int], ci: Int,
        dcT: HuffTable, acT: HuffTable): Unit = {
      // block(x*8+y): x = spatial ROW (pairs with vertical frequency
      // in the DCT basis), y = spatial COL — the decoder's convention
      var x = 0
      while (x < 8) {
        var y = 0
        while (y < 8) {
          val sx = math.min(px0 + y, pw - 1) // col
          val sy = math.min(py0 + x, ph - 1) // row
          block(x * 8 + y) = plane(sy * pw + sx) - 128.0
          y += 1
        }
        x += 1
      }
      fdct(block, freq)
      // quantize in natural order
      val qc = new Array[Int](64)
      var k = 0
      while (k < 64) {
        qc(k) = math.round(freq(k) / q(k)).toInt
        k += 1
      }
      // DC
      val diff = qc(0) - dcPred(ci)
      dcPred(ci) = qc(0)
      val t = category(diff)
      bw.write(dcT.encCode(t), dcT.encLen(t))
      if (t > 0) {
        val addl = if (diff >= 0) diff else diff + (1 << t) - 1
        bw.write(addl, t)
      }
      // AC: run-length in zigzag order
      var run = 0
      k = 1
      while (k <= 63) {
        val v = qc(Zigzag(k))
        if (v == 0) run += 1
        else {
          while (run >= 16) {
            bw.write(acT.encCode(0xf0), acT.encLen(0xf0)) // ZRL
            run -= 16
          }
          val s = category(v)
          val rs = (run << 4) | s
          bw.write(acT.encCode(rs), acT.encLen(rs))
          val addl = if (v >= 0) v else v + (1 << s) - 1
          bw.write(addl, s)
          run = 0
        }
        k += 1
      }
      if (run > 0) bw.write(acT.encCode(0x00), acT.encLen(0x00)) // EOB
    }

    var rstIdx = 0
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush()
        marker(0xd0 + rstIdx)
        rstIdx = (rstIdx + 1) & 7
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var by = 0
      while (by < vY) {
        var bx = 0
        while (bx < hY) {
          emitBlock(yP, w, h, (mx * hY + bx) * 8, (my * vY + by) * 8,
            lumaQ, 0, StdDcLuma, StdAcLuma)
          bx += 1
        }
        by += 1
      }
      emitBlock(cbS, cw, ch, mx * 8, my * 8, chromaQ, 1,
        StdDcChroma, StdAcChroma)
      emitBlock(crS, cw, ch, mx * 8, my * 8, chromaQ, 2,
        StdDcChroma, StdAcChroma)
      mcu += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }
}
