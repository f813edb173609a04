package graft.operators

import java.io.ByteArrayOutputStream

import graft.operators.MediaCodecs.Audio

/** Pure-JVM FLAC codec (the public xiph.org FLAC format spec /
  * RFC 9639) — LOSSLESS compressed audio for the multimodal pipeline:
  * unlike the lossy JPEG/μ-law paths, a FLAC roundtrip must reproduce
  * every sample BIT-EXACTLY, which makes it the strongest possible
  * codec proof (any asymmetry between the Rice coder, the fixed
  * predictors, or the bit I/O breaks exact equality immediately, and
  * the CRC-8/CRC-16 checks catch stream-level corruption).
  *
  * Decoder: STREAMINFO + metadata-block walk, frame sync + header
  * (UTF-8-coded frame number, CRC-8), subframe types CONSTANT /
  * VERBATIM / FIXED(0–4) / LPC(1–32) (quantized coefficients at their
  * published precision/shift widths, 64-bit accumulation) with 4- or
  * 5-bit Rice partitions (escape included), wasted bits,
  * 8/12/16/20/24-bit samples, independent channels AND the three
  * stereo decorrelation modes (left/side, right/side, mid/side; the
  * side channel at its extra bit of range) — i.e. the full subframe
  * surface real-world `flac(1)` output uses. Frame CRC-16 enforced.
  * The LPC/decorrelation paths are proven by hand-crafted
  * spec-conformant bitstreams (FlacCodecSpec).
  *
  * Encoder: 16-bit samples, independent channels, FIXED predictor
  * order 0–2 chosen per subframe by residual magnitude, single Rice
  * partition with a swept parameter, explicit 16-bit block size.
  */
object FlacCodec {

  // ---- bit I/O (MSB first, per spec) ----------------------------------

  private final class BitReader(data: Array[Byte], startByte: Int) {
    var pos: Int = startByte // byte position
    private var bit = 0      // bits consumed in current byte (0..7)

    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val b = (data(pos) >> (7 - bit)) & 1
        v = (v << 1) | b
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    def bitsLong(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | bits(1); i += 1 }
      v
    }
    /** Count 0-bits until the terminating 1 (FLAC unary). */
    def unary(): Int = {
      var q = 0
      while (bits(1) == 0) q += 1
      q
    }
    def alignByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
    def byteAligned: Boolean = bit == 0
  }

  private final class BitWriter {
    val out = new ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def write(v: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 }
        i -= 1
      }
    }
    def writeUnary(q: Int): Unit = { // q zeros then a one
      var i = 0
      while (i < q) { write(0, 1); i += 1 }
      write(1, 1)
    }
    def alignByte(): Unit = if (n > 0) write(0, 8 - n)
    def toBytes: Array[Byte] = { alignByte(); out.toByteArray }
  }

  // ---- CRCs (spec polynomials) ----------------------------------------

  /** CRC-8, poly x⁸+x²+x+1 (0x07), init 0 — frame header check. */
  private[graft] def crc8(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= data(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
          else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly x¹⁶+x¹⁵+x²+1 (0x8005), init 0 — whole-frame check. */
  private[graft] def crc16(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (data(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ---- fixed predictors ------------------------------------------------

  /** Residual of FIXED order `o` at position i (i ≥ o). */
  private def residual(s: Array[Int], i: Int, o: Int): Int = o match {
    case 0 => s(i)
    case 1 => s(i) - s(i - 1)
    case 2 => s(i) - 2 * s(i - 1) + s(i - 2)
    case 3 => s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3)
    case 4 => s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) + s(i - 4)
  }

  /** In-place restore: s currently holds residuals from index o on. */
  private def restore(s: Array[Int], o: Int): Unit = {
    var i = o
    while (i < s.length) {
      o match {
        case 0 =>
        case 1 => s(i) += s(i - 1)
        case 2 => s(i) += 2 * s(i - 1) - s(i - 2)
        case 3 => s(i) += 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3)
        case 4 => s(i) += 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
      }
      i += 1
    }
  }

  private def zigzag(e: Int): Long = ((e.toLong << 1) ^ (e.toLong >> 63))
  private def unzigzag(u: Long): Int = ((u >>> 1) ^ -(u & 1L)).toInt

  // ---- encoder ---------------------------------------------------------

  /** Encode 16-bit interleaved samples as a FLAC stream. */
  def encode(a: Audio, blockSize: Int = 4096): Array[Byte] = {
    val ch = a.channels
    require(ch >= 1 && ch <= 8, "1-8 channels")
    val nPerCh = a.samples.length / ch
    require(nPerCh > 0, "empty input")
    require(nPerCh * ch == a.samples.length, "ragged interleave")
    val out = new ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (is_last=1, type=0, len=34)
    val si = new BitWriter
    si.write(blockSize.toLong, 16); si.write(blockSize.toLong, 16)
    si.write(0L, 24); si.write(0L, 24) // frame sizes unknown
    si.write(a.sampleRate.toLong, 20)
    si.write((ch - 1).toLong, 3)
    si.write(15L, 5) // bits-per-sample - 1 = 15
    si.write(nPerCh.toLong, 36)
    var i = 0
    while (i < 16) { si.write(0L, 8); i += 1 } // md5 unset
    val siBytes = si.toBytes
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(siBytes)

    var frameIdx = 0L
    var off = 0
    while (off < nPerCh) {
      val bs = math.min(blockSize, nPerCh - off)
      val w = new BitWriter
      // frame header: sync(14)=0x3ffe, reserved(1)=0, fixed blocking(1)=0
      w.write(0x3ffeL, 14); w.write(0L, 1); w.write(0L, 1)
      w.write(0x7L, 4)  // block size: 16-bit value - 1 at header end
      w.write(0x0L, 4)  // sample rate: from STREAMINFO
      w.write((ch - 1).toLong, 4) // independent channels
      w.write(0x4L, 3)  // sample size: 16 bits
      w.write(0L, 1)    // reserved
      writeUtf8Coded(w, frameIdx)
      w.write((bs - 1).toLong, 16)
      val headBytes = w.toBytes // byte-aligned already (utf8+16 bits end aligned? not necessarily)
      // header fields above total 14+1+1+4+4+4+3+1 = 32 bits + utf8
      // bytes + 16 bits — always whole bytes, so toBytes adds nothing
      val crcH = crc8(headBytes, 0, headBytes.length)
      val w2 = new BitWriter
      headBytes.foreach(b => w2.write((b & 0xff).toLong, 8))
      w2.write(crcH.toLong, 8)
      // subframes: per channel, FIXED order 0..2 by residual magnitude
      var c = 0
      while (c < ch) {
        val s = new Array[Int](bs)
        var j = 0
        while (j < bs) { s(j) = a.samples((off + j) * ch + c); j += 1 }
        var bestO = 0; var bestCost = Long.MaxValue
        var o = 0
        while (o <= math.min(2, bs - 1)) {
          var cost = 0L; var j2 = o
          while (j2 < bs) { cost += math.abs(residual(s, j2, o).toLong); j2 += 1 }
          if (cost < bestCost) { bestCost = cost; bestO = o }
          o += 1
        }
        w2.write(0L, 1)                    // padding bit
        w2.write((8 + bestO).toLong, 6)    // FIXED(order)
        w2.write(0L, 1)                    // no wasted bits
        var j3 = 0
        while (j3 < bestO) { w2.write((s(j3) & 0xffff).toLong, 16); j3 += 1 }
        // residuals, Rice method 0 (4-bit params), partition order 0
        val res = new Array[Int](bs - bestO)
        j3 = bestO
        while (j3 < bs) { res(j3 - bestO) = residual(s, j3, bestO); j3 += 1 }
        val k = bestRiceParam(res)
        w2.write(0L, 2)  // coding method: 4-bit Rice
        w2.write(0L, 4)  // partition order 0
        w2.write(k.toLong, 4)
        var j4 = 0
        while (j4 < res.length) {
          val u = zigzag(res(j4))
          w2.writeUnary((u >>> k).toInt)
          if (k > 0) w2.write(u & ((1L << k) - 1), k)
          j4 += 1
        }
        c += 1
      }
      w2.alignByte()
      val frameBytes = w2.toBytes
      val crcF = crc16(frameBytes, 0, frameBytes.length)
      out.write(frameBytes)
      out.write((crcF >> 8) & 0xff); out.write(crcF & 0xff)
      off += bs
      frameIdx += 1
    }
    out.toByteArray
  }

  /** Pick the 4-bit Rice parameter with the smallest coded size. */
  private def bestRiceParam(res: Array[Int]): Int = {
    var bestK = 0; var bestBits = Long.MaxValue
    var k = 0
    while (k <= 14) {
      var total = 0L; var i = 0
      while (i < res.length) {
        total += (zigzag(res(i)) >>> k) + 1 + k
        i += 1
      }
      if (total < bestBits) { bestBits = total; bestK = k }
      k += 1
    }
    bestK
  }

  /** FLAC's UTF-8-style coded number (frame index). */
  private def writeUtf8Coded(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) w.write(v, 8)
    else if (v < 0x800) {
      w.write(0xc0L | (v >>> 6), 8); w.write(0x80L | (v & 0x3f), 8)
    } else if (v < 0x10000) {
      w.write(0xe0L | (v >>> 12), 8)
      w.write(0x80L | ((v >>> 6) & 0x3f), 8)
      w.write(0x80L | (v & 0x3f), 8)
    } else {
      w.write(0xf0L | (v >>> 18), 8)
      w.write(0x80L | ((v >>> 12) & 0x3f), 8)
      w.write(0x80L | ((v >>> 6) & 0x3f), 8)
      w.write(0x80L | (v & 0x3f), 8)
    }
  }

  private def readUtf8Coded(r: BitReader): Long = {
    val b0 = r.bits(8)
    var extra = 0
    var v = 0L
    if ((b0 & 0x80) == 0) return b0.toLong
    else if ((b0 & 0xe0) == 0xc0) { extra = 1; v = b0 & 0x1f }
    else if ((b0 & 0xf0) == 0xe0) { extra = 2; v = b0 & 0x0f }
    else if ((b0 & 0xf8) == 0xf0) { extra = 3; v = b0 & 0x07 }
    else if ((b0 & 0xfc) == 0xf8) { extra = 4; v = b0 & 0x03 }
    else if ((b0 & 0xfe) == 0xfc) { extra = 5; v = b0 & 0x01 }
    else if (b0 == 0xfe) { extra = 6; v = 0 }
    else throw new IllegalArgumentException("bad coded number")
    var i = 0
    while (i < extra) { v = (v << 6) | (r.bits(8) & 0x3f); i += 1 }
    v
  }

  // ---- decoder ---------------------------------------------------------

  private val BlockSizes = Array(0, 192, 576, 1152, 2304, 4608, -8, -16,
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768)
  private val SampleSizes = Array(0, 8, 12, -1, 16, 20, 24, 32)

  def decode(bytes: Array[Byte]): Audio =
    try decodeImpl(bytes)
    catch {
      // a corrupt stream can desynchronize the Rice decoder and walk
      // the bit reader off the buffer before any CRC is reached —
      // surface that as the same clean error class as a CRC mismatch
      case _: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException(
          "truncated or corrupt FLAC stream (bit reader ran past end)")
    }

  private def decodeImpl(bytes: Array[Byte]): Audio = {
    require(bytes.length > 8 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C', "not a FLAC stream")
    var pos = 4
    var sampleRate = -1; var channels = -1; var bps = -1
    var totalSamples = -1L
    // metadata block walk
    var last = false
    while (!last) {
      val hdr = bytes(pos) & 0xff
      last = (hdr & 0x80) != 0
      val typ = hdr & 0x7f
      val len = ((bytes(pos + 1) & 0xff) << 16) |
        ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      if (typ == 0) { // STREAMINFO
        val r = new BitReader(bytes, pos + 4)
        r.bits(16); r.bits(16); r.bits(24); r.bits(24)
        sampleRate = r.bits(20)
        channels = r.bits(3) + 1
        bps = r.bits(5) + 1
        totalSamples = r.bitsLong(36)
      }
      pos += 4 + len
    }
    require(sampleRate > 0 && channels > 0, "missing STREAMINFO")
    require(bps == 8 || bps == 12 || bps == 16 || bps == 20 || bps == 24,
      s"unsupported bits-per-sample $bps")

    val outPerCh = scala.collection.mutable.ArrayBuffer
      .empty[Array[Array[Int]]]
    var decoded = 0L
    while (pos + 2 < bytes.length &&
      (totalSamples <= 0 || decoded < totalSamples)) {
      val frameStart = pos
      val r = new BitReader(bytes, pos)
      val sync = r.bits(14)
      require(sync == 0x3ffe, f"lost frame sync at $pos (got $sync%x)")
      r.bits(1) // reserved
      r.bits(1) // blocking strategy
      val bsCode = r.bits(4)
      val srCode = r.bits(4)
      val chAsgn = r.bits(4)
      val ssCode = r.bits(3)
      r.bits(1) // reserved
      // 0-7: independent; 8 left/side, 9 right/side, 10 mid/side
      // (stereo decorrelation, reconstructed after subframe decode)
      require(chAsgn < 8 || (chAsgn <= 10 && channels == 2),
        s"bad channel assignment $chAsgn for $channels channels")
      require(chAsgn >= 8 || chAsgn + 1 == channels,
        "channel count mismatch")
      readUtf8Coded(r)
      val blockSize = bsCode match {
        case 6 => r.bits(8) + 1
        case 7 => r.bits(16) + 1
        case c if BlockSizes(c) > 0 => BlockSizes(c)
        case c => throw new IllegalArgumentException(s"bad blocksize code $c")
      }
      srCode match {
        case 12 => r.bits(8)
        case 13 | 14 => r.bits(16)
        case _ =>
      }
      val frameBps = if (ssCode == 0) bps else SampleSizes(ssCode)
      require(frameBps == bps, "per-frame sample size mismatch")
      // CRC-8 over the header bytes
      val headerEnd = r.pos
      val expectedCrc8 = r.bits(8)
      require(crc8(bytes, frameStart, headerEnd) == expectedCrc8,
        "frame header CRC-8 mismatch")
      // subframes
      val chans = new Array[Array[Int]](channels)
      var c = 0
      while (c < channels) {
        require(r.bits(1) == 0, "subframe padding bit must be 0")
        val typ = r.bits(6)
        val wastedFlag = r.bits(1)
        val wasted = if (wastedFlag == 1) r.unary() + 1 else 0
        // the SIDE channel of a decorrelated pair carries one extra
        // bit of range (L−R spans 17 bits for 16-bit input)
        val sideBit = chAsgn match {
          case 8 | 10 => if (c == 1) 1 else 0
          case 9 => if (c == 0) 1 else 0
          case _ => 0
        }
        val eff = bps - wasted + sideBit
        val s = new Array[Int](blockSize)
        if (typ == 0) { // CONSTANT
          val v = signExtend(r.bitsLong(eff), eff)
          java.util.Arrays.fill(s, v)
        } else if (typ == 1) { // VERBATIM
          var j = 0
          while (j < blockSize) {
            s(j) = signExtend(r.bitsLong(eff), eff); j += 1
          }
        } else if (typ >= 8 && typ <= 12) { // FIXED(order)
          val order = typ - 8
          var j = 0
          while (j < order) { s(j) = signExtend(r.bitsLong(eff), eff); j += 1 }
          readResiduals(r, s, order, blockSize)
          restore(s, order)
        } else if (typ >= 32) { // LPC(order), order = (typ & 31) + 1
          val order = (typ & 31) + 1
          var j = 0
          while (j < order) { s(j) = signExtend(r.bitsLong(eff), eff); j += 1 }
          val precision = r.bits(4) + 1
          require(precision <= 15, "invalid LPC coefficient precision 16")
          val shift = signExtend(r.bitsLong(5), 5)
          require(shift >= 0, s"negative LPC shift $shift")
          val coefs = new Array[Int](order)
          j = 0
          while (j < order) {
            coefs(j) = signExtend(r.bitsLong(precision), precision); j += 1
          }
          readResiduals(r, s, order, blockSize)
          // x[i] = (Σ c_j · x[i−1−j]) >> shift, + residual — 64-bit
          // accumulation per the spec's reference decoder
          var i2 = order
          while (i2 < blockSize) {
            var acc = 0L
            var k = 0
            while (k < order) { acc += coefs(k).toLong * s(i2 - 1 - k); k += 1 }
            s(i2) = s(i2) + (acc >> shift).toInt
            i2 += 1
          }
        } else throw new IllegalArgumentException(s"bad subframe type $typ")
        if (wasted > 0) {
          var j = 0
          while (j < blockSize) { s(j) = s(j) << wasted; j += 1 }
        }
        chans(c) = s
        c += 1
      }
      r.alignByte()
      val expectedCrc16 = r.bits(16)
      require(crc16(bytes, frameStart, r.pos - 2) == expectedCrc16,
        "frame CRC-16 mismatch")
      // undo stereo decorrelation (in place, chans -> L/R)
      if (chAsgn == 8) { // left/side: R = L − S
        val l = chans(0); val sd = chans(1)
        var j = 0
        while (j < blockSize) { sd(j) = l(j) - sd(j); j += 1 }
      } else if (chAsgn == 9) { // right/side: L = R + S (ch0 was side)
        val sd = chans(0); val rr = chans(1)
        var j = 0
        while (j < blockSize) { sd(j) = rr(j) + sd(j); j += 1 }
      } else if (chAsgn == 10) { // mid/side
        val m = chans(0); val sd = chans(1)
        var j = 0
        while (j < blockSize) {
          val side = sd(j)
          val mid = (m(j) << 1) | (side & 1)
          m(j) = (mid + side) >> 1
          sd(j) = (mid - side) >> 1
          j += 1
        }
      }
      pos = r.pos
      outPerCh += chans
      decoded += blockSize
    }
    // interleave
    val total = outPerCh.iterator.map(_(0).length.toLong).sum
    val samples = new Array[Short]((total * channels).toInt)
    var w = 0
    outPerCh.foreach { chans =>
      var j = 0
      while (j < chans(0).length) {
        var c = 0
        while (c < channels) { samples(w) = chans(c)(j).toShort; w += 1; c += 1 }
        j += 1
      }
    }
    Audio(sampleRate, channels, samples)
  }

  private def signExtend(v: Long, bits: Int): Int = {
    val shift = 64 - bits
    ((v << shift) >> shift).toInt
  }

  private def readResiduals(r: BitReader, s: Array[Int], order: Int,
      blockSize: Int): Unit = {
    val method = r.bits(2)
    require(method == 0 || method == 1, s"bad residual method $method")
    val paramBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 15 else 31
    val partOrder = r.bits(4)
    val parts = 1 << partOrder
    require(blockSize % parts == 0, "partition count must divide blocksize")
    var p = 0
    var idx = order
    while (p < parts) {
      val count = blockSize / parts - (if (p == 0) order else 0)
      val k = r.bits(paramBits)
      if (k == escape) {
        val raw = r.bits(5)
        var j = 0
        while (j < count) {
          s(idx) = if (raw == 0) 0 else signExtend(r.bitsLong(raw), raw)
          idx += 1; j += 1
        }
      } else {
        var j = 0
        while (j < count) {
          val q = r.unary().toLong
          val u = (q << k) | (if (k > 0) r.bitsLong(k) else 0L)
          s(idx) = unzigzag(u)
          idx += 1; j += 1
        }
      }
      p += 1
    }
  }
}
