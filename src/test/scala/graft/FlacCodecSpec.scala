package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{FlacCodec, MediaCodecs}
import graft.operators.MediaCodecs.Audio

/** FLAC is LOSSLESS: every roundtrip assertion here is exact sample
  * equality — the strongest codec contract in the repo. Any asymmetry
  * in the Rice coder, the fixed predictors, the bit I/O, or the CRCs
  * fails these tests immediately. */
class FlacCodecSpec extends AnyFunSuite {

  private def roundtrip(a: Audio, blockSize: Int = 4096): Audio = {
    val flac = FlacCodec.encode(a, blockSize)
    assert(MediaCodecs.sniff(flac).contains("flac"))
    FlacCodec.decode(flac)
  }

  test("sine wave roundtrips bit-exactly (order-2 predictor territory)") {
    val samples = Array.tabulate[Short](10000)(i =>
      (math.sin(i * 0.01) * 20000).toShort)
    val dec = roundtrip(Audio(44100, 1, samples))
    assert(dec.sampleRate == 44100 && dec.channels == 1)
    assert(dec.samples.sameElements(samples))
  }

  test("white noise roundtrips bit-exactly (order-0 territory)") {
    val rnd = new scala.util.Random(23)
    val samples = Array.fill[Short](5000)(
      (rnd.nextInt(65536) - 32768).toShort)
    assert(roundtrip(Audio(8000, 1, samples)).samples.sameElements(samples))
  }

  test("constant and ramp signals roundtrip bit-exactly") {
    val const = Array.fill[Short](4096)(1234.toShort)
    assert(roundtrip(Audio(8000, 1, const)).samples.sameElements(const))
    val ramp = Array.tabulate[Short](4096)(i => (i - 2048).toShort)
    assert(roundtrip(Audio(8000, 1, ramp)).samples.sameElements(ramp))
  }

  test("extreme values and short blocks roundtrip bit-exactly") {
    val edge = Array[Short](Short.MinValue, Short.MaxValue, 0, -1, 1,
      Short.MinValue, Short.MaxValue)
    assert(roundtrip(Audio(8000, 1, edge)).samples.sameElements(edge))
  }

  test("stereo interleave roundtrips bit-exactly across frame splits") {
    val perCh = 5000 // > one 4096 block -> exercises multi-frame
    val inter = new Array[Short](perCh * 2)
    for (i <- 0 until perCh) {
      inter(i * 2) = (math.sin(i * 0.05) * 15000).toShort
      inter(i * 2 + 1) = ((i * 37) % 9000 - 4500).toShort
    }
    val dec = roundtrip(Audio(16000, 2, inter))
    assert(dec.channels == 2)
    assert(dec.samples.sameElements(inter))
  }

  test("small block sizes force many frames; still exact") {
    val samples = Array.tabulate[Short](1000)(i => (i * 13 % 3000).toShort)
    assert(roundtrip(Audio(8000, 1, samples), blockSize = 192)
      .samples.sameElements(samples))
  }

  test("compression actually compresses a smooth signal") {
    val samples = Array.tabulate[Short](8192)(i =>
      (math.sin(i * 0.01) * 20000).toShort)
    val flac = FlacCodec.encode(Audio(8000, 1, samples))
    assert(flac.length < samples.length * 2,
      s"flac ${flac.length} bytes vs raw ${samples.length * 2}")
  }

  test("corrupted frame data fails the CRC check, not silently") {
    val samples = Array.tabulate[Short](512)(i => (i * 7).toShort)
    val flac = FlacCodec.encode(Audio(8000, 1, samples))
    // flip a bit in the back half (inside the frame payload)
    flac(flac.length - 10) = (flac(flac.length - 10) ^ 0x10).toByte
    intercept[IllegalArgumentException](FlacCodec.decode(flac))
  }

  test("decodeAudio routes FLAC next to WAV") {
    val samples = Array.tabulate[Short](256)(i => (i * 11).toShort)
    val Some((fmt, dec)) =
      MediaCodecs.decodeAudio(FlacCodec.encode(Audio(8000, 1, samples)))
    assert(fmt == "flac" && dec.samples.sameElements(samples))
  }

  test("CRC-8 and CRC-16 match published check values") {
    // standard check: CRC-8/ATM("123456789") = 0xF4, CRC-16/ARC family
    // with poly 0x8005 no-reflect init 0 ("CRC-16/BUYPASS") = 0xFEE8
    val data = "123456789".getBytes("US-ASCII")
    assert(FlacCodec.crc8(data, 0, data.length) == 0xf4)
    assert(FlacCodec.crc16(data, 0, data.length) == 0xfee8)
  }

  // ---- crafted wild-feature frames: LPC + stereo decorrelation ------
  // The repo encoder emits only FIXED/independent subframes, so the
  // LPC and left/side//mid/side DECODE paths (what real-world flac(1)
  // output uses) are exercised by hand-crafted spec-conformant
  // bitstreams: every field written at its published width, CRC-8 and
  // CRC-16 computed for real.

  private final class Bw {
    private val out = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0; private var n = 0
    def write(v: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        n += 1
        if (n == 8) { out += cur.toByte; cur = 0; n = 0 }
        i -= 1
      }
    }
    def align(): Unit = if (n > 0) write(0, 8 - n)
    def bytes: Array[Byte] = { require(n == 0, "unaligned"); out.toArray }
    def size: Int = { require(n == 0, "unaligned"); out.length }
  }

  /** fLaC magic + last-block STREAMINFO for (sr, 2ch, 16-bit, total). */
  private def streamInfo(w: Bw, sr: Int, total: Int): Unit = {
    "fLaC".foreach(c => w.write(c.toLong, 8))
    w.write(0x80, 8); w.write(34, 24) // last=1, type=0, len=34
    w.write(8, 16); w.write(8, 16)    // min/max blocksize
    w.write(0, 24); w.write(0, 24)    // min/max framesize
    w.write(sr, 20); w.write(1, 3); w.write(15, 5) // 2ch, 16-bit
    w.write(total, 36)
    (0 until 16).foreach(_ => w.write(0, 8)) // md5 (unchecked)
  }

  /** Frame header for blockSize=8, srCode=0, ssCode=0, frame#0,
    * with a real CRC-8 over its bytes. */
  private def frameHeader(w: Bw, chAsgn: Int): Int = {
    val start = w.size
    w.write(0x3ffe, 14); w.write(0, 1); w.write(0, 1)
    w.write(6, 4)       // bsCode 6: 8-bit blocksize-1 follows
    w.write(0, 4)       // srCode 0: from STREAMINFO
    w.write(chAsgn, 4)
    w.write(0, 3); w.write(0, 1)
    w.write(0, 8)       // UTF-8-coded frame number 0
    w.write(7, 8)       // blockSize-1
    val hdr = w.bytes
    w.write(FlacCodec.crc8(hdr, start, hdr.length), 8)
    start
  }

  private def finishFrame(w: Bw, start: Int): Unit = {
    w.align()
    val all = w.bytes
    w.write(FlacCodec.crc16(all, start, all.length), 16)
  }

  test("mid/side frame with an LPC side subframe decodes to the " +
      "exact L/R it encodes") {
    val L = Array(100, 200, -50, 32767, -32768, 0, 5, -5)
    val R = Array(90, 210, -60, 32760, -32768, 1, 5, -6)
    val side = L.zip(R).map { case (l, r) => l - r }
    val mid = L.zip(R).map { case (l, r) => (l + r) >> 1 }
    val w = new Bw
    streamInfo(w, 8000, 8)
    val start = frameHeader(w, 10) // mid/side
    // subframe 0 (mid, 16-bit): VERBATIM
    w.write(0, 1); w.write(1, 6); w.write(0, 1)
    mid.foreach(m => w.write(m.toLong & 0xffff, 16))
    // subframe 1 (side, 17-bit): LPC order 1, c0=1, shift 0 ==
    // side[i] = side[i-1] + res[i]
    w.write(0, 1); w.write(32, 6); w.write(0, 1)
    w.write(side(0).toLong & 0x1ffff, 17)   // warmup
    w.write(3, 4)                           // precision-1 -> 4 bits
    w.write(0, 5)                           // shift
    w.write(1, 4)                           // c0 = 1
    w.write(0, 2); w.write(0, 4)            // rice method 0, partOrder 0
    w.write(2, 4)                           // rice k = 2
    (1 until 8).foreach { i =>
      val v = side(i) - side(i - 1)
      val u = if (v >= 0) 2L * v else -2L * v - 1
      val q = (u >>> 2).toInt
      (0 until q).foreach(_ => w.write(0, 1))
      w.write(1, 1)
      w.write(u & 3, 2)
    }
    finishFrame(w, start)
    val a = FlacCodec.decode(w.bytes)
    assert(a.sampleRate == 8000 && a.channels == 2)
    val got = a.samples.map(_.toInt)
    assert(got.grouped(2).map(_(0)).toSeq == L.toSeq)
    assert(got.grouped(2).map(_(1)).toSeq == R.toSeq)
  }

  test("left/side frame with CONSTANT subframes reconstructs R = L - S") {
    val w = new Bw
    streamInfo(w, 8000, 8)
    val start = frameHeader(w, 8) // left/side
    w.write(0, 1); w.write(0, 6); w.write(0, 1)
    w.write(1000L & 0xffff, 16)           // L constant
    w.write(0, 1); w.write(0, 6); w.write(0, 1)
    w.write(25L & 0x1ffff, 17)            // S constant (17-bit side)
    finishFrame(w, start)
    val a = FlacCodec.decode(w.bytes)
    val got = a.samples.map(_.toInt).grouped(2).toSeq
    assert(got.forall(p => p(0) == 1000 && p(1) == 975))
  }

  test("right/side frame reconstructs L = R + S with the side extra " +
      "bit on channel 0") {
    val w = new Bw
    streamInfo(w, 8000, 8)
    val start = frameHeader(w, 9) // right/side: ch0 = side, ch1 = right
    w.write(0, 1); w.write(0, 6); w.write(0, 1)
    w.write(-40000L & 0x1ffff, 17)        // S constant, needs 17 bits
    w.write(0, 1); w.write(0, 6); w.write(0, 1)
    w.write(20000L & 0xffff, 16)          // R constant
    finishFrame(w, start)
    val a = FlacCodec.decode(w.bytes)
    val got = a.samples.map(_.toInt).grouped(2).toSeq
    // L = R + S = 20000 - 40000 = -20000
    assert(got.forall(p => p(0) == -20000 && p(1) == 20000))
  }
}
