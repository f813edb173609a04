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
}
