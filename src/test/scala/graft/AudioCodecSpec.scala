package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MediaCodecs
import graft.operators.MediaCodecs.Audio

/** Compressed-audio WAV paths: G.711 μ-law and IMA ADPCM, validated by
  * standard-properties (μ-law code idempotence, bounded companding
  * error) and encoder/decoder roundtrips with quantization-bounded
  * error — the audio analog of JpegCodecSpec. */
class AudioCodecSpec extends AnyFunSuite {

  test("mu-law: every 8-bit code is a fixed point of encode(decode(code))") {
    // the published G.711 property: decode then re-encode returns the
    // same code (0x7f/0xff both map to 0 — accept either direction)
    for (code <- 0 until 256) {
      val lin = MediaCodecs.mulawToLinear(code)
      val back = MediaCodecs.linearToMulaw(lin)
      assert(back == code || MediaCodecs.mulawToLinear(back) == lin,
        s"code $code -> $lin -> $back")
    }
  }

  test("mu-law companding error is within one quantization step") {
    val rnd = new scala.util.Random(19)
    for (_ <- 1 to 2000) {
      val s = rnd.nextInt(65536) - 32768
      val dec = MediaCodecs.mulawToLinear(MediaCodecs.linearToMulaw(s))
      // step size at |s| is 2^(exp+3); half-step rounding plus clip
      val bound = math.max(40, math.abs(s) / 16 + 40)
      assert(math.abs(dec - s) <= bound, s"$s -> $dec")
    }
  }

  test("mu-law WAV roundtrips through decodeWav") {
    val samples = Array.tabulate[Short](500)(i =>
      (math.sin(i * 0.05) * 12000).toShort)
    val wav = MediaCodecs.encodeMulawWav(Audio(8000, 1, samples))
    assert(MediaCodecs.sniff(wav).contains("wav"))
    val dec = MediaCodecs.decodeWav(wav)
    assert(dec.sampleRate == 8000 && dec.channels == 1)
    assert(dec.samples.length == 500)
    val maxErr = samples.zip(dec.samples)
      .map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= 12000 / 16 + 40, s"max companding err $maxErr")
  }

  test("IMA ADPCM mono roundtrips a smooth signal with bounded error") {
    // blockAlign 256 mono -> 505 samples/block; two full blocks
    val n = 1010
    val samples = Array.tabulate[Short](n)(i =>
      (math.sin(i * 0.02) * 8000).toShort)
    val wav = MediaCodecs.encodeImaAdpcmWav(Audio(8000, 1, samples))
    val dec = MediaCodecs.decodeWav(wav)
    assert(dec.samples.length == n)
    val errs = samples.zip(dec.samples).map { case (a, b) => math.abs(a - b) }
    assert(errs.max < 2048, s"max adpcm err ${errs.max}")
    assert(errs.map(_.toLong).sum.toDouble / n < 64.0,
      f"mean adpcm err ${errs.map(_.toLong).sum.toDouble / n}%.1f")
  }

  test("IMA ADPCM stereo keeps channels independent and aligned") {
    val perCh = 249 // blockAlign 256 stereo -> 249 samples/ch/block
    val inter = new Array[Short](perCh * 2)
    for (i <- 0 until perCh) {
      inter(i * 2) = (math.sin(i * 0.03) * 6000).toShort        // L
      inter(i * 2 + 1) = (math.cos(i * 0.07) * 11000).toShort   // R
    }
    val wav = MediaCodecs.encodeImaAdpcmWav(Audio(16000, 2, inter))
    val dec = MediaCodecs.decodeWav(wav)
    assert(dec.channels == 2 && dec.samples.length == perCh * 2)
    for (c <- 0 until 2) {
      val src = (0 until perCh).map(i => inter(i * 2 + c))
      val got = (0 until perCh).map(i => dec.samples(i * 2 + c))
      val maxErr = src.zip(got).map { case (a, b) => math.abs(a - b) }.max
      assert(maxErr < 2048, s"channel $c max err $maxErr")
    }
  }

  test("plain PCM WAV still decodes (format dispatch intact)") {
    val samples = Array.tabulate[Short](64)(i => (i * 100).toShort)
    val dec = MediaCodecs.decodeWav(
      MediaCodecs.encodeWav(Audio(44100, 1, samples)))
    assert(dec.samples.sameElements(samples))
  }

  test("unknown WAV format tag is rejected with a clear error") {
    val wav = MediaCodecs.encodeWav(Audio(8000, 1, new Array[Short](4)))
    wav(20) = 0x55 // format tag -> 0x55 (MP3-in-WAV would be 0x55)
    val e = intercept[IllegalArgumentException](MediaCodecs.decodeWav(wav))
    assert(e.getMessage.contains("format tag"))
  }

  test("IMA ADPCM RIFF chunk size field equals file length minus 8") {
    // strict external RIFF parsers validate this; previously overstated
    // by 4 (44 + dataBytes instead of 40 + dataBytes)
    val samples = Array.tabulate[Short](505)(i =>
      (math.sin(i * 0.02) * 8000).toShort)
    val wav = MediaCodecs.encodeImaAdpcmWav(Audio(8000, 1, samples))
    val riffSize = (wav(4) & 0xff) | ((wav(5) & 0xff) << 8) |
      ((wav(6) & 0xff) << 16) | ((wav(7) & 0xff) << 24)
    assert(riffSize == wav.length - 8,
      s"RIFF size $riffSize vs file ${wav.length}")
    // mu-law encoder already had the invariant — keep it pinned too
    val mw = MediaCodecs.encodeMulawWav(Audio(8000, 1, samples.take(500)))
    val mSize = (mw(4) & 0xff) | ((mw(5) & 0xff) << 8) |
      ((mw(6) & 0xff) << 16) | ((mw(7) & 0xff) << 24)
    assert(mSize == mw.length - 8)
  }

  test("IMA ADPCM trailing partial block decodes its whole groups") {
    // Build two full blocks, then truncate the data chunk mid-final-
    // block at a whole-group boundary: header (4 B) + 3 groups (12 B).
    // Real-world IMA WAVs end short like this; the decoder must keep
    // the partial block's header sample + 3 groups × 8 nibbles.
    val n = 1010 // blockAlign 256 mono -> 505 samples/block, 2 blocks
    val samples = Array.tabulate[Short](n)(i =>
      (math.sin(i * 0.02) * 8000).toShort)
    val wav = MediaCodecs.encodeImaAdpcmWav(Audio(8000, 1, samples))
    val keepOfBlock2 = 4 + 3 * 4 // header + 3 whole 4-byte groups
    val cut = wav.length - 256 + keepOfBlock2
    val short = java.util.Arrays.copyOf(wav, cut)
    // patch RIFF + data sizes for the truncated file
    def w32(off: Int, v: Int): Unit = {
      short(off) = (v & 0xff).toByte
      short(off + 1) = ((v >> 8) & 0xff).toByte
      short(off + 2) = ((v >> 16) & 0xff).toByte
      short(off + 3) = ((v >> 24) & 0xff).toByte
    }
    w32(4, cut - 8)
    // layout: RIFF hdr 12 + "fmt "+size 8 + fmt body 20 = 40, so the
    // "data" tag sits at 40 and its size field at 44 (payload at 48)
    w32(44, 256 + keepOfBlock2)
    val dec = MediaCodecs.decodeWav(short)
    assert(dec.samples.length == 505 + 1 + 3 * 8,
      s"expected full block + partial block samples, got ${dec.samples.length}")
    // the decoded prefix must match the full decode exactly
    val full = MediaCodecs.decodeWav(wav)
    assert(dec.samples.sameElements(full.samples.take(dec.samples.length)))
  }
}
