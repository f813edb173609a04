package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaCodecs, Mp3Codec}
import graft.operators.MediaCodecs.Audio

/** MPEG-1 Layer III codec: frame-structure conformance (header fields,
  * the published bitrate/samplerate/slen tables, frame-length formula,
  * load-bearing part2_3_length) and roundtrips with quantization-
  * bounded error — the lossy-audio analog of JpegCodecSpec. */
class Mp3CodecSpec extends AnyFunSuite {

  private def sine(n: Int, amp: Double, w: Double): Array[Short] =
    Array.tabulate[Short](n)(i => (math.sin(i * w) * amp).toShort)

  test("canonical huffman tables roundtrip every symbol") {
    Mp3Codec.huffmanSelfTest()
  }

  test("constant-level granule roundtrips within a tight bound") {
    for (level <- Seq(-12000, -500, 0, 300, 8000, 30000)) {
      val src = Array.fill[Short](1152)(level.toShort)
      val dec = Mp3Codec.decode(Mp3Codec.encode(Audio(32000, 1, src)))
      assert(dec.sampleRate == 32000 && dec.channels == 1)
      assert(dec.samples.length == 1152)
      val maxErr = dec.samples.map(s => math.abs(s - level)).max
      assert(maxErr <= 2, s"level $level: max roundtrip err $maxErr")
    }
  }

  test("sine and mixed-tone signals roundtrip with bounded error") {
    val src = sine(2304, 9000, 0.07)
      .zip(sine(2304, 4000, 0.31)).map { case (a, b) => (a + b).toShort }
    val dec = Mp3Codec.decode(Mp3Codec.encode(Audio(44100, 1, src)))
    assert(dec.samples.length == 2304) // two frames, no tail pad
    val errs = src.zip(dec.samples).map { case (a, b) => math.abs(a - b) }
    // the power-law quantizer's error grows with magnitude; this bound
    // is empirical head-room over observed (~30) for a 13k-amp signal
    assert(errs.max < 256, s"max err ${errs.max}")
    assert(errs.map(_.toLong).sum.toDouble / errs.length < 32.0)
  }

  test("tail frame zero-pads to the 1152-sample frame grid") {
    val src = sine(1500, 6000, 0.05)
    val dec = Mp3Codec.decode(Mp3Codec.encode(Audio(48000, 1, src)))
    assert(dec.samples.length == 2304) // ceil(1500/1152) frames
    // the padded region decodes back to (near-)silence
    val tail = dec.samples.drop(1500 + 64) // skip block-boundary ripple
    assert(tail.forall(s => math.abs(s.toInt) <= 64),
      s"tail not silent: ${tail.map(s => math.abs(s.toInt)).max}")
  }

  test("frame header carries the published tables and the length formula") {
    val wav = Mp3Codec.encode(Audio(32000, 1, sine(1152, 12000, 0.02)))
    assert(MediaCodecs.sniff(wav).contains("mp3"))
    assert((wav(0) & 0xff) == 0xff && (wav(1) & 0xff) == 0xfb,
      "MPEG-1 Layer III no-CRC sync bytes")
    val brIdx = (wav(2) & 0xff) >> 4
    val srIdx = (wav(2) >> 2) & 3
    val pad = (wav(2) >> 1) & 1
    assert(srIdx == 2, "32 kHz is sampling_frequency index 2")
    val expectLen =
      144 * Mp3Codec.BitrateTable(brIdx) * 1000 / 32000 + pad
    assert(wav.length == expectLen,
      s"single frame must fill the formula length: ${wav.length} vs $expectLen")
    assert((wav(3) & 0xc0) == 0xc0, "mode bits say mono")
  }

  test("part2_3_length is load-bearing: corrupting it fails decode loudly") {
    val wav = Mp3Codec.encode(Audio(32000, 1, sine(1152, 12000, 0.02)))
    // granule 1 part2_3_length starts 18 bits into the side info
    // (after main_data_begin 9 + private 5 + scfsi 4) = bit 18 of byte
    // 4+2=6 onward: flip its lowest bit (bit 29 of side info = byte 7,
    // bit 5 counting from MSB)
    val bad = wav.clone()
    bad(7) = (bad(7) ^ 0x04).toByte
    val e = intercept[IllegalArgumentException](Mp3Codec.decode(bad))
    assert(e.getMessage.contains("part2_3_length"))
  }

  test("corrupting spectral bits breaks the decode contract, not silence") {
    val src = sine(1152, 10000, 0.05)
    val wav = Mp3Codec.encode(Audio(32000, 1, src))
    val clean = Mp3Codec.decode(wav).samples
    // flip a bit in the main data region (past 4-byte header + 17-byte
    // side info): either decode fails structurally (consumed-bit check)
    // or produces different samples — never a silent identical result
    val bad = wav.clone()
    bad(30) = (bad(30) ^ 0x10).toByte
    val outcome =
      try Some(Mp3Codec.decode(bad).samples)
      catch { case _: IllegalArgumentException => None }
    outcome.foreach { tampered =>
      assert(!tampered.sameElements(clean),
        "a flipped spectral bit cannot decode to identical PCM")
    }
  }

  test("structural rejects: truncation, bad rates, stereo unsupported") {
    val wav = Mp3Codec.encode(Audio(44100, 1, sine(1152, 5000, 0.1)))
    intercept[IllegalArgumentException](
      Mp3Codec.decode(wav.take(wav.length / 2)))
    intercept[IllegalArgumentException](
      Mp3Codec.encode(Audio(8000, 1, new Array[Short](16)))) // not MPEG-1
    intercept[IllegalArgumentException](
      Mp3Codec.encode(Audio(44100, 2, new Array[Short](16)))) // stereo
    intercept[IllegalArgumentException](
      Mp3Codec.decode(Array[Byte](1, 2, 3, 4)))
  }

  test("decodeAudio sniff-routes mp3 and decodeStats sees real samples") {
    val level = 2080
    val wav = Mp3Codec.encode(
      Audio(32000, 1, Array.fill[Short](1152)(level.toShort)))
    val got = MediaCodecs.decodeAudio(wav)
    assert(got.isDefined && got.get._1 == "mp3")
    val a = got.get._2
    assert(a.sampleRate == 32000 && a.samples.length == 1152)
    val mean = a.samples.map(_.toLong).sum.toDouble / a.samples.length
    assert(math.abs(mean - level) <= 2.0, s"decoded mean $mean")
  }

  // ---- wild-bitstream interop boundary (COVERAGE.md) ----------------

  private lazy val wild: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/wild_lame.mp3")
    try in.readAllBytes() finally in.close()
  }

  test("census walks a REAL LAME-encoded file end-to-end (the wild " +
      "fixture this repo did not produce)") {
    val c = Mp3Codec.census(wild)
    // Every field independently derivable from the public spec:
    // ID3v2.4 size 22 (+10 header) = 32; fff3 80 c4 -> MPEG-2 LSF
    // Layer III, idx 8 = 64 kbps, 22050 Hz, mono; LSF frame =
    // 72*64000/22050 = 209 bytes; 45 frames * 209 + 32 = 9437 vs
    // file 9436 (last frame unpadded); 45*576/22050 = 1.175 s.
    assert(c == Mp3Codec.Mp3Census("MPEG-2", 3, 22050, 1, 45, 64, 64,
      false, "none", 1175L, 32, 0, 0))
    // a clean walk: zero resyncs means every byte between the ID3
    // skip and EOF was consumed by spec-sized frames
  }

  test("census handles junk, truncation and our own MPEG-1 streams") {
    // own encoder output: census agrees with the encode parameters
    val own = Mp3Codec.encode(Audio(32000, 1,
      Array.fill[Short](1152 * 3)(1000)))
    val co = Mp3Codec.census(own)
    assert(co.version == "MPEG-1" && co.layer == 3 &&
      co.sampleRate == 32000 && co.channels == 1 && co.resyncs == 0)
    // leading junk: resync finds the frames anyway
    val jun = Array.fill[Byte](37)(0x55) ++ own
    val cj = Mp3Codec.census(jun)
    assert(cj.nFrames == co.nFrames && cj.resyncs == 1)
    // truncation mid-frame: never throws, tail counted as junk
    val ct = Mp3Codec.census(wild.dropRight(100))
    assert(ct.nFrames == 44 && ct.resyncs == 1)
    // pure garbage: no frames, no crash
    val cg = Mp3Codec.census(Array.fill[Byte](256)(0x11))
    assert(cg.nFrames == 0 && cg.version == "none")
  }

  test("VBR tag detection reads the spec offset, not a body search") {
    // MPEG-1 Layer III, 128 kbps, 44100 Hz, mono, no CRC:
    // frame = 144*128000/44100 = 417 bytes; side info (v1 mono) = 17,
    // so Xing/Info sits at exactly 4 + 17 = 21
    def frame(tag: Option[String], plantAt: Option[(Int, String)])
        : Array[Byte] = {
      val f = new Array[Byte](417)
      f(0) = 0xff.toByte; f(1) = 0xfb.toByte
      f(2) = 0x90.toByte; f(3) = 0xc0.toByte
      tag.foreach(t => System.arraycopy(
        t.getBytes("US-ASCII"), 0, f, 21, 4))
      plantAt.foreach { case (o, t) => System.arraycopy(
        t.getBytes("US-ASCII"), 0, f, o, 4) }
      f
    }
    // entropy bytes spelling "Info"/"Xing" OFF the spec offset must
    // not flip a CBR file to VBR (the false-positive the substring
    // search had)
    val cbr = Mp3Codec.census(frame(None, Some(100 -> "Info")) ++
      frame(None, Some(60 -> "Xing")))
    assert(cbr.vbrTag == "none" && !cbr.vbr)
    // the real thing at the real offset is still seen
    assert(Mp3Codec.census(frame(Some("Xing"), None)).vbrTag == "Xing")
    assert(Mp3Codec.census(frame(Some("Info"), None)).vbrTag == "Info")
    // VBRI rides offset 36 regardless of side-info size
    assert(Mp3Codec.census(
      frame(None, Some(36 -> "VBRI"))).vbrTag == "VBRI")
  }

  test("the wild LAME file DECODES to its exact samples: an encode " +
      "of digital silence (every granule p23==0) reconstructs as " +
      "25920 zeros — what any conformant decoder emits for it") {
    // this is the one wild entropy class whose samples are bit-exact
    // without ISO's tabular Huffman codes: an empty scalefactor+
    // huffman part means all-zero spectra, and zero input through ANY
    // linear filterbank is zero output (decodeWild scaladoc)
    val Some(a) = Mp3Codec.decodeWild(wild)
    assert(a.sampleRate == 22050 && a.channels == 1)
    assert(a.samples.length == 45 * 576) // 45 LSF frames x 1 granule
    assert(a.samples.forall(_ == 0))
    // and the dispatch now routes it (ID3-prefixed sniff + fallback)
    val Some(("mp3", d)) = MediaCodecs.decodeAudio(wild)
    assert(d.samples.length == 25920)
  }

  test("decodeWild refuses the moment a granule carries spectral " +
      "data — non-silent wild entropy stays census-only") {
    // a repo-canonical encode has nonzero part2_3_length: decodeWild
    // must return None (its samples need the huffman tables), while
    // the canonical decoder handles it — and the strict decoder
    // still states its version boundary on LSF streams
    val tone = Mp3Codec.encode(MediaCodecs.Audio(44100, 1,
      Array.tabulate[Short](1152)(i =>
        (3000 * math.sin(i * 0.05)).toShort)))
    assert(Mp3Codec.decodeWild(tone).isEmpty)
    assert(Mp3Codec.decode(tone).samples.length == 1152)
    val noId3 = wild.drop(32)
    val ex = intercept[IllegalArgumentException](Mp3Codec.decode(noId3))
    assert(ex.getMessage.contains("MPEG-1 only"))
    // truncated wild input: no crash, no bogus samples
    assert(Mp3Codec.decodeWild(wild.take(40)).isEmpty)
  }

  test("ID3v2 text frames extract; malformed tags never throw") {
    assert(Mp3Codec.id3TextFrames(wild) == Map("TSSE" -> "Lavf53.5.0"))
    // v2.3-style plain-size frame with a NUL-terminated latin-1 body
    val tag = Array[Byte]('I','D','3', 3, 0, 0, 0, 0, 0, 30,
      'T','I','T','2', 0, 0, 0, 10, 0, 0,
      0, 'A',' ','S','o','n','g', 0, 0, 0) ++ Array.fill[Byte](10)(0)
    assert(Mp3Codec.id3TextFrames(tag) == Map("TIT2" -> "A Song"))
    // garbage after the header: skipped, no exception
    assert(Mp3Codec.id3TextFrames(
      Array[Byte]('I','D','3', 4, 0, 0, 0, 0, 0, 5, 1, 2, 3, 4, 5)).isEmpty)
    assert(Mp3Codec.id3TextFrames(Array[Byte](1, 2, 3)).isEmpty)
  }
}
