package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{JpegCodec, MediaCodecs}

/** Wild-bitstream interop (COVERAGE.md "Interop boundary"): the three
  * committed image fixtures are REAL files produced by standard
  * encoders outside this repo. The decoders must handle them — full
  * pixel reconstruction where the format is in-set, a clean refusal
  * (never a wrong answer, never a crash) where it is not. */
class WildFixturesSpec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    try in.readAllBytes() finally in.close()
  }

  test("a real-world baseline JPEG decodes fully — arbitrary DHT " +
      "tables, not just our encoder's canonical ones") {
    val img = JpegCodec.decode(res("wild_baseline.jpg"))
    assert(img.width == 161 && img.height == 161)
    var sum = 0L; var i = 0
    while (i < img.rgb.length) { sum += (img.rgb(i) & 0xff); i += 1 }
    // exact: one wrong Huffman step or IDCT coefficient anywhere in
    // 26k pixels moves this
    assert(img.rgb.length == 77763 && sum == 16762233L)
  }

  test("a real-world RGBA PNG decodes (inflate + de-filter + alpha " +
      "drop); palette/gray types covered by the same path") {
    val Some(("png", img)) = MediaCodecs.decodeImage(res("wild_rgba.png"))
    assert(img.width == 16 && img.height == 16)
    var sum = 0L; var i = 0
    while (i < img.rgb.length) { sum += (img.rgb(i) & 0xff); i += 1 }
    assert(sum == 123194L)
  }

  test("wild grayscale, gray+alpha, and palette PNGs decode — sums " +
      "matching an independent filter-reconstruction oracle") {
    // oracle sums computed by a separate pure-python PNG decoder
    // (zlib + the five filters) over the same bytes
    for ((name, w, h, sum) <- Seq(
        ("wild_gray.png", 11, 11, 78483L),
        ("wild_grayalpha.png", 48, 48, 955113L),
        ("wild_palette.png", 48, 48, 1025981L))) {
      val Some(("png", img)) = MediaCodecs.decodeImage(res(name))
      assert(img.width == w && img.height == h, name)
      var s = 0L; var i = 0
      while (i < img.rgb.length) { s += (img.rgb(i) & 0xff); i += 1 }
      assert(s == sum, s"$name: got $s")
    }
  }

  test("a real stereo PCM-16 WAV (CPython test corpus) decodes " +
      "bit-exactly through the RIFF chunk walk") {
    val Some(("wav", a)) = MediaCodecs.decodeAudio(res("wild_stereo.wav"))
    assert(a.sampleRate == 11025 && a.channels == 2)
    assert(a.samples.length == 6614)
    assert(a.samples.map(_.toLong).sum == -463547L)
  }

  test("the same wild recording decodes from AIFF (80-bit extended " +
      "rate, ancillary chunks) and Sun AU, sums matching an " +
      "independent reference decoder") {
    // oracle constants produced by CPython's aifc/sunau/audioop
    // readers over the same files — a decoder this repo did not write
    val Some(("aiff", a)) = MediaCodecs.decodeAudio(res("wild_stereo.aiff"))
    assert(a.sampleRate == 11025 && a.channels == 2 &&
      a.samples.length == 6614)
    assert(a.samples.map(_.toLong).sum == -463555L)
    val Some(("au", u)) = MediaCodecs.decodeAudio(res("wild_stereo.au"))
    assert(u.samples.length == 6614 &&
      u.samples.map(_.toLong).sum == -463537L)
    // G.711 mu-law AU: our companding table agrees with audioop's
    val Some(("au", ul)) = MediaCodecs.decodeAudio(res("wild_ulaw.au"))
    assert(ul.samples.map(_.toLong).sum == -469976L)
  }

  test("wild 8/24/32-bit PCM WAVs decode with the standard 16-bit " +
      "narrowing, sums matching an independent reference") {
    // same recording at three more depths (CPython corpus); expected
    // sums computed by python's wave reader + the identical narrowing
    for ((name, sum) <- Seq(("wild_pcm8.wav", -1314304L),
        ("wild_pcm24.wav", -466871L), ("wild_pcm32.wav", -466871L))) {
      val Some(("wav", a)) = MediaCodecs.decodeAudio(res(name))
      assert(a.sampleRate == 11025 && a.channels == 2 &&
        a.samples.length == 6614, name)
      assert(a.samples.map(_.toLong).sum == sum, name)
    }
  }

  test("progressive JPEG refuses loudly and routes to the opaque path") {
    val bytes = res("wild_progressive.jpg")
    val ex = intercept[IllegalArgumentException](JpegCodec.decode(bytes))
    assert(ex.getMessage.contains("progressive"))
    assert(MediaCodecs.decodeImage(bytes).isEmpty)
  }
}
