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

  test("wild grayscale, gray+alpha, palette, and Adam7-INTERLACED " +
      "PNGs decode — sums matching an independent " +
      "filter-reconstruction oracle") {
    // oracle sums computed by a separate pure-python PNG decoder
    // (zlib + the five filters + Adam7 scatter) over the same bytes;
    // the interlaced fixture is libpng's own canonical pngtest.png
    for ((name, w, h, sum) <- Seq(
        ("wild_gray.png", 11, 11, 78483L),
        ("wild_grayalpha.png", 48, 48, 955113L),
        ("wild_palette.png", 48, 48, 1025981L),
        ("wild_interlaced.png", 91, 69, 687369L))) {
      val Some(("png", img)) = MediaCodecs.decodeImage(res(name))
      assert(img.width == w && img.height == h, name)
      var s = 0L; var i = 0
      while (i < img.rgb.length) { s += (img.rgb(i) & 0xff); i += 1 }
      assert(s == sum, s"$name: got $s")
    }
  }

  test("a wild 16-BIT RGBA PNG decodes with high-byte narrowing, " +
      "sums matching an independent filter-reconstruction oracle") {
    // a real 1052x744 depth-16 color-6 PNG shipped by GnuPG's docs
    // (/usr/share/info); oracle sums from the same pure-python
    // decoder as the 8-bit set, de-filtering at the 8-byte filter
    // distance and taking each big-endian sample's high byte
    val Some(("png", img)) = MediaCodecs.decodeImage(res("wild_16bit.png"))
    assert(img.width == 1052 && img.height == 744)
    var s = 0L; var ws = 0L; var p = 0
    while (p < img.width * img.height) {
      val r = img.rgb(p * 3) & 0xff
      val g = img.rgb(p * 3 + 1) & 0xff
      val b = img.rgb(p * 3 + 2) & 0xff
      s += r + g + b
      ws += (p + 1).toLong * (r + 2 * g + 3 * b)
      p += 1
    }
    assert(s == 569691488L, s"sum: got $s")
    assert(ws == 441898174691635L, s"weighted: got $ws")
  }

  test("wild GIFs decode — 87a, 89a, and row-interlaced — matching " +
      "an independent LZW oracle") {
    // plain sums pin the LZW + palette; the position-weighted
    // checksum additionally pins the 4-pass DE-INTERLACE (a plain
    // sum is invariant under row permutation). Oracle: a separate
    // dict-of-lists python LZW decoder over the same bytes.
    for ((name, w, h, sum, wsum) <- Seq(
        ("wild_89a.gif", 180, 68, 6050829L, 71202269689L),
        ("wild_87a.gif", 460, 497, 164879396L, 37691104258368L),
        ("wild_interlaced.gif", 100, 100, 3598720L, 28853396190L))) {
      val Some(("gif", img)) = MediaCodecs.decodeImage(res(name))
      assert(img.width == w && img.height == h, name)
      var s = 0L; var ws = 0L; var p = 0
      while (p < w * h) {
        val r = img.rgb(p * 3) & 0xff
        val g = img.rgb(p * 3 + 1) & 0xff
        val b = img.rgb(p * 3 + 2) & 0xff
        s += r + g + b
        ws += (p + 1).toLong * (r + 2 * g + 3 * b)
        p += 1
      }
      assert(s == sum, s"$name sum: got $s")
      assert(ws == wsum, s"$name weighted: got $ws")
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

  test("decompression bombs fail cleanly: corrupt headers claiming " +
      "huge dims route to the opaque path, never an OOM") {
    // JPEG: patch the wild fixture's SOF dims to 65500x65500 — the
    // 1024 pixels-per-byte plausibility bound must refuse before any
    // allocation
    val jb = res("wild_baseline.jpg").clone()
    var i = 2
    var sof = -1
    while (sof < 0 && i + 4 < jb.length) {
      if ((jb(i) & 0xff) == 0xff && (jb(i + 1) & 0xff) == 0xc0) sof = i
      else i += 1
    }
    jb(sof + 5) = 0xff.toByte; jb(sof + 6) = 0xdc.toByte // height
    jb(sof + 7) = 0xff.toByte; jb(sof + 8) = 0xdc.toByte // width
    val je = intercept[IllegalArgumentException](JpegCodec.decode(jb))
    assert(je.getMessage.contains("implausible"))
    assert(MediaCodecs.decodeImage(jb).isEmpty)

    // JPEG absolute cap: pad the file so 6000x6000 (36 Mpixels)
    // passes the 1024 pixels-per-byte ratio — only the 32 Mpixel cap
    // stands before a ~108 MB-per-plane allocation
    val jc = res("wild_baseline.jpg").clone() ++
      new Array[Byte](1 << 20)
    jc(sof + 5) = 0x17; jc(sof + 6) = 0x70 // height 6000
    jc(sof + 7) = 0x17; jc(sof + 8) = 0x70 // width  6000
    val jce = intercept[IllegalArgumentException](JpegCodec.decode(jc))
    assert(jce.getMessage.contains("pixel cap"))
    assert(MediaCodecs.decodeImage(jc).isEmpty)

    // PNG: patch IHDR dims to 100000x100000 (way past deflate's
    // 1032:1 expansion bound for a 286-byte file)
    val pb = res("wild_rgba.png").clone()
    val big = 100000
    for ((b, k) <- Seq((big >> 24, 0), (big >> 16, 1), (big >> 8, 2),
        (big, 3))) {
      pb(16 + k) = (b & 0xff).toByte; pb(20 + k) = (b & 0xff).toByte
    }
    val pe = intercept[IllegalArgumentException](
      MediaCodecs.decodePng(pb))
    assert(pe.getMessage.contains("implausible"))
    assert(MediaCodecs.decodeImage(pb).isEmpty)

    // AIFF: a COMM frame count of 2^30 on a tiny file allocates only
    // what the SSND bytes can actually hold
    val ab = res("wild_stereo.aiff").clone()
    // COMM chunk starts at offset 12; frames field at body+2
    ab(12 + 8 + 2) = 0x40.toByte; ab(12 + 8 + 3) = 0; ab(12 + 8 + 4) = 0
    ab(12 + 8 + 5) = 0
    val a = MediaCodecs.decodeAiff(ab)
    assert(a.samples.length == 6614) // bounded by bytes present
  }

  test("hostile size fields clamp or refuse before allocating: WAV " +
      "dataSize near 2^31, GIF dims inside the LZW ratio") {
    def patchDataSize(wav: Array[Byte]): Array[Byte] = {
      var d = 12
      while (!(wav(d) == 'd' && wav(d + 1) == 'a' && wav(d + 2) == 't' &&
        wav(d + 3) == 'a')) d += 1
      val p = wav.clone()
      p(d + 4) = 0xf0.toByte; p(d + 5) = 0xff.toByte
      p(d + 6) = 0xff.toByte; p(d + 7) = 0x7f.toByte
      p
    }
    // PCM path: the claimed size must clamp to bytes present
    val pcm = MediaCodecs.encodeWav(MediaCodecs.Audio(8000, 1,
      Array.tabulate[Short](300)(i => (i * 7).toShort)))
    assert(MediaCodecs.decodeWav(patchDataSize(pcm)).samples.length == 300)
    // mu-law path sizes its array straight off dataSize too
    val ml = MediaCodecs.encodeMulawWav(MediaCodecs.Audio(8000, 1,
      Array.fill[Short](200)(1000)))
    assert(MediaCodecs.decodeWav(patchDataSize(ml)).samples.length == 200)

    // GIF: 40000x40000 on a 400 KB file passes the 4096-pixels-per-
    // byte LZW expansion ratio, so only the absolute pixel cap
    // stands between the header and a ~2 GiB index allocation
    val gif = new Array[Byte](400000)
    val hdr = "GIF89a".getBytes("US-ASCII")
    System.arraycopy(hdr, 0, gif, 0, 6)
    gif(6) = 1; gif(8) = 1          // 1x1 canvas
    gif(10) = 0x80.toByte           // GCT present, 2 entries (6 bytes)
    // GCT occupies 13..18; image descriptor follows
    gif(19) = 0x2c
    gif(24) = 0x40; gif(25) = 0x9c.toByte // width  40000 LE
    gif(26) = 0x40; gif(27) = 0x9c.toByte // height 40000 LE
    val ge = intercept[IllegalArgumentException](
      MediaCodecs.decodeGif(gif))
    assert(ge.getMessage.contains("pixel cap"))
    assert(MediaCodecs.decodeImage(gif).isEmpty)
  }

  /** Decode `name` with BOTH this repo's decoder and the JDK's native
    * ImageIO JPEG reader (an independent implementation shipped with
    * the JVM), assert per-pixel agreement within `tol` (JPEG decoders
    * legitimately differ by a few codes: integer vs double IDCT,
    * chroma upsampling filter), and pin this decoder's exact sums so
    * any regression moves a constant. */
  private def progressiveCase(name: String, w: Int, h: Int, tol: Int,
      meanTol: Double, sum: Long, wsum: Long): Unit = {
    val bytes = res(name)
    val Some(("jpeg", img)) = MediaCodecs.decodeImage(bytes)
    assert(img.width == w && img.height == h, name)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(ref.getWidth == w && ref.getHeight == h, s"$name oracle dims")
    var s = 0L; var ws = 0L; var maxDiff = 0; var sumDiff = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = y * w + x
        val r = img.rgb(p * 3) & 0xff
        val g = img.rgb(p * 3 + 1) & 0xff
        val b = img.rgb(p * 3 + 2) & 0xff
        s += r + g + b
        ws += (p + 1).toLong * (r + 2 * g + 3 * b)
        val rp = ref.getRGB(x, y)
        val dr = math.abs(r - ((rp >> 16) & 0xff))
        val dg = math.abs(g - ((rp >> 8) & 0xff))
        val db = math.abs(b - (rp & 0xff))
        maxDiff = math.max(maxDiff, math.max(dr, math.max(dg, db)))
        sumDiff += dr + dg + db
        x += 1
      }
      y += 1
    }
    val meanDiff = sumDiff.toDouble / (w * h * 3)
    assert(maxDiff <= tol, s"$name: max per-channel diff $maxDiff vs ImageIO")
    assert(meanDiff <= meanTol,
      s"$name: mean per-channel diff $meanDiff vs ImageIO")
    assert(s == sum, s"$name sum: got $s")
    assert(ws == wsum, s"$name weighted: got $ws")
  }

  test("a wild PROGRESSIVE JPEG (spectral selection, 4:4:4) decodes, " +
      "pixels matching the JDK's independent ImageIO decoder") {
    progressiveCase("wild_progressive.jpg", 493, 58,
      tol = 4, meanTol = 0.5, sum = 20019719L, wsum = 605631819341L)
  }

  test("a SUCCESSIVE-APPROXIMATION progressive JPEG (4:2:0, " +
      "interleaved DC first+refine, AC refine with EOB runs) decodes, " +
      "pixels matching ImageIO") {
    // written by the JDK's native JPEG encoder (MODE_DEFAULT scan
    // script: DC Al=1 + refine, AC Al=2->0 refinements) — an encoder
    // this repo did not write; wider tol than the 4:4:4 case because
    // ImageIO's fancy (triangular) chroma upsampling differs from
    // this decoder's nearest-neighbor at 4:2:0 chroma edges
    progressiveCase("wild_progressive_sa.jpg", 161, 161,
      tol = 64, meanTol = 2.5, sum = 16702542L, wsum = 433129243644L)
  }
}
