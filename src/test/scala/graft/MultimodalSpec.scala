package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.packMedia(
    Tables.load(spark, sf, "documents").limit(60))

  test("packMedia produces binary payloads with typed metadata") {
    val rows = media.collect()
    assert(rows.length == 60)
    assert(rows.forall(_.payload.nonEmpty))
    assert(rows.map(_.kind).toSet == Set("image", "audio", "video"))
  }

  test("decode is deterministic and partition-invariant") {
    val d1 = Multimodal.decode(media).orderBy("media_id").collect()
    val d2 = Multimodal.decode(media.repartition(7))
      .orderBy("media_id").collect()
    assert(d1.toSeq == d2.toSeq)
    assert(d1.forall(r => r.n_bytes > 0))
  }

  test("extractFeatures yields unit-norm fixed-dim vectors") {
    val f = Multimodal.extractFeatures(media, 32).collect()
    assert(f.forall(_.feature.length == 32))
    f.foreach { r =>
      val n = math.sqrt(r.feature.map(x => x * x.toDouble).sum)
      assert(math.abs(n - 1.0) < 1e-3, s"norm $n for ${r.media_id}")
    }
  }

  test("sampleFrames explodes video payloads into strided blocks") {
    val frames = Multimodal.sampleFrames(media, blockSize = 16, stride = 2)
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame.length <= 16))
    assert(frames.forall(_.frame_idx % 2 == 0))
  }

  test("resizeMeta caps width and preserves aspect ratio direction") {
    val r = Multimodal.resizeMeta(media, 100).collect()
    assert(r.forall(_.width <= 100))
  }

  // ---- real codecs: known fixtures decode to exact values ------------

  import graft.operators.MediaCodecs
  import graft.operators.MediaCodecs.{Audio, Image}

  test("BMP round-trips known pixels exactly, incl. row padding") {
    // width 3 → row bytes 9 → padded to 12: the pad path is exercised
    val rgb = Array[Byte](
      10, 20, 30,  40, 50, 60,  70, 80, 90,
      -1, 0, 1,    127, -128, 5,  11, 22, 33)
    val img = Image(3, 2, rgb)
    val decoded = MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(img))
    assert(decoded.width == 3 && decoded.height == 2)
    assert(decoded.rgb.sameElements(rgb))
  }

  test("BMP decodes a hand-built top-down fixture (negative height)") {
    // 1×2 top-down: rows appear in natural order; pixels stored BGR
    val bytes = java.nio.ByteBuffer.allocate(54 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bytes.put('B'.toByte).put('M'.toByte).putInt(54 + 8).putInt(0)
      .putInt(54).putInt(40).putInt(1).putInt(-2)
      .putShort(1).putShort(24).putInt(0).putInt(8)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    bytes.put(Array[Byte](3, 2, 1, 0)) // row 0: BGR(3,2,1) + pad
    bytes.put(Array[Byte](6, 5, 4, 0)) // row 1: BGR(6,5,4) + pad
    val img = MediaCodecs.decodeBmp(bytes.array())
    assert(img.width == 1 && img.height == 2)
    assert(img.rgb.sameElements(Array[Byte](1, 2, 3, 4, 5, 6)))
  }

  test("PPM round-trips and tolerates header comments") {
    val rgb = Array.tabulate[Byte](2 * 2 * 3)(i => (i * 7).toByte)
    val enc = MediaCodecs.encodePpm(Image(2, 2, rgb))
    val decoded = MediaCodecs.decodePpm(enc)
    assert(decoded.width == 2 && decoded.rgb.sameElements(rgb))
    // inject a comment line into the header, per the netpbm spec
    val commented = ("P6\n# a comment\n2 2\n255\n")
      .getBytes("US-ASCII") ++ rgb
    val d2 = MediaCodecs.decodePpm(commented)
    assert(d2.width == 2 && d2.height == 2 && d2.rgb.sameElements(rgb))
  }

  test("PNG round-trips known pixels through real zlib compression") {
    val rgb = Array.tabulate[Byte](7 * 3 * 3)(i => (i * 11 + 5).toByte)
    val img = Image(7, 3, rgb)
    val enc = MediaCodecs.encodePng(img)
    // genuinely compressed: zlib magic after the first chunk headers
    assert(enc.length > 8 + 12 + 13)
    val dec = MediaCodecs.decodePng(enc)
    assert(dec.width == 7 && dec.height == 3 && dec.rgb.sameElements(rgb))
  }

  test("PNG decoder reconstructs all five scanline filter types") {
    // hand-build a 4x5 PNG whose rows use filters 0..4; the filtered
    // bytes are computed as the spec's forward transform, so decode
    // must invert Sub/Up/Average/Paeth exactly
    val w = 4; val h = 5; val bpp = 3
    val rgb = Array.tabulate[Byte](w * h * 3)(i => (i * 37 + 13).toByte)
    def px(y: Int, x: Int) =
      if (y < 0 || x < 0) 0 else rgb(y * w * 3 + x) & 0xff
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      val f = y % 5
      raw.write(f)
      for (x <- 0 until w * 3) {
        val cur = px(y, x)
        val left = if (x >= bpp) px(y, x - bpp) else 0
        val up = px(y - 1, x)
        val ul = if (x >= bpp) px(y - 1, x - bpp) else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        raw.write((cur - pred) & 0xff)
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw.toByteArray); deflater.finish()
    val z = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) z.write(buf, 0, deflater.deflate(buf))
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a,
      0x1a, 0x0a))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def w32(v: Int): Unit = { out.write(v >>> 24); out.write(v >>> 16)
        out.write(v >>> 8); out.write(v) }
      w32(data.length)
      val t = typ.getBytes("US-ASCII")
      out.write(t); out.write(data)
      val crc = new java.util.zip.CRC32(); crc.update(t); crc.update(data)
      w32(crc.getValue.toInt)
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    def w32i(v: Int): Unit = { ihdr.write(v >>> 24); ihdr.write(v >>> 16)
      ihdr.write(v >>> 8); ihdr.write(v) }
    w32i(w); w32i(h)
    ihdr.write(8); ihdr.write(2); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.empty)
    val img = MediaCodecs.decodePng(out.toByteArray)
    assert(img.width == w && img.height == h)
    assert(img.rgb.sameElements(rgb),
      "filter reconstruction diverged from the spec's forward transform")
  }

  test("WAV round-trips known samples and skips unknown chunks") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val enc = MediaCodecs.encodeWav(Audio(44100, 1, samples))
    val a = MediaCodecs.decodeWav(enc)
    assert(a.sampleRate == 44100 && a.channels == 1)
    assert(a.samples.sameElements(samples))
    // splice a LIST chunk between fmt and data: parser must skip it
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = enc.slice(0, 36) ++ listChunk ++ enc.slice(36, enc.length)
    // fix the RIFF size field (+12 bytes)
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, bb.getInt(4) + 12)
    val a2 = MediaCodecs.decodeWav(spliced)
    assert(a2.samples.sameElements(samples))
  }

  test("decodeStats routes by magic and computes decoded means") {
    val docs = Tables.load(spark, sf, "documents").limit(30)
    val stats = Multimodal.decodeStats(Multimodal.packEncodedMedia(docs))
      .collect()
    assert(stats.length == 30)
    assert(stats.forall(_.format != "opaque"))
    stats.foreach { r =>
      val expect = (r.media_id % 3) match {
        case 0 => (0 until 384).map(i => (i * 31 + r.media_id) % 256)
          .sum.toDouble / 384
        case 1 => (0 until 256).map(i => (i * 37 + r.media_id) % 2048 - 1024)
          .sum.toDouble / 256
        case _ => (0 until 192).map(i => (i * 13 + r.media_id) % 256)
          .sum.toDouble / 192
      }
      assert(r.mean_value == expect,
        s"media ${r.media_id} ${r.format}: ${r.mean_value} != $expect")
    }
  }

  test("sniffed-but-undecodable payloads fall back to opaque, not throw") {
    import spark.implicits._
    // truncated progressive JPEG: valid FF D8 FF sniff prefix, SOF2
    // header but NO scan data, so the Annex G decoder refuses;
    // truncated BMP: valid 'BM' magic, no
    // header; FLAC magic with garbage stream. Each must route to the
    // deterministic opaque path — one exotic payload in a 100 TB
    // corpus must degrade, not fail the whole query.
    val progJpeg = Array[Int](0xff, 0xd8, 0xff, 0xc2, 0x00, 0x0b, 0x08,
      0x00, 0x08, 0x00, 0x08, 0x01, 0x01, 0x11, 0x00).map(_.toByte)
    val shortBmp = Array[Byte]('B', 'M', 1, 2, 3)
    val badFlac = Array[Byte]('f', 'L', 'a', 'C', 0x7f, 0x7f, 0x7f)
    assert(MediaCodecs.decodeImage(progJpeg).isEmpty)
    assert(MediaCodecs.decodeImage(shortBmp).isEmpty)
    assert(MediaCodecs.decodeAudio(badFlac).isEmpty)
    val media = Seq(
      Multimodal.MediaRow(1L, "image", progJpeg, 8, 8),
      Multimodal.MediaRow(2L, "image", shortBmp, 0, 0),
      Multimodal.MediaRow(3L, "audio", badFlac, 0, 0)).toDS()
    val stats = Multimodal.decodeStats(media).collect()
    assert(stats.length == 3 && stats.forall(_.format == "opaque"))
    // the skip-style operators drop them instead of failing
    assert(Multimodal.channelStats(media).collect().isEmpty)
    assert(Multimodal.dHash(media).collect().isEmpty)
  }

  test("audioFrameFeatures: partial final frame, strict crossings") {
    import spark.implicits._
    // 10 samples at frame size 4 -> frames of 4, 4, 2; the
    // +1,-1 alternation crosses at every adjacent pair EXCEPT
    // across frame boundaries; the zero sample must not count
    // (strict product < 0).
    val samples = Array[Short](1, -1, 1, -1, 0, 1, -1, 1, -1, 1)
    val payload = MediaCodecs.encodeWav(MediaCodecs.Audio(8000, 1, samples))
    val media = Seq(Multimodal.MediaRow(7L, "audio", payload, 0, 0)).toDS()
    val rows = Multimodal.audioFrameFeatures(media, frameSize = 4)
      .collect().sortBy(_.frame_idx)
    assert(rows.map(_.n_samples).toSeq == Seq(4L, 4L, 2L))
    assert(rows.map(_.ssq).toSeq == Seq(4L, 3L, 2L))
    // frame 0: 3 flips; frame 1: (0,1) no, (1,-1) yes, (-1,1) yes;
    // frame 2: one flip
    assert(rows.map(_.n_crossings).toSeq == Seq(3L, 2L, 1L))
  }

  test("channelStats sums per channel identically across codecs") {
    import spark.implicits._
    val rgb = Array.tabulate[Byte](6 * 2 * 3)(i => (i * 7 % 256).toByte)
    val img = MediaCodecs.Image(6, 2, rgb)
    val media = Seq(
      Multimodal.MediaRow(0L, "image", MediaCodecs.encodeBmp(img), 6, 2),
      Multimodal.MediaRow(1L, "image", MediaCodecs.encodePng(img), 6, 2),
      Multimodal.MediaRow(2L, "video", MediaCodecs.encodePpm(img), 6, 2))
      .toDS()
    val rows = Multimodal.channelStats(media).collect()
    assert(rows.length == 9)
    val expect = (0 until 3).map(c =>
      (0 until rgb.length).filter(_ % 3 == c)
        .map(i => rgb(i) & 0xff).map(_.toLong).sum)
    for (r <- rows) {
      assert(r.n == 12L)
      assert(r.total == expect(r.channel.toInt),
        s"media ${r.media_id} ch ${r.channel}")
    }
  }

  test("dHash computes hand-checked gradient bits identically across codecs") {
    import spark.implicits._
    // 3×2, green channel laid out per row: (10,200,50) / (5,5,9)
    // bits (strict >): 10>200→0, 200>50→1 | 5>5→0, 5>9→0  ⇒  "0100"
    val greens = Array(10, 200, 50, 5, 5, 9)
    val rgb = new Array[Byte](3 * 2 * 3)
    greens.zipWithIndex.foreach { case (g, i) =>
      rgb(i * 3) = 1; rgb(i * 3 + 1) = g.toByte; rgb(i * 3 + 2) = 2
    }
    val img = MediaCodecs.Image(3, 2, rgb)
    val media = Seq(
      Multimodal.MediaRow(0L, "image", MediaCodecs.encodeBmp(img), 3, 2),
      Multimodal.MediaRow(1L, "image", MediaCodecs.encodePng(img), 3, 2),
      Multimodal.MediaRow(2L, "video", MediaCodecs.encodePpm(img), 3, 2))
      .toDS()
    val rows = Multimodal.dHash(media).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.dhash == "0100", s"media ${r.media_id}: ${r.dhash}")
      assert(r.n_ones == 1L)
    }
  }

  test("dHashNearDup: pigeonhole recall, threshold cut, geometry isolation") {
    import spark.implicits._
    val base = "10110011" * 4 // 32 bits, 4 bands of 8
    def flip(s: String, at: Seq[Int]): String =
      s.zipWithIndex.map { case (c, i) =>
        if (at.contains(i)) (if (c == '1') '0' else '1') else c
      }.mkString
    val hashes = Seq(
      (0L, base),                          // identical pair with 1
      (1L, base),
      (2L, flip(base, Seq(3))),            // 1 bit away — must be found
      (3L, flip(base, Seq(0, 9, 17, 25))), // 1 flip in EVERY band: no
                                           // shared band, legal miss
      (4L, "1011"))                        // different geometry
      .toDF("media_id", "dhash")
    val pairs = graft.operators.Multimodal
      .dHashNearDup(hashes, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((0L, 1L, 0L), (0L, 2L, 1L), (1L, 2L, 1L)))
    // hamming < bands is REQUIRED — the guard refuses lossy configs
    intercept[IllegalArgumentException] {
      graft.operators.Multimodal.dHashNearDup(hashes, 4, 4)
    }
  }

  test("dHashNearDupEdges spans the SAME components as the full pair " +
      "list, with linear (not quadratic) edges in duplication") {
    import spark.implicits._
    val base = "10110011" * 4
    def flip(s: String, at: Seq[Int]): String =
      s.zipWithIndex.map { case (c, i) =>
        if (at.contains(i)) (if (c == '1') '0' else '1') else c
      }.mkString
    // 6 copies of one hash + a 1-bit neighbor + an isolated geometry:
    // the full pair contract emits 15 same-hash pairs + 6 cross pairs;
    // the edge variant emits 5 star edges + 1 rep edge
    val hashes = ((0L to 5L).map(i => (i, base)) ++ Seq(
      (6L, flip(base, Seq(3))), (7L, "1011"))).toDF("media_id", "dhash")
    def comps(edges: org.apache.spark.sql.DataFrame) =
      graft.operators.ConnectedComponents
        .components(edges, "media_a", "media_b",
          nodes = Some(hashes.select($"media_id")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = graft.operators.Multimodal
      .dHashNearDup(hashes, bands = 4, maxHamming = 3)
    val lean = graft.operators.Multimodal
      .dHashNearDupEdges(hashes, bands = 4, maxHamming = 3)
    assert(comps(full) == comps(lean),
      "edge variant must cluster identically to the pair contract")
    assert(full.count() == 21L, s"pair contract: ${full.count()}")
    assert(lean.count() == 6L, s"edge variant: ${lean.count()}")
    // node 7 (different geometry) stays a singleton either way
    assert(comps(lean).toMap.apply(7L) == 7L)
  }

  test("videoTemporalHash is invariant to re-encode quality and brightness") {
    import spark.implicits._
    def solid(c: Int) = graft.operators.MediaCodecs.Image(
      16, 8, Array.fill(16 * 8 * 3)(c.toByte))
    def avi(cols: Seq[Int], quality: Int) =
      graft.operators.VideoCodec.encodeAviMjpeg(
        12, cols.map(solid), quality = quality)
    val seqA = Seq(40, 70, 135, 230, 100) // expected thash "0001"
    val media = Seq(
      Multimodal.MediaRow(0L, "video", avi(seqA, 90), 16, 8),
      Multimodal.MediaRow(1L, "video", avi(seqA, 60), 16, 8), // re-encode
      Multimodal.MediaRow(2L, "video", avi(seqA.map(_ + 1), 85), 16, 8),
      Multimodal.MediaRow(3L, "video", avi(seqA.reverse, 90), 16, 8),
      Multimodal.MediaRow(4L, "video", avi(seqA.take(3), 90), 16, 8),
      Multimodal.MediaRow(5L, "audio", // non-video: skipped
        graft.operators.MediaCodecs.encodeWav(
          graft.operators.MediaCodecs.Audio(8000, 1,
            Array.fill[Short](16)(5))), 0, 0))
      .toDS()
    val rows = Multimodal.videoTemporalHash(media)
      .collect().map(r => r.media_id -> (r.n_frames, r.thash)).toMap
    assert(rows.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(rows(0L) == (5L, "0001"))
    assert(rows(1L) == rows(0L), "re-encode at q60 changed the fingerprint")
    assert(rows(2L) == rows(0L), "+1 brightness changed the fingerprint")
    assert(rows(3L) == (5L, "0111"), "reversed footage must differ")
    assert(rows(4L) == (3L, "00"), "frame count must ride with the hash")
  }

  test("resizePixels: box-filter floor-means, codec round-trip, skips") {
    import spark.implicits._
    import graft.operators.MediaCodecs
    // 8x4 gradient: pixel (x,y) channel c = (y*8+x)*3+c
    val rgb = Array.tabulate[Byte](8 * 4 * 3)(i => i.toByte)
    val media = Seq(
      Multimodal.MediaRow(0L, "image", MediaCodecs.encodeBmp(
        MediaCodecs.Image(8, 4, rgb)), 8, 4),
      Multimodal.MediaRow(1L, "image", MediaCodecs.encodePng(
        MediaCodecs.Image(8, 4, rgb)), 8, 4),
      // dims not divisible by k: skipped
      Multimodal.MediaRow(2L, "image", MediaCodecs.encodeBmp(
        MediaCodecs.Image(9, 4, Array.fill(9 * 4 * 3)(7.toByte))), 9, 4),
      // not an image: skipped
      Multimodal.MediaRow(3L, "audio", MediaCodecs.encodeWav(
        MediaCodecs.Audio(8000, 1, Array.fill[Short](16)(5))), 0, 0))
      .toDS()
    val out = Multimodal.resizePixels(media, 4).collect()
    assert(out.map(_.media_id).toSet == Set(0L, 1L))
    val byKey = out.map(r => (r.media_id, r.ox, r.oy) -> r).toMap
    // expected: floor-mean over the 4x4 block, per channel
    def expect(ox: Int, oy: Int, c: Int): Int = {
      val vals = for (dy <- 0 until 4; dx <- 0 until 4)
        yield (((oy * 4 + dy) * 8 + ox * 4 + dx) * 3 + c) & 0xff
      vals.sum / 16
    }
    for (id <- Seq(0L, 1L); ox <- 0 until 2) {
      val r = byKey((id, ox, 0))
      assert(r.out_w == 2 && r.out_h == 1)
      assert(r.r == expect(ox, 0, 0) && r.g == expect(ox, 0, 1) &&
        r.b == expect(ox, 0, 2),
        s"id=$id ox=$ox got (${r.r},${r.g},${r.b})")
    }
    // BMP and PNG inputs of the same raster resize identically
    assert(byKey((0L, 0, 0)).r == byKey((1L, 0, 0)).r)
  }

  test("resampleAudio: truncating means, stereo interleave, partial-block drop") {
    import spark.implicits._
    import graft.operators.MediaCodecs
    // mono: blocks (1,2,3,4) -> 2, (-7,-1,0,0) -> -2 (toward zero)
    val mono = Array[Short](1, 2, 3, 4, -7, -1, 0, 0, 9)
    // stereo: per-channel decimation over interleaved frames
    val stereo = Array[Short](10, -10, 20, -20, 30, -30, 40, -40)
    val media = Seq(
      Multimodal.MediaRow(0L, "audio", MediaCodecs.encodeWav(
        MediaCodecs.Audio(8000, 1, mono)), 0, 0),
      Multimodal.MediaRow(1L, "audio", MediaCodecs.encodeWav(
        MediaCodecs.Audio(8000, 2, stereo)), 0, 0),
      Multimodal.MediaRow(2L, "image", MediaCodecs.encodeBmp(
        MediaCodecs.Image(4, 4, Array.fill(48)(3.toByte))), 4, 4))
      .toDS()
    val out = Multimodal.resampleAudio(media, 4).collect()
      .map(r => r.media_id -> r).toMap
    assert(out.keySet == Set(0L, 1L))
    val m = out(0L)
    // trailing 9 is a partial block: dropped
    assert(m.out_n == 2L && m.out_rate == 2000 && m.channels == 1)
    assert(m.out_sum == 2L + -2L)
    assert(m.checksum == 1L * 2 + 2L * -2)
    val st = out(1L)
    // L channel (10,20,30,40) -> 25; R channel (-10,-20,-30,-40) -> -25
    assert(st.out_n == 2L && st.channels == 2)
    assert(st.checksum == 1L * 25 + 2L * -25)
  }

  test("edgeHistogram: hand-checked gradient bins on a 3x3 fixture") {
    import spark.implicits._
    import graft.operators.MediaCodecs
    // green channel: row0 (0,0,0), row1 (10,50,90), row2 (0,200,0)
    // center pixel: gx = 90-10 = 80, gy = 200-0 = 200
    // |gy| >= 2|gx| -> bin 1, mag 280
    val greens = Array(0, 0, 0, 10, 50, 90, 0, 200, 0)
    val rgb = new Array[Byte](27)
    greens.zipWithIndex.foreach { case (g, i) => rgb(i * 3 + 1) = g.toByte }
    val media = Seq(
      Multimodal.MediaRow(0L, "image",
        MediaCodecs.encodeBmp(MediaCodecs.Image(3, 3, rgb)), 3, 3),
      // too small for interior pixels: skipped
      Multimodal.MediaRow(1L, "image",
        MediaCodecs.encodeBmp(MediaCodecs.Image(2, 2,
          Array.fill(12)(9.toByte))), 2, 2)).toDS()
    val out = Multimodal.edgeHistogram(media).collect()
    assert(out.length == 1 && out.head.media_id == 0L)
    val r = out.head
    assert(r.n_interior == 1L)
    assert((r.b0, r.b1, r.b2, r.b3) == (0L, 1L, 0L, 0L))
    assert((r.mag0, r.mag1, r.mag2, r.mag3) == (0L, 280L, 0L, 0L))
  }

  test("flipCrop mirrors columns; gainClip truncates and clips") {
    import spark.implicits._
    import graft.operators.MediaCodecs
    // 4x2 image, left half red (r=200), right half blue (b=200)
    val rgb = new Array[Byte](4 * 2 * 3)
    for (y <- 0 until 2; x <- 0 until 4) {
      val o = (y * 4 + x) * 3
      if (x < 2) rgb(o) = 200.toByte else rgb(o + 2) = 200.toByte
    }
    val media = Seq(Multimodal.MediaRow(0L, "image",
      MediaCodecs.encodeBmp(MediaCodecs.Image(4, 2, rgb)), 4, 2)).toDS()
    // crop 2x2 AFTER the horizontal flip: the window must be all BLUE
    val a = Multimodal.flipCrop(media, 2, 2).collect().head
    assert(a.sum_b == 4L * 200 && a.sum_r == 0L, s"flip not applied: $a")
    // gain 81/2: -7 * 81 / 2 = -283 (truncation toward zero);
    // 1000 * 81 / 2 = 40500 clips to 32767
    val audio = Seq(Multimodal.MediaRow(1L, "audio",
      MediaCodecs.encodeWav(MediaCodecs.Audio(8000, 1,
        Array[Short](-7, 1000, 3))), 0, 0)).toDS()
    val g = Multimodal.gainClip(audio, 81L, 2L).collect().head
    assert(g.n == 3L && g.n_clipped == 1L)
    assert(g.sum_out == -283L + 32767L + 121L)
    assert(g.pos_checksum == 1L * -283 + 2L * 32767 + 3L * 121)
  }

  test("q303 VAD segments are exactly the maximal active runs of >= 2") {
    import org.apache.spark.sql.functions._
    val media = Multimodal.packEncodedMedia(
      Tables.load(spark, sf, "documents").filter(col("doc_id") % 3 === 1))
    val frames = Multimodal.audioFrameFeatures(media, frameSize = 32)
      .toDF().collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("frame_idx"),
        r.getAs[Long]("ssq")))
      .groupBy(_._1).map { case (m, fs) =>
        m -> fs.sortBy(_._2).map(f => (f._2, f._3)) }

    // reference segmentation computed imperatively from the frames
    val expect = frames.flatMap { case (m, fs) =>
      val runs = scala.collection.mutable.ArrayBuffer[
        (Long, Long, Long, Long, Long)]()
      var start = -1L; var n = 0L; var e = 0L; var prev = -2L
      def flush(end: Long): Unit = {
        if (start >= 0 && n >= 2) runs += ((m, start, end, n, e))
        start = -1; n = 0; e = 0
      }
      fs.foreach { case (idx, ssq) =>
        if (ssq > 10000000L) {
          if (prev != idx - 1 || start < 0) { flush(prev); start = idx }
          n += 1; e += ssq; prev = idx
        } else { flush(prev); prev = -2 }
      }
      flush(prev)
      runs
    }.toSet

    val got = queries.Registry.queries("q303_audio_vad")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("seg_start"),
        r.getAs[Long]("seg_end"), r.getAs[Long]("n_frames"),
        r.getAs[Long]("energy"))).toSet
    assert(got == expect,
      s"only-got=${(got -- expect).take(3)} only-exp=${(expect -- got).take(3)}")
    assert(got.nonEmpty)
    // every media has 8 frames; a segment cannot exceed that
    assert(got.forall { case (_, s0, e0, n, _) =>
      e0 - s0 + 1 == n && n >= 2 && n <= 8 })
  }
}
