package graft

import graft.operators.{MediaCodecs, Mp4Census}

/** Mp4Census vs the committed ISO-BMFF fixture.
  *
  * `muxed_camera.mp4` was produced by an INDEPENDENT spec-written
  * Python muxer (driver-side), which also emitted `mp4_golden.json` —
  * the box tree (type/offset/size/depth of all 47 boxes) and every
  * derived constant — from its own separate read-back walk. The census
  * here must recover all of it exactly: the two implementations share
  * only ISO/IEC 14496-12.
  */
class Mp4CensusSpec extends SparkSpec {

  private def fixture: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/muxed_camera.mp4")
    assert(in != null, "missing muxed_camera.mp4 fixture")
    try in.readAllBytes() finally in.close()
  }

  private def golden = {
    val in = getClass.getResourceAsStream("/graft/mp4_golden.json")
    assert(in != null, "missing mp4_golden.json")
    new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(try in.readAllBytes() finally in.close())
  }

  test("census recovers the muxer's box tree node for node") {
    val c = Mp4Census.census(fixture).getOrElse(fail("census refused"))
    val g = golden
    assert(c.nBoxes == g.get("n_boxes").asInt)
    assert(c.maxDepth == g.get("max_depth").asInt)
    assert(c.nTopLevel == g.get("n_top_level").asInt)
    val gb = g.get("boxes")
    assert(c.boxes.size == gb.size)
    c.boxes.zipWithIndex.foreach { case (b, i) =>
      val e = gb.get(i)
      assert(b.typ == e.get("type").asText, s"box $i type")
      assert(b.offset == e.get("offset").asLong, s"box $i offset")
      assert(b.size == e.get("size").asLong, s"box $i size")
      assert(b.depth == e.get("depth").asInt, s"box $i depth")
    }
  }

  test("census recovers brands, timing, tracks, and the encoder tag") {
    val c = Mp4Census.census(fixture).getOrElse(fail("census refused"))
    val g = golden
    assert(c.brand == "isom" && c.minorVersion == 512L)
    assert(c.compatibleBrands == Seq("isom", "iso2", "avc1", "mp41"))
    assert(c.hasLargesize, "mdat uses a 64-bit largesize header")
    assert(c.mdatBytes == g.get("mdat_payload_bytes").asLong)
    assert(c.movieTimescale == g.get("movie_timescale").asLong)
    assert(c.movieDurationMs == g.get("movie_duration_ms").asLong)
    assert(c.encoderTag == g.get("encoder_tag").asText)

    assert(c.tracks.size == 2)
    val Seq(v, a) = c.tracks
    val gv = g.get("video"); val ga = g.get("audio")
    assert(v.handler == "vide" && v.codec == "avc1")
    assert(v.trackId == gv.get("track_id").asLong)
    assert(v.timescale == gv.get("timescale").asLong)
    assert(v.durationMs == gv.get("duration_ms").asLong)
    assert(v.nSamples == gv.get("n_samples").asLong)
    assert(v.sampleBytes == gv.get("sample_bytes").asLong)
    assert(v.nChunks == gv.get("n_chunks").asLong)
    assert(v.nKeyframes == gv.get("n_keyframes").asLong)
    assert(v.width == gv.get("width").asInt)
    assert(v.height == gv.get("height").asInt)
    assert(a.handler == "soun" && a.codec == "mp4a")
    assert(a.trackId == ga.get("track_id").asLong)
    assert(a.timescale == ga.get("timescale").asLong)
    assert(a.durationMs == ga.get("duration_ms").asLong)
    assert(a.nSamples == ga.get("n_samples").asLong)
    assert(a.sampleBytes == ga.get("sample_bytes").asLong)
    assert(a.nChunks == ga.get("n_chunks").asLong)
    assert(a.nKeyframes == a.nSamples, "no stss → every sample sync")
    assert(a.channels == ga.get("channels").asInt)
    assert(a.sampleRate == ga.get("sample_rate").asInt)
  }

  private def fmp4: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/muxed_dash.mp4")
    assert(in != null, "missing muxed_dash.mp4 fixture")
    try in.readAllBytes() finally in.close()
  }

  private def fmp4Golden = {
    val in = getClass.getResourceAsStream("/graft/fmp4_golden.json")
    assert(in != null, "missing fmp4_golden.json")
    new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(try in.readAllBytes() finally in.close())
  }

  test("fragmented MP4 (DASH/CMAF): box tree + moof/traf/trun sums " +
      "match the independent muxer's golden") {
    val c = Mp4Census.census(fmp4).getOrElse(fail("census refused"))
    val g = fmp4Golden
    assert(c.brand == g.get("brand").asText)
    assert(c.nBoxes == g.get("n_boxes").asInt)
    assert(c.maxDepth == g.get("max_depth").asInt)
    assert(c.nTopLevel == g.get("n_top_level").asInt)
    val gb = g.get("boxes")
    c.boxes.zipWithIndex.foreach { case (bx, i) =>
      val e = gb.get(i)
      assert(bx.typ == e.get("type").asText, s"box $i type")
      assert(bx.offset == e.get("offset").asLong, s"box $i offset")
      assert(bx.size == e.get("size").asLong, s"box $i size")
      assert(bx.depth == e.get("depth").asInt, s"box $i depth")
    }
    assert(c.nFragments == g.get("n_fragments").asLong)
    assert(c.fragSamples == g.get("frag_samples").asLong)
    assert(c.fragBytes == g.get("frag_bytes").asLong)
    assert(c.fragDurationTicks == g.get("frag_duration_ticks").asLong)
    assert(c.firstTfdt == g.get("first_tfdt").asLong)
    assert(c.lastTfdt == g.get("last_tfdt").asLong)
    // the moov carries an EMPTY stbl (all samples live in fragments)
    assert(c.tracks.size == 1)
    val t = c.tracks.head
    assert(t.handler == "vide" && t.codec == "avc1")
    assert(t.nSamples == 0L && t.nChunks == 0L)
    assert(t.timescale == g.get("timescale").asLong)
    assert(t.width == g.get("width").asInt)
    assert(t.height == g.get("height").asInt)
    // a CLASSIC file reports zero fragment state
    val classic = Mp4Census.census(fixture).get
    assert(classic.nFragments == 0L && classic.fragSamples == 0L &&
      classic.firstTfdt == -1L)
  }

  test("sniff claims ftyp payloads; corrupt trees refuse cleanly") {
    val bytes = fixture
    assert(MediaCodecs.sniff(bytes).contains("mp4"))

    // truncation mid-box: clean None, not an exception
    assert(Mp4Census.census(bytes.take(bytes.length / 2)).isEmpty)
    assert(Mp4Census.census(bytes.take(10)).isEmpty)
    assert(Mp4Census.census(Array.empty[Byte]).isEmpty)

    // a box whose declared size overruns its parent: refuse
    val overrun = bytes.clone()
    // first box is ftyp at offset 0; inflate its size field
    overrun(0) = 0x7f.toByte
    assert(Mp4Census.census(overrun).isEmpty)

    // stray trailing bytes after the last top-level box: refuse
    assert(Mp4Census.census(bytes ++ Array[Byte](1, 2, 3)).isEmpty)

    // not ISO-BMFF at all
    assert(Mp4Census.census("RIFF....WAVE".getBytes).isEmpty)
  }

  test("bomb guard: a self-nested box tree caps recursion, not memory") {
    // depth > MaxDepth of nested moov containers, sizes all consistent
    val depth = 40
    val inner = Array[Byte](0, 0, 0, 8, 'f', 'r', 'e', 'e')
    var body = inner
    (1 to depth).foreach { _ =>
      val b = java.nio.ByteBuffer.allocate(8 + body.length)
      b.putInt(8 + body.length).put("moov".getBytes).put(body)
      body = b.array()
    }
    val ftyp = java.nio.ByteBuffer.allocate(16)
      .putInt(16).put("ftyp".getBytes)
      .put("isom".getBytes).putInt(512).array()
    assert(Mp4Census.census(ftyp ++ body).isEmpty)
  }

  // box-builder for hostile fixtures: size+type header, raw body
  private def hbox(typ: String, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
    bb.putInt(8 + body.length).put(typ.getBytes("US-ASCII")).put(body)
    bb.array()
  }
  private def be32(v: Long): Array[Byte] = java.nio.ByteBuffer
    .allocate(4).putInt(v.toInt).array()
  private def hftyp: Array[Byte] = java.nio.ByteBuffer.allocate(16)
    .putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(512)
    .array()

  test("bomb guard: a trun with NO per-sample fields accumulates by " +
      "multiplication, not a count-length loop") {
    // flags=0 → perSample=0, so the byte-bounds check degenerates and a
    // 16-byte trun may claim ~134M samples; 10000 of them in one traf
    // is ~1.3e12 loop iterations under the pre-r14 code (minutes of
    // CPU from a 160 KB hostile file) vs constant work now
    val count = Int.MaxValue / 16L // the largest count the guard admits
    val trun = hbox("trun", be32(0) ++ be32(count))
    val traf = hbox("traf", Array.fill(10000)(trun).flatten)
    val moof = hbox("moof", hbox("mfhd", be32(0) ++ be32(1)) ++ traf)
    val t0 = System.nanoTime()
    val c = Mp4Census.census(hftyp ++ moof)
      .getOrElse(fail("hostile-but-consistent tree should census"))
    val sec = (System.nanoTime() - t0) / 1e9
    assert(c.fragSamples == count * 10000L)
    assert(c.fragBytes == 0L && c.fragDurationTicks == 0L) // no trex defaults
    assert(sec < 10.0, s"trun walk took ${sec}s — count loop is back")
  }

  test("bomb guard: multiplied trun fast-path bounds bytes by the file " +
      "and saturates durations instead of wrapping negative") {
    // trex body: version/flags, track_id, desc_idx, default_duration,
    // default_size, default_flags (Mp4Census reads +12 / +16)
    def trex(delta: Long, size: Long) = hbox("trex",
      be32(0) ++ be32(1) ++ be32(1) ++ be32(delta) ++ be32(size) ++ be32(0))
    def file(delta: Long, size: Long, truns: Int, count: Long) = {
      val trun = hbox("trun", be32(0) ++ be32(count)) // flags=0 → perSample=0
      val traf = hbox("traf", Array.fill(truns)(trun).flatten)
      val moof = hbox("moof", hbox("mfhd", be32(0) ++ be32(1)) ++ traf)
      hftyp ++ hbox("moov", hbox("mvex", trex(delta, size))) ++ moof
    }
    // ~16 maximal truns × (2^32-1 size × 134M count) wrapped the Long
    // byte accumulator negative pre-r15; an honest total is bounded by
    // the file, so this must refuse (the uniform-stsz standard)
    assert(Mp4Census.census(
      file(0L, 0xffffffffL, 32, Int.MaxValue / 16L)).isEmpty)
    // durations have no file-size bound: saturate, never go negative
    val sat = Mp4Census.census(
      file(0xffffffffL, 0L, 32, Int.MaxValue / 16L))
      .getOrElse(fail("size-0 hostile durations should census"))
    assert(sat.fragDurationTicks == Long.MaxValue)
    // honest defaults still accumulate exactly
    val ok = Mp4Census.census(file(3L, 4L, 2, 5L))
      .getOrElse(fail("legit trex-default truns should census"))
    assert(ok.fragBytes == 40L && ok.fragDurationTicks == 30L)
  }

  test("bomb guard: uniform stsz whose u32 product overflows Long (or " +
      "exceeds the file) refuses instead of recording negative bytes") {
    def stszFile(uniform: Long, count: Long): Array[Byte] = {
      val stsz = hbox("stsz", be32(0) ++ be32(uniform) ++ be32(count))
      hftyp ++ hbox("moov", hbox("trak", stsz))
    }
    // 2^32-1 × 2^32-1 overflows Long into a negative sampleBytes
    assert(Mp4Census.census(stszFile(0xffffffffL, 0xffffffffL)).isEmpty)
    // honest totals bounded by the file itself still census
    val ok = Mp4Census.census(stszFile(4L, 3L))
      .getOrElse(fail("legit uniform stsz should census"))
    assert(ok.tracks.head.sampleBytes == 12L)
  }

  test("decodeStats routes ISO-BMFF to census-backed mp4 stats") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      graft.operators.Multimodal.MediaRow(1L, "video", fixture, 0, 0)))
    val row = graft.operators.Multimodal.decodeStats(media).collect().head
    assert(row.format == "mp4")
    assert(row.dim1 == 640 && row.dim2 == 360)
    assert(row.n_units == 48L) // video track sample count
  }
}
