package graft.operators

import scala.collection.mutable.ArrayBuffer

/** Structural census of an ISO/IEC 14496-12 (MP4 / ISO-BMFF) container —
  * the video companion to [[Mp3Codec.census]]: wild video payloads whose
  * CODEC this engine does not decode (AVC/HEVC/AAC) still yield their
  * full container metadata — box tree, brands, per-track codec, timing,
  * sample/chunk/keyframe accounting, encoder tag — which is what a
  * 100 TB crawl needs first: census/partition/dedup keys for every MP4
  * in the corpus, whether or not its frames reconstruct.
  *
  * Implemented from the PUBLIC spec structure: size/type box framing
  * with 64-bit largesize and size==0 (to end-of-file), container
  * recursion (`moov/trak/edts/mdia/minf/dinf/stbl/udta/ilst`), the
  * `meta` FullBox container quirk (4 version/flags bytes precede its
  * children), version 0 AND 1 layouts of mvhd/tkhd/mdhd (64-bit times),
  * the sample tables (stsd entry fourcc + audio channel/rate fields,
  * stsz fixed/variable, stco/co64, stss), and the iTunes-style
  * `udta>meta>ilst>(c)too>data` encoder tag.
  *
  * Proven against a fixture this Scala code did NOT produce: an
  * independent Python muxer (driver-side, spec-written) emitted
  * `muxed_camera.mp4` plus a JSON golden of its box layout; the census
  * must recover the tree and every derived constant exactly
  * (Mp4CensusSpec + q295). A mis-sized FullBox skip, a wrong largesize
  * read, or a botched stsc/stsz walk desyncs the tree and flips
  * n_boxes/max_depth/sample_bytes.
  *
  * Decompression-bomb guards, same contract as the other codecs: box
  * count and recursion depth are capped, every declared size is bounds-
  * checked against its parent, and any violation fails the WHOLE parse
  * cleanly (census returns None → opaque path), never an OOM or a
  * runaway loop.
  *
  * Reference scope note: the reference engine stores no media at all
  * (SURVEY §2.12) — this census exists for the brief's multimodal
  * training-data extension, like Mp3Codec.census before it.
  */
object Mp4Census {

  /** One node of the box tree, pre-order. */
  final case class Mp4Box(typ: String, offset: Long, size: Long, depth: Int)

  /** Per-track summary assembled from tkhd/mdhd/hdlr/stbl. */
  final case class Mp4Track(
    trackId: Long, handler: String, codec: String, timescale: Long,
    durationMs: Long, nSamples: Long, sampleBytes: Long, nChunks: Long,
    nKeyframes: Long, width: Int, height: Int, channels: Int,
    sampleRate: Int)

  final case class Result(
    brand: String, minorVersion: Long, compatibleBrands: Seq[String],
    nBoxes: Int, maxDepth: Int, nTopLevel: Int, hasLargesize: Boolean,
    mdatBytes: Long, movieTimescale: Long, movieDurationMs: Long,
    encoderTag: String, tracks: Seq[Mp4Track], boxes: Seq[Mp4Box],
    // fragmented (DASH/CMAF) accounting — zero for classic files
    nFragments: Long = 0L, fragSamples: Long = 0L, fragBytes: Long = 0L,
    fragDurationTicks: Long = 0L, firstTfdt: Long = -1L,
    lastTfdt: Long = -1L)

  private val Containers = Set("moov", "trak", "edts", "mdia", "minf",
    "dinf", "stbl", "udta", "ilst", "©too", "mvex", "moof", "traf")
  /** FullBox containers: 4 version/flags bytes precede the children. */
  private val FullContainers = Set("meta")

  private val MaxBoxes = 100000
  private val MaxDepth = 16

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)), "ISO-8859-1")

  private final class TrackState {
    var trackId = 0L; var handler = ""; var codec = ""
    var timescale = 1L; var duration = 0L
    var nSamples = 0L; var sampleBytes = 0L; var nChunks = 0L
    var nKeyframes = -1L // -1 = no stss box → every sample is sync
    var width = 0; var height = 0; var channels = 0; var sampleRate = 0
    def result: Mp4Track = Mp4Track(trackId, handler, codec, timescale,
      if (timescale <= 0) 0L else duration * 1000L / timescale,
      nSamples, sampleBytes, nChunks,
      if (nKeyframes >= 0) nKeyframes else nSamples,
      width, height, channels, sampleRate)
  }

  private final class Walk(b: Array[Byte]) {
    val boxes = new ArrayBuffer[Mp4Box]
    val tracks = new ArrayBuffer[Mp4Track]
    var brand = ""; var minorVersion = 0L
    var compatible: Seq[String] = Nil
    var hasLargesize = false; var mdatBytes = 0L
    var movieTimescale = 1L; var movieDuration = 0L
    var encoderTag = ""
    // fragment accounting (fMP4): trex defaults feed trun sums
    var nFragments = 0L; var fragSamples = 0L; var fragBytes = 0L
    var fragDuration = 0L; var firstTfdt = -1L; var lastTfdt = -1L
    private var trexDefaultSize = 0L; private var trexDefaultDelta = 0L
    private var track: TrackState = null
    private var inIlstToo = false

    /** Walk [start, end); returns false on any structural violation. */
    def walk(start: Int, end: Int, depth: Int): Boolean = {
      if (depth > MaxDepth) return false
      var off = start
      while (off + 8 <= end) {
        if (boxes.length >= MaxBoxes) return false
        var size = u32(b, off)
        val typ = fourcc(b, off + 4)
        var hdr = 8
        if (size == 1L) {
          if (off + 16 > end) return false
          size = u64(b, off + 8); hdr = 16
          hasLargesize = true
        } else if (size == 0L) size = (end - off).toLong
        if (size < hdr || size > (end - off).toLong) return false
        boxes += Mp4Box(typ, off.toLong, size, depth)
        val body = off + hdr
        val stop = off + size.toInt
        typ match {
          case t if Containers(t) =>
            val isTrak = t == "trak"
            if (isTrak) track = new TrackState
            inIlstToo = t == "©too"
            if (!walk(body, stop, depth + 1)) return false
            inIlstToo = false
            if (isTrak) { tracks += track.result; track = null }
          case t if FullContainers(t) =>
            if (stop - body < 4) return false
            if (!walk(body + 4, stop, depth + 1)) return false
          case "ftyp" =>
            if (stop - body < 8) return false
            brand = fourcc(b, body); minorVersion = u32(b, body + 4)
            compatible = (body + 8 until stop by 4)
              .takeWhile(_ + 4 <= stop).map(fourcc(b, _)).toSeq
          case "mdat" => mdatBytes += size - hdr
          case "mvhd" =>
            if (!parseMvhd(body, stop)) return false
          case "tkhd" if track != null =>
            if (!parseTkhd(body, stop)) return false
          case "mdhd" if track != null =>
            if (!parseMdhd(body, stop)) return false
          case "hdlr" if track != null =>
            if (stop - body < 12) return false
            track.handler = fourcc(b, body + 8)
          case "stsd" if track != null =>
            if (!parseStsd(body, stop)) return false
          case "stsz" if track != null =>
            if (!parseStsz(body, stop)) return false
          case "stco" | "co64" if track != null =>
            if (stop - body < 8) return false
            track.nChunks = u32(b, body + 4)
          case "stss" if track != null =>
            if (stop - body < 8) return false
            track.nKeyframes = u32(b, body + 4)
          case "data" if inIlstToo =>
            // iTunes data box: version/flags (type indicator) + locale
            if (stop - body >= 8)
              encoderTag = new String(b, body + 8, stop - body - 8, "UTF-8")
          case "mfhd" => nFragments += 1
          case "trex" =>
            // track_id, default_description, default_duration,
            // default_size, default_flags
            if (stop - body < 24) return false
            trexDefaultDelta = u32(b, body + 12)
            trexDefaultSize = u32(b, body + 16)
          case "tfdt" =>
            if (stop - body < 8) return false
            val v = b(body) & 0xff
            val t = if (v == 1) {
              if (stop - body < 12) return false
              u64(b, body + 4)
            } else u32(b, body + 4)
            if (firstTfdt < 0) firstTfdt = t
            lastTfdt = t
          case "trun" =>
            if (!parseTrun(body, stop)) return false
          case _ => () // leaf we don't interpret (stts/stsc/elst/...)
        }
        off = stop
      }
      off == end // stray trailing bytes = structural violation: refuse
    }

    /** mvhd/mdhd share the v0 (32-bit) / v1 (64-bit) time layout. */
    private def timeFields(body: Int, stop: Int): Option[(Long, Long)] = {
      if (stop - body < 4) return None
      val version = b(body) & 0xff
      if (version == 1) {
        if (stop - body < 4 + 8 + 8 + 4 + 8) None
        else Some((u32(b, body + 20), u64(b, body + 24)))
      } else {
        if (stop - body < 4 + 4 + 4 + 4 + 4) None
        else Some((u32(b, body + 12), u32(b, body + 16)))
      }
    }

    private def parseMvhd(body: Int, stop: Int): Boolean =
      timeFields(body, stop) match {
        case Some((ts, dur)) =>
          movieTimescale = ts; movieDuration = dur; ts > 0
        case None => false
      }

    private def parseMdhd(body: Int, stop: Int): Boolean =
      timeFields(body, stop) match {
        case Some((ts, dur)) =>
          track.timescale = ts; track.duration = dur; ts > 0
        case None => false
      }

    private def parseTkhd(body: Int, stop: Int): Boolean = {
      if (stop - body < 4) return false
      val version = b(body) & 0xff
      // v0: vf(4) cre(4) mod(4) id(4) ...; v1: vf(4) cre(8) mod(8) id(4)
      val idOff = if (version == 1) body + 20 else body + 12
      // width/height are the LAST 8 bytes (16.16 fixed) in both versions
      if (idOff + 4 > stop || stop - body < 12) return false
      track.trackId = u32(b, idOff)
      track.width = (u32(b, stop - 8) >> 16).toInt
      track.height = (u32(b, stop - 4) >> 16).toInt
      true
    }

    private def parseStsd(body: Int, stop: Int): Boolean = {
      if (stop - body < 8) return false
      val entryOff = body + 8 // version/flags + entry_count
      if (entryOff + 8 > stop) return false
      val entrySize = u32(b, entryOff)
      if (entrySize < 16 || entryOff + entrySize > stop) return false
      track.codec = fourcc(b, entryOff + 4)
      if (track.handler == "soun" && entrySize >= 36) {
        // AudioSampleEntry: 6 reserved + dri(2) + 8 reserved +
        // channelcount(2) + samplesize(2) + predef(2) + reserved(2) +
        // samplerate (16.16 fixed)
        track.channels = u16(b, entryOff + 24)
        track.sampleRate = (u32(b, entryOff + 32) >> 16).toInt
      }
      true
    }

    /** trun (ISO 14496-12 §8.8.8): flags gate data_offset (0x1),
      * first_sample_flags (0x4), then per sample: duration (0x100),
      * size (0x200), flags (0x400), cts offset (0x800) — each 4
      * bytes, in that order. Sizes/durations fall back to the trex
      * defaults when absent. */
    private def parseTrun(body: Int, stop: Int): Boolean = {
      if (stop - body < 8) return false
      val flags = (u32(b, body) & 0xffffffL).toInt
      val count = u32(b, body + 4)
      var off = body + 8
      if ((flags & 0x1) != 0) off += 4   // data_offset
      if ((flags & 0x4) != 0) off += 4   // first_sample_flags
      val perSample = Seq(0x100, 0x200, 0x400, 0x800)
        .count(f => (flags & f) != 0)
      if (count > Int.MaxValue / 16 ||
        off + count * 4L * perSample > stop) return false
      fragSamples += count
      // No per-sample duration/size fields → nothing to read per
      // sample: accumulate by multiplication. The bounds check above
      // degenerates to `off > stop` when perSample == 0, so the loop
      // below would otherwise run count times (up to ~134M per trun ×
      // MaxBoxes truns) on a small hostile fragment — the one shape
      // that escaped the bomb-guard contract on this untrusted path.
      if (perSample == 0) {
        // the multiplied fast-path needs the same hostile-input bound
        // as the uniform-stsz guard: an honest byte total is bounded
        // by the file itself, and ~16 maximal 16-byte truns would
        // otherwise overflow the Long accumulator (r14 ADVICE)
        if (trexDefaultSize != 0L && count != 0L &&
          trexDefaultSize > b.length.toLong.max(1L) / count) return false
        fragBytes += trexDefaultSize * count
        // durations have no file-size bound — saturate instead of
        // wrapping negative across accumulated truns
        val d = trexDefaultDelta * count
        fragDuration =
          if (count != 0L && (trexDefaultDelta > Long.MaxValue / count ||
            fragDuration > Long.MaxValue - d)) Long.MaxValue
          else fragDuration + d
        return true
      }
      var i = 0
      var bytes = 0L; var dur = 0L
      while (i < count.toInt) {
        var o = off + i * 4 * perSample
        if ((flags & 0x100) != 0) { dur += u32(b, o); o += 4 }
        else dur += trexDefaultDelta
        if ((flags & 0x200) != 0) { bytes += u32(b, o); o += 4 }
        else bytes += trexDefaultSize
        i += 1
      }
      fragBytes += bytes
      fragDuration += dur
      true
    }

    private def parseStsz(body: Int, stop: Int): Boolean = {
      if (stop - body < 12) return false
      val uniform = u32(b, body + 4)
      val count = u32(b, body + 8)
      track.nSamples = count
      if (uniform != 0L) {
        // two hostile u32s can overflow the Long product (and any
        // honest total is bounded by the file itself) — reject rather
        // than record a negative byte count
        if (count != 0L && uniform > b.length.toLong.max(1L) / count)
          return false
        track.sampleBytes = uniform * count; return true
      }
      if (count > Int.MaxValue / 4 || body + 12 + count * 4 > stop)
        return false
      var i = 0; var sum = 0L
      while (i < count.toInt) { sum += u32(b, body + 12 + i * 4); i += 1 }
      track.sampleBytes = sum
      true
    }
  }

  /** Census an ISO-BMFF payload; None if the bytes are not a clean,
    * bounds-consistent box tree opening with ftyp (the opaque path). */
  def census(bytes: Array[Byte]): Option[Result] = {
    if (bytes.length < 16 || fourcc(bytes, 4) != "ftyp") return None
    val w = new Walk(bytes)
    if (!w.walk(0, bytes.length, 0)) return None
    if (w.brand.isEmpty) return None
    Some(Result(w.brand, w.minorVersion, w.compatible, w.boxes.length,
      w.boxes.map(_.depth).max, w.boxes.count(_.depth == 0),
      w.hasLargesize, w.mdatBytes, w.movieTimescale,
      if (w.movieTimescale <= 0) 0L
      else w.movieDuration * 1000L / w.movieTimescale,
      w.encoderTag, w.tracks.toSeq, w.boxes.toSeq,
      w.nFragments, w.fragSamples, w.fragBytes, w.fragDuration,
      w.firstTfdt, w.lastTfdt))
  }
}
