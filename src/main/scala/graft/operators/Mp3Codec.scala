package graft.operators

import java.io.ByteArrayOutputStream

/** Pure-JVM MPEG-1 Layer III (MP3) mono frame codec — retires the last
  * lossy-audio stub: payloads are genuine bit-packed Layer III frames,
  * and decode is a real bitstream parse, not a byte-statistic fake.
  *
  * REAL, bit-exact to the public ISO 11172-3 layout:
  *  - frame header: 11-bit sync, version/layer/protection, the
  *    published MPEG-1 Layer III bitrate table (32..320 kbps) and
  *    sample-rate table (44.1/48/32 kHz), padding, mode; frame size =
  *    144·bitrate/samplerate (+padding), validated on decode
  *  - side info (mono, 17 bytes): main_data_begin(9), private(5),
  *    scfsi(4), and per granule part2_3_length(12), big_values(9),
  *    global_gain(8), scalefac_compress(4), window_switching(1),
  *    table_select(3×5), region0_count(4), region1_count(3),
  *    preflag(1), scalefac_scale(1), count1table_select(1) — every
  *    field parsed at its spec width, and part2_3_length is
  *    load-bearing: decode REQUIRES the consumed bit count to match it
  *  - scalefactor slen table (scalefac_compress → slen1/slen2) per the
  *    published 16-entry table
  *  - spectral layout: big_values magnitude pairs with per-value sign
  *    bits and a 13-bit linbits escape, a count1 region of ±1
  *    quadruples, and an implicit rzero tail — Layer III's three-zone
  *    structure exactly
  *  - requantization: x = sign(q)·|q|^(4/3)·2^((global_gain−210)/4) —
  *    the actual Layer III power-law, which is where the lossiness
  *    lives
  *
  * Wild-stream interop: [[census]] walks ANY real-world MP3's
  * structure, and [[decodeWild]] reconstructs exact samples for the
  * empty-granule class (see its scaladoc for why that boundary is
  * where honest bit-exactness ends in this environment).
  *
  * DOCUMENTED deviations (repo-canonical, deterministic — streams are
  * Layer III-STRUCTURED but not interop-certified):
  *  - Huffman code tables: ISO's 34 fixed tables are replaced by two
  *    canonical Huffman codes built at class load from explicit weight
  *    functions (big-value pairs over (0..15)², count1 quadruples over
  *    {0,1}⁴), assigned canonically by (length, symbol). table_select
  *    still routes regions for real: id 0 = the zero table, id 15 =
  *    pairs without escape, id 24 = pairs with the 13-bit escape;
  *    count1table_select 1 selects literal 4-bit quadruples (the shape
  *    of ISO's table B), 0 the canonical code.
  *  - region0/region1 counts partition big_values in PAIR units rather
  *    than scalefactor-band units (the per-samplerate sfb boundary
  *    tables are the one ISO table omitted); the fields are written
  *    and honored at their real widths.
  *  - the hybrid filterbank (512-tap polyphase + 36-point overlapped
  *    MDCT) is replaced by two orthonormal block DCTs (32-point
  *    subband split × 18-point temporal transform), so granules decode
  *    independently with no inter-frame state; synthesis is the exact
  *    transpose. Perfect reconstruction up to the quantizer.
  *
  * Reference scope note: the reference engine stores no media at all
  * (SURVEY §2.12) — this codec exists for the brief's multimodal
  * training-data extension, like JpegCodec/FlacCodec before it.
  */
object Mp3Codec {

  import MediaCodecs.Audio

  // ---- wild-bitstream frame census ------------------------------------

  /** Structural census of an ARBITRARY real-world MP3 file — the
    * interop-boundary companion to [[decode]] (COVERAGE.md "Interop
    * boundary"): sample reconstruction is repo-canonical, but the
    * CONTAINER layer (ID3v2 skip, frame headers across all three MPEG
    * versions and layers, the published bitrate/sample-rate tables,
    * Xing/Info/VBRI tag detection, resync over junk, ID3v1 tail) is
    * implemented to the public spec and proven against a wild
    * LAME-encoded fixture. This is what a 100 TB ingest needs first:
    * census/partition/dedup keys for every MP3 in a crawl, whether or
    * not its samples reconstruct. */
  final case class Mp3Census(
    version: String, layer: Int, sampleRate: Int, channels: Int,
    nFrames: Int, bitrateMinKbps: Int, bitrateMaxKbps: Int,
    vbr: Boolean, vbrTag: String, durationMs: Long,
    id3v2Bytes: Int, resyncs: Int, trailingBytes: Int)

  private val V1Bitrates = Array(
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448), // L1
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),    // L2
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320))     // L3
  private val V2Bitrates = Array(
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),    // L1
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),         // L2
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))         // L3
  private val SampleRates = Map( // version id -> table
    3 -> Array(44100, 48000, 32000), // MPEG-1
    2 -> Array(22050, 24000, 16000), // MPEG-2
    0 -> Array(11025, 12000, 8000))  // MPEG-2.5

  /** Parsed header of one frame: (versionId, layer, bitrateKbps,
    * sampleRate, channels, frameBytes, samplesPerFrame); None if the
    * 4 bytes are not a valid frame header. */
  private def parseHeader(b: Array[Byte], off: Int)
      : Option[(Int, Int, Int, Int, Int, Int, Int)] = {
    if (off + 4 > b.length) return None
    val h = ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    if ((h >>> 21) != 0x7ff) return None
    val ver = (h >>> 19) & 3        // 3=MPEG-1, 2=MPEG-2, 0=MPEG-2.5
    val layerBits = (h >>> 17) & 3  // 3=L1, 2=L2, 1=L3
    if (ver == 1 || layerBits == 0) return None
    val layer = 4 - layerBits       // 1..3
    val brIdx = (h >>> 12) & 15
    if (brIdx == 0 || brIdx == 15) return None // free-format/bad
    val srIdx = (h >>> 10) & 3
    if (srIdx == 3) return None
    val pad = (h >>> 9) & 1
    val mode = (h >>> 6) & 3
    val channels = if (mode == 3) 1 else 2
    val kbps = (if (ver == 3) V1Bitrates else V2Bitrates)(layer - 1)(brIdx)
    val sr = SampleRates(ver)(srIdx)
    val (bytes, samples) = layer match {
      case 1 => ((12 * kbps * 1000 / sr + pad) * 4, 384)
      case 2 => (144 * kbps * 1000 / sr + pad, 1152)
      case _ =>
        if (ver == 3) (144 * kbps * 1000 / sr + pad, 1152)
        else (72 * kbps * 1000 / sr + pad, 576) // LSF
    }
    Some((ver, layer, kbps, sr, channels, bytes, samples))
  }

  /** ID3v2.3/2.4 TEXT frames (T*** ids: title/artist/album/encoder…)
    * as id → decoded string — the tag metadata a corpus curation
    * pipeline keys on. Frame sizes are synchsafe in v2.4, plain
    * big-endian in v2.3; text bodies carry a leading encoding byte
    * (0 latin-1, 1 utf-16 BOM, 2 utf-16be, 3 utf-8). Non-text and
    * malformed frames are skipped; never throws. */
  def id3TextFrames(bytes: Array[Byte]): Map[String, String] = {
    if (bytes.length < 10 || bytes(0) != 'I' || bytes(1) != 'D' ||
      bytes(2) != '3') return Map.empty
    val major = bytes(3) & 0xff
    val tagSize = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
      ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
    val end = math.min(10 + tagSize, bytes.length)
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    var p = 10
    while (p + 10 <= end) {
      val id = new String(bytes, p, 4, "ISO-8859-1")
      if (!id.forall(c => c.isUpper || c.isDigit)) p = end // padding
      else {
        val size =
          if (major >= 4)
            ((bytes(p + 4) & 0x7f) << 21) | ((bytes(p + 5) & 0x7f) << 14) |
              ((bytes(p + 6) & 0x7f) << 7) | (bytes(p + 7) & 0x7f)
          else
            ((bytes(p + 4) & 0xff) << 24) | ((bytes(p + 5) & 0xff) << 16) |
              ((bytes(p + 6) & 0xff) << 8) | (bytes(p + 7) & 0xff)
        if (size < 0 || p + 10 + size > end) p = end
        else {
          if (id.startsWith("T") && size >= 1) {
            val enc = bytes(p + 10) & 0xff
            val body = java.util.Arrays.copyOfRange(bytes, p + 11,
              p + 10 + size)
            val cs = enc match {
              case 0 => "ISO-8859-1"
              case 1 => "UTF-16"
              case 2 => "UTF-16BE"
              case _ => "UTF-8"
            }
            val text = new String(body, cs).takeWhile(_ != '\u0000')
            if (text.nonEmpty) out(id) = text
          }
          p += 10 + size
        }
      }
    }
    out.toMap
  }

  /** Walk the whole byte stream; never throws on valid-length input. */
  def census(bytes: Array[Byte]): Mp3Census = {
    var off = 0
    // ID3v2: 'ID3' + ver(2) + flags(1) + 4 synchsafe size bytes
    var id3 = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      val footer = (bytes(5) & 0x10) != 0
      id3 = 10 + size + (if (footer) 10 else 0)
      off = math.min(id3, bytes.length)
    }
    // ID3v1 tail: trailing 128-byte 'TAG' block is not frame data
    val end =
      if (bytes.length >= off + 128 &&
          bytes(bytes.length - 128) == 'T' &&
          bytes(bytes.length - 127) == 'A' &&
          bytes(bytes.length - 126) == 'G') bytes.length - 128
      else bytes.length
    var ver = -1; var layer = 0; var sr = 0; var ch = 0
    var frames = 0; var brMin = Int.MaxValue; var brMax = 0
    var resyncs = 0; var inJunk = false
    var vbrTag = "none"
    var samplesTotal = 0L
    while (off < end) {
      parseHeader(bytes, off) match {
        case Some((v, l, kbps, s, c, flen, samples))
            // lock version/layer/samplerate on the first frame: a
            // "header" disagreeing with the stream is a false sync
            if (ver == -1 || (v == ver && l == layer && s == sr)) &&
              off + flen <= end =>
          if (ver == -1) {
            ver = v; layer = l; sr = s; ch = c
            // Xing/Info ride the FIRST frame at a spec-fixed spot:
            // right after the side info (whose size follows from
            // version/channel mode, plus 2 CRC bytes when the
            // protection bit is clear); VBRI sits at a fixed 32
            // bytes past the header. Checking the exact offset —
            // not substring-searching the whole body — keeps
            // entropy bytes that happen to spell "Info" from
            // flipping a plain CBR file to VBR.
            val crcBytes = if ((bytes(off + 1) & 1) == 0) 2 else 0
            val si =
              if (v == 3) { if (c == 1) 17 else 32 }
              else { if (c == 1) 9 else 17 }
            def tagAt(o: Int, t: String): Boolean =
              o + 4 <= end && o + 4 <= off + flen &&
                bytes(o) == t(0) && bytes(o + 1) == t(1) &&
                bytes(o + 2) == t(2) && bytes(o + 3) == t(3)
            val xingOff = off + 4 + crcBytes + si
            if (tagAt(xingOff, "Xing")) vbrTag = "Xing"
            else if (tagAt(xingOff, "Info")) vbrTag = "Info"
            else if (tagAt(off + 36, "VBRI")) vbrTag = "VBRI"
          }
          frames += 1
          samplesTotal += samples
          brMin = math.min(brMin, kbps); brMax = math.max(brMax, kbps)
          off += flen
          inJunk = false
        case _ =>
          if (!inJunk) { resyncs += 1; inJunk = true }
          off += 1
      }
    }
    val verName = ver match {
      case 3 => "MPEG-1"
      case 2 => "MPEG-2"
      case 0 => "MPEG-2.5"
      case _ => "none"
    }
    Mp3Census(verName, layer, sr, ch, frames,
      if (frames == 0) 0 else brMin, brMax,
      vbr = frames > 0 && (brMin != brMax || vbrTag == "Xing" ||
        vbrTag == "VBRI"),
      vbrTag,
      durationMs = if (sr == 0) 0L else samplesTotal * 1000L / sr,
      id3v2Bytes = id3, resyncs = resyncs,
      trailingBytes = bytes.length - end)
  }

  /** Decode an ARBITRARY real-world MP3 whose granules carry NO
    * entropy-coded data (part2_3_length == 0 everywhere) to its exact
    * PCM: all-zero samples, one granule's worth per granule, at the
    * stream's sample rate and channel count. Returns None the moment
    * any granule carries spectral data.
    *
    * Why this exact boundary: a granule with part2_3_length == 0 has
    * an EMPTY scalefactor+Huffman part, so every spectral coefficient
    * is zero by construction and every conformant decoder—whatever
    * its IMDCT/polyphase implementation—emits exactly silence for it
    * (linear filterbanks map zero input to zero output; the overlap-
    * add state stays zero when every granule is zero). That makes
    * this the one wild-payload class whose SAMPLES this repo can
    * reconstruct bit-exactly without ISO's tabular Huffman codes and
    * 512-tap synthesis window — tables this environment has no
    * verifiable source for and no reference decoder to validate a
    * transcription against (COVERAGE.md interop row). The committed
    * wild fixture (a Lavf/LAME encode of digital silence — q253's
    * census proves p23==0 in all 45 granules) is exactly this class.
    *
    * Parses for real, per ISO 11172-3: ID3v2 skip, ID3v1 tail, frame
    * headers across MPEG-1/2/2.5, full side-info layouts (MPEG-1:
    * 17/32 bytes with 9-bit main_data_begin and scfsi; LSF: 9/17
    * bytes with 8-bit main_data_begin, 9-bit scalefac_compress, no
    * scfsi), window-switching fields at their spec widths, and both
    * granule counts (2 for MPEG-1, 1 for LSF). A Xing/Info/VBRI tag
    * frame is itself an empty-granule frame and decodes as the
    * silence it is. */
  def decodeWild(bytes: Array[Byte]): Option[Audio] = {
    var off = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      val footer = (bytes(5) & 0x10) != 0
      off = math.min(10 + size + (if (footer) 10 else 0), bytes.length)
    }
    val end =
      if (bytes.length >= off + 128 && bytes(bytes.length - 128) == 'T' &&
          bytes(bytes.length - 127) == 'A' &&
          bytes(bytes.length - 126) == 'G') bytes.length - 128
      else bytes.length
    var ver = -1; var sr = 0; var ch = 0
    var totalSamples = 0L
    while (off < end) {
      parseHeader(bytes, off) match {
        case Some((v, layer, _, s, c, flen, samples))
            if (ver == -1 || (v == ver && s == sr && c == ch)) &&
              off + flen <= end =>
          if (layer != 3) return None // Layer I/II: different coding
          if (ver == -1) { ver = v; sr = s; ch = c }
          // side info sits right after the header (+2 CRC bytes when
          // the protection bit is CLEAR)
          val crc = if ((bytes(off + 1) & 1) == 0) 2 else 0
          val br = new BitReader(bytes, off + 4 + crc)
          val lsf = v != 3
          br.bits(if (lsf) 8 else 9) // main_data_begin
          br.bits(if (lsf) (if (c == 1) 1 else 2) else (if (c == 1) 5 else 3))
          if (!lsf) br.bits(4 * c) // scfsi
          val granules = if (lsf) 1 else 2
          var g = 0
          while (g < granules) {
            var chn = 0
            while (chn < c) {
              val p23 = br.bits(12)
              if (p23 != 0) return None // real spectral data: census-only
              br.bits(9) // big_values
              br.bits(8) // global_gain
              br.bits(if (lsf) 9 else 4) // scalefac_compress
              if (br.bits(1) == 1) { // window switching
                br.bits(2); br.bits(1)       // block_type, mixed
                br.bits(5); br.bits(5)       // table_select x2
                br.bits(3); br.bits(3); br.bits(3) // subblock_gain
              } else {
                br.bits(5); br.bits(5); br.bits(5) // table_select x3
                br.bits(4); br.bits(3)       // region counts
              }
              if (!lsf) br.bits(1) // preflag (inside scalefac_compress in LSF)
              br.bits(1) // scalefac_scale
              br.bits(1) // count1table_select
              chn += 1
            }
            g += 1
          }
          totalSamples += samples
          off += flen
        case _ => off += 1 // junk between frames: resync, as in census
      }
    }
    if (ver == -1 || totalSamples == 0L || totalSamples > Int.MaxValue / 4)
      None
    else Some(Audio(sr, ch, new Array[Short]((totalSamples * ch).toInt)))
  }

  // ---- bit I/O (MSB first) --------------------------------------------

  private final class BitReader(data: Array[Byte], startByte: Int) {
    var pos: Int = startByte
    private var bit = 0
    var consumed: Long = 0L // bits read since last resetCount()

    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        require(pos < data.length, "mp3: truncated bitstream")
        v = (v << 1) | ((data(pos) >> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      consumed += n
      v
    }
    def resetCount(): Unit = consumed = 0L
  }

  private final class BitWriter {
    val out = new ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    var written: Long = 0L
    def write(v: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 }
        i -= 1
      }
      written += bits
    }
    def toBytes: Array[Byte] = { if (n > 0) write(0, 8 - n); out.toByteArray }
  }

  // ---- published header tables ---------------------------------------

  /** MPEG-1 Layer III bitrates (kbps) by bitrate_index 1..14. */
  private[graft] val BitrateTable: Array[Int] = Array(
    -1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample rates by sampling_frequency index 0..2. */
  private[graft] val SampleRateTable: Array[Int] = Array(44100, 48000, 32000)

  /** scalefac_compress → (slen1, slen2), the published 16-entry table. */
  private[graft] val SlenTable: Array[(Int, Int)] = Array(
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3))

  private val GranuleSize = 576
  private val FrameSamples = 1152
  private val SubbandCount = 32
  private val SubbandLen = 18
  private val Linbits = 13
  private val EscapeMag = 15
  private val MaxMag = EscapeMag + (1 << Linbits) - 1 // 8206

  // ---- canonical Huffman construction ---------------------------------

  /** Canonical Huffman code from symbol weights: lengths from a
    * deterministic Huffman tree (ties broken by smallest contained
    * symbol), codes assigned canonically by (length, symbol). */
  private final class Canonical(weights: Array[Long]) {
    val n: Int = weights.length
    val lens: Array[Int] = {
      // (weight, minSymbol, symbols) nodes; merge two smallest
      var nodes = weights.zipWithIndex
        .map { case (w, i) => (w, i, List(i)) }.toList
      val depth = Array.fill(n)(0)
      while (nodes.length > 1) {
        val sorted = nodes.sortBy(t => (t._1, t._2))
        val a :: b :: rest = sorted: @unchecked
        (a._3 ++ b._3).foreach(s => depth(s) += 1)
        nodes = (a._1 + b._1, math.min(a._2, b._2), a._3 ++ b._3) :: rest
      }
      if (n == 1) depth(0) = 1
      depth
    }
    val maxLen: Int = lens.max
    // codes are Long: a steep weight distribution can push canonical
    // lengths past 31 bits; 62 is the hard bound for Long-safe codes
    require(maxLen <= 62, s"canonical huffman length $maxLen too deep")
    val codes: Array[Long] = {
      val order = (0 until n).sortBy(s => (lens(s), s))
      val c = new Array[Long](n)
      var code = 0L
      var prevLen = 0
      order.foreach { s =>
        code <<= (lens(s) - prevLen)
        c(s) = code
        code += 1
        prevLen = lens(s)
      }
      c
    }
    // decode acceleration: canonical codes of one length are
    // consecutive, so a (length → symbols-in-code-order) index gives
    // O(1) membership per candidate length
    private val byLen: Array[Array[Int]] = {
      val groups = (0 until n).sortBy(s => (lens(s), s))
        .groupBy(lens).view.mapValues(_.toArray).toMap
      (0 to maxLen).map(l => groups.getOrElse(l, Array.empty[Int])).toArray
    }
    def decode(br: BitReader): Int = {
      var code = 0L
      var len = 0
      while (len < maxLen) {
        code = (code << 1) | br.bits(1)
        len += 1
        val g = byLen(len)
        if (g.nonEmpty) {
          val first = codes(g(0))
          if (code >= first && code - first < g.length)
            return g((code - first).toInt)
        }
      }
      throw new IllegalArgumentException("mp3: invalid huffman code")
    }
  }

  /** Big-value pair table: symbols (x,y) ∈ (0..15)², weight decays with
    * magnitude sum (small spectral values dominate real audio). */
  private val PairTable = new Canonical(
    Array.tabulate(256) { s =>
      val x = s >> 4; val y = s & 15
      math.max(1L, 1L << math.max(0, 30 - 2 * (x + y)))
    })

  /** count1 quadruple table: symbols (v,w,x,y) ∈ {0,1}⁴, weight decays
    * with population count. */
  private val QuadTable = new Canonical(
    Array.tabulate(16) { s =>
      val pc = Integer.bitCount(s)
      math.max(1L, 1L << (8 - 2 * pc))
    })

  /** Exhaustive canonical-table roundtrip (spec hook): every pair and
    * quadruple symbol encodes and decodes back to itself. */
  private[graft] def huffmanSelfTest(): Unit = {
    val bw = new BitWriter
    (0 until 256).foreach(s => bw.write(PairTable.codes(s), PairTable.lens(s)))
    (0 until 16).foreach(s => bw.write(QuadTable.codes(s), QuadTable.lens(s)))
    val br = new BitReader(bw.toBytes, 0)
    (0 until 256).foreach { s =>
      val got = PairTable.decode(br)
      require(got == s, s"pair symbol $s decoded as $got")
    }
    (0 until 16).foreach { s =>
      val got = QuadTable.decode(br)
      require(got == s, s"quad symbol $s decoded as $got")
    }
  }

  // ---- orthonormal DCT (type II) and its inverse ----------------------

  private def dctMatrix(n: Int): Array[Array[Double]] = {
    val m = Array.ofDim[Double](n, n)
    var k = 0
    while (k < n) {
      val a = if (k == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n)
      var i = 0
      while (i < n) {
        m(k)(i) = a * math.cos(math.Pi * (2 * i + 1) * k / (2.0 * n))
        i += 1
      }
      k += 1
    }
    m
  }
  private val Dct32 = dctMatrix(SubbandCount)
  private val Dct18 = dctMatrix(SubbandLen)

  /** 576 PCM → 576 spectral: 18 consecutive 32-blocks through the
    * subband DCT, then each subband's 18 time samples through the
    * temporal DCT. Spectral index = subband·18 + k. */
  private def analyze(x: Array[Double]): Array[Double] = {
    val sub = Array.ofDim[Double](SubbandCount, SubbandLen)
    var t = 0
    while (t < SubbandLen) {
      var k = 0
      while (k < SubbandCount) {
        var acc = 0.0
        var i = 0
        while (i < SubbandCount) {
          acc += Dct32(k)(i) * x(t * SubbandCount + i); i += 1
        }
        sub(k)(t) = acc
        k += 1
      }
      t += 1
    }
    val out = new Array[Double](GranuleSize)
    var sb = 0
    while (sb < SubbandCount) {
      var k = 0
      while (k < SubbandLen) {
        var acc = 0.0
        var i = 0
        while (i < SubbandLen) { acc += Dct18(k)(i) * sub(sb)(i); i += 1 }
        out(sb * SubbandLen + k) = acc
        k += 1
      }
      sb += 1
    }
    out
  }

  /** Exact inverse of [[analyze]] (transposes of the orthonormal DCTs). */
  private def synthesize(spec: Array[Double]): Array[Double] = {
    val sub = Array.ofDim[Double](SubbandCount, SubbandLen)
    var sb = 0
    while (sb < SubbandCount) {
      var i = 0
      while (i < SubbandLen) {
        var acc = 0.0
        var k = 0
        while (k < SubbandLen) {
          acc += Dct18(k)(i) * spec(sb * SubbandLen + k); k += 1
        }
        sub(sb)(i) = acc
        i += 1
      }
      sb += 1
    }
    val out = new Array[Double](GranuleSize)
    var t = 0
    while (t < SubbandLen) {
      var i = 0
      while (i < SubbandCount) {
        var acc = 0.0
        var k = 0
        while (k < SubbandCount) { acc += Dct32(k)(i) * sub(k)(t); k += 1 }
        out(t * SubbandCount + i) = acc
        i += 1
      }
      t += 1
    }
    out
  }

  // ---- quantization (the Layer III power law) -------------------------

  private def stepFor(globalGain: Int): Double =
    math.pow(2.0, (globalGain - 210) / 4.0)

  /** Smallest global_gain whose step keeps every |q| ≤ MaxMag. */
  private def chooseGain(maxAbs: Double): Int = {
    if (maxAbs == 0.0) return 210
    var gg = 0
    while (gg < 255 &&
      math.pow(maxAbs / stepFor(gg), 0.75) > MaxMag - 1) gg += 1
    gg
  }

  private def quantize(x: Double, step: Double): Int = {
    val q = math.round(math.pow(math.abs(x) / step, 0.75)).toInt
    if (x < 0) -math.min(q, MaxMag) else math.min(q, MaxMag)
  }

  private def dequantize(q: Int, step: Double): Double = {
    val m = math.pow(math.abs(q).toDouble, 4.0 / 3.0) * step
    if (q < 0) -m else m
  }

  // ---- granule bitstream ----------------------------------------------

  private final case class GranuleInfo(
      part23Length: Int, bigValues: Int, globalGain: Int,
      scalefacCompress: Int, tableSelect: Array[Int],
      region0Count: Int, region1Count: Int, count1Table: Int)

  /** Encode one granule's quantized spectrum; returns (info, bits). */
  private def encodeGranule(q: Array[Int], gain: Int): (GranuleInfo, BitWriter) = {
    // zone boundaries: last nonzero, then last value outside ±1
    var lastNz = GranuleSize - 1
    while (lastNz >= 0 && q(lastNz) == 0) lastNz -= 1
    var lastBig = lastNz
    while (lastBig >= 0 && math.abs(q(lastBig)) <= 1) lastBig -= 1
    // big_values region is pair-aligned; count1 quadruple-aligned
    val bigEnd = ((lastBig + 2) / 2) * 2 // exclusive, even
    val count1End =
      math.min(GranuleSize, bigEnd + ((lastNz + 1 - bigEnd + 3) / 4) * 4)
    val bigValues = bigEnd / 2
    val needEscape = q.exists(v => math.abs(v) > EscapeMag)
    val tableId = if (bigValues == 0) 0 else if (needEscape) 24 else 15
    val bw = new BitWriter
    // big-value pairs: magnitude symbol, linbits escape, sign bits
    var i = 0
    while (i < bigEnd) {
      val xv = q(i); val yv = q(i + 1)
      val xm = math.min(math.abs(xv), EscapeMag)
      val ym = math.min(math.abs(yv), EscapeMag)
      val sym = (xm << 4) | ym
      bw.write(PairTable.codes(sym), PairTable.lens(sym))
      if (tableId == 24 && xm == EscapeMag)
        bw.write(math.abs(xv) - EscapeMag, Linbits)
      if (xv != 0) bw.write(if (xv < 0) 1 else 0, 1)
      if (tableId == 24 && ym == EscapeMag)
        bw.write(math.abs(yv) - EscapeMag, Linbits)
      if (yv != 0) bw.write(if (yv < 0) 1 else 0, 1)
      i += 2
    }
    // count1 quadruples (canonical table, select bit 0)
    i = bigEnd
    while (i < count1End) {
      var sym = 0
      var j = 0
      while (j < 4) {
        if (i + j < GranuleSize && q(i + j) != 0) sym |= 1 << (3 - j)
        j += 1
      }
      bw.write(QuadTable.codes(sym), QuadTable.lens(sym))
      j = 0
      while (j < 4) {
        if (i + j < GranuleSize && q(i + j) != 0)
          bw.write(if (q(i + j) < 0) 1 else 0, 1)
        j += 1
      }
      i += 4
    }
    // region partition in pair units (documented deviation): spread
    // big_values across the three regions so all three table_select
    // fields are genuinely exercised on decode
    val r0 = if (bigValues == 0) 0 else math.min(15, (bigValues - 1) / 3)
    val n0 = math.min(bigValues, r0 + 1)
    val r1 = if (bigValues - n0 <= 0) 0
      else math.min(7, (bigValues - n0 - 1) / 2)
    (GranuleInfo(bw.written.toInt, bigValues, gain, 0,
      Array(tableId, tableId, tableId), r0, r1, 0), bw)
  }

  /** Decode one granule from the bit reader; `info` drives zone sizes,
    * tables, and the requantization step. Verifies part2_3_length. */
  private def decodeGranule(br: BitReader, info: GranuleInfo): Array[Double] = {
    br.resetCount()
    // scalefactors: slen bits per factor — zero bits at compress 0,
    // but the table lookup is real
    val (slen1, slen2) = SlenTable(info.scalefacCompress)
    var sf = 0
    while (sf < 11) { if (slen1 > 0) br.bits(slen1); sf += 1 }
    while (sf < 21) { if (slen2 > 0) br.bits(slen2); sf += 1 }
    val q = new Array[Int](GranuleSize)
    val bigEnd = info.bigValues * 2
    require(bigEnd <= GranuleSize, "mp3: big_values exceeds granule")
    // regions in pair units; each region's table honored
    val n0 = math.min(info.bigValues, info.region0Count + 1)
    val n1 = math.min(info.bigValues - n0, info.region1Count + 1)
    var pair = 0
    while (pair < info.bigValues) {
      val region = if (pair < n0) 0 else if (pair < n0 + n1) 1 else 2
      val tableId = info.tableSelect(region)
      require(tableId == 0 || tableId == 15 || tableId == 24,
        s"mp3: unsupported huffman table $tableId")
      val i = pair * 2
      if (tableId == 0) { q(i) = 0; q(i + 1) = 0 }
      else {
        val sym = PairTable.decode(br)
        var xm = sym >> 4
        var ym = sym & 15
        if (tableId == 24 && xm == EscapeMag) xm += br.bits(Linbits)
        if (xm != 0 && br.bits(1) == 1) xm = -xm
        if (tableId == 24 && ym == EscapeMag) ym += br.bits(Linbits)
        if (ym != 0 && br.bits(1) == 1) ym = -ym
        q(i) = xm; q(i + 1) = ym
      }
      pair += 1
    }
    // count1: quadruples until part2_3_length is exhausted; the final
    // quadruple may straddle the granule end (encoder emits phantom
    // zero positions there — mirror its in-bounds guard exactly)
    var i = bigEnd
    while (br.consumed < info.part23Length && i < GranuleSize) {
      val sym =
        if (info.count1Table == 1) br.bits(4) // literal 4-bit table
        else QuadTable.decode(br)
      var j = 0
      while (j < 4) {
        if (i + j < GranuleSize && (sym & (1 << (3 - j))) != 0)
          q(i + j) = if (br.bits(1) == 1) -1 else 1
        j += 1
      }
      i += 4
    }
    require(br.consumed == info.part23Length,
      s"mp3: granule consumed ${br.consumed} bits, " +
        s"part2_3_length says ${info.part23Length}")
    val step = stepFor(info.globalGain)
    val spec = new Array[Double](GranuleSize)
    i = 0
    while (i < GranuleSize) { spec(i) = dequantize(q(i), step); i += 1 }
    synthesize(spec)
  }

  // ---- frame assembly --------------------------------------------------

  /** Encode mono 16-bit PCM as Layer III frames. Sample rate must be an
    * MPEG-1 rate (44100/48000/32000). The tail frame zero-pads to 1152
    * samples (inherent to the frame structure, as in real MP3). */
  def encode(a: Audio): Array[Byte] = {
    require(a.channels == 1, "mp3 codec: mono only")
    val srIdx = SampleRateTable.indexOf(a.sampleRate)
    require(srIdx >= 0,
      s"mp3 codec: ${a.sampleRate} Hz is not an MPEG-1 rate")
    val out = new ByteArrayOutputStream()
    val nFrames = math.max(1, (a.samples.length + FrameSamples - 1) / FrameSamples)
    var f = 0
    while (f < nFrames) {
      val pcm = new Array[Double](FrameSamples)
      var i = 0
      while (i < FrameSamples) {
        val s = f * FrameSamples + i
        pcm(i) = if (s < a.samples.length) a.samples(s).toDouble else 0.0
        i += 1
      }
      // per-granule: analyze → rate loop (the ISO outer iteration —
      // raise global_gain, coarsening the quantizer, until the
      // entropy-coded granule fits the largest frame)
      def codeGranule(g: Int): (GranuleInfo, BitWriter) = {
        val spec = analyze(java.util.Arrays.copyOfRange(
          pcm, g * GranuleSize, (g + 1) * GranuleSize))
        val maxFrameBytes = 144 * (BitrateTable(14) * 1000) / a.sampleRate
        // two hard caps: half the max frame's main data, AND the 12-bit
        // part2_3_length field itself (4095 bits) — exceeding the field
        // width would silently truncate the value on write
        val granuleBudget =
          math.min((maxFrameBytes - 4 - 17) * 8 / 2, 4095)
        var gain = chooseGain(spec.map(math.abs).max)
        var attempt = encodeGranule(
          spec.map(quantize(_, stepFor(gain))), gain)
        while (attempt._2.written > granuleBudget && gain < 255) {
          gain = math.min(255, gain + 4)
          attempt = encodeGranule(
            spec.map(quantize(_, stepFor(gain))), gain)
        }
        require(attempt._2.written <= granuleBudget,
          "mp3 codec: granule does not fit even at global_gain 255")
        attempt
      }
      val granules = (0 until 2).map(codeGranule)
      val mainBits = granules.map(_._2.written).sum
      val mainBytes = ((mainBits + 7) / 8).toInt
      // smallest bitrate whose frame holds header+side+main data
      val needed = 4 + 17 + mainBytes
      var brIdx = 1
      def frameLen(idx: Int, pad: Int): Int =
        144 * (BitrateTable(idx) * 1000) / a.sampleRate + pad
      while (brIdx < 14 && frameLen(brIdx, 0) < needed) brIdx += 1
      val pad = if (frameLen(brIdx, 0) < needed) 1 else 0
      val total = frameLen(brIdx, pad)
      require(total >= needed,
        s"mp3 codec: granule data ($needed B) exceeds max frame ($total B)")
      val bw = new BitWriter
      // header
      bw.write(0x7ff, 11) // sync
      bw.write(3, 2)      // version: MPEG-1
      bw.write(1, 2)      // layer III
      bw.write(1, 1)      // protection off (no CRC16)
      bw.write(brIdx, 4)
      bw.write(srIdx, 2)
      bw.write(pad, 1)
      bw.write(0, 1)      // private
      bw.write(3, 2)      // mode: mono
      bw.write(0, 2)      // mode extension
      bw.write(0, 1)      // copyright
      bw.write(1, 1)      // original
      bw.write(0, 2)      // emphasis
      // side info (mono: 17 bytes)
      bw.write(0, 9)      // main_data_begin: no bit reservoir
      bw.write(0, 5)      // private
      bw.write(0, 4)      // scfsi
      granules.foreach { case (gi, _) =>
        bw.write(gi.part23Length, 12)
        bw.write(gi.bigValues, 9)
        bw.write(gi.globalGain, 8)
        bw.write(gi.scalefacCompress, 4)
        bw.write(0, 1)    // window_switching off
        gi.tableSelect.foreach(t => bw.write(t, 5))
        bw.write(gi.region0Count, 4)
        bw.write(gi.region1Count, 3)
        bw.write(0, 1)    // preflag
        bw.write(0, 1)    // scalefac_scale
        bw.write(gi.count1Table, 1)
      }
      granules.foreach { case (_, gbw) =>
        // capture the true bit count BEFORE toBytes pads to a byte
        // boundary (the pad would otherwise replay between granules)
        val wholeBits = gbw.written
        val bytes = gbw.toBytes
        // replay the granule bits into the frame writer
        var bi = 0L
        while (bi < wholeBits) {
          val b = (bytes((bi / 8).toInt) >> (7 - (bi % 8).toInt)) & 1
          bw.write(b, 1)
          bi += 1
        }
      }
      val frame = bw.toBytes
      out.write(frame)
      // ancillary zero-fill to the exact frame length
      var fill = total - frame.length
      while (fill > 0) { out.write(0); fill -= 1 }
      f += 1
    }
    out.toByteArray
  }

  /** Decode a stream of Layer III frames to PCM. Output length is
    * nFrames·1152 (the tail frame's zero-pad is part of the stream, as
    * with any MP3 without gapless metadata). */
  def decode(bytes: Array[Byte]): Audio = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xe0) == 0xe0, "not an mp3 frame stream")
    val samples = new scala.collection.mutable.ArrayBuffer[Short]()
    var sampleRate = 0
    var off = 0
    while (off + 4 <= bytes.length) {
      val br = new BitReader(bytes, off)
      require(br.bits(11) == 0x7ff, s"mp3: lost sync at byte $off")
      require(br.bits(2) == 3, "mp3: MPEG-1 only")
      require(br.bits(2) == 1, "mp3: Layer III only")
      val protection = br.bits(1)
      require(protection == 1, "mp3: CRC-protected frames unsupported")
      val brIdx = br.bits(4)
      require(brIdx >= 1 && brIdx <= 14, s"mp3: bad bitrate index $brIdx")
      val srIdx = br.bits(2)
      require(srIdx < 3, s"mp3: bad sample-rate index $srIdx")
      val pad = br.bits(1)
      br.bits(1) // private
      val mode = br.bits(2)
      require(mode == 3, "mp3: mono streams only")
      br.bits(2); br.bits(1); br.bits(1); br.bits(2) // modeext/copy/orig/emph
      val sr = SampleRateTable(srIdx)
      require(sampleRate == 0 || sampleRate == sr,
        "mp3: sample rate changed mid-stream")
      sampleRate = sr
      val total = 144 * (BitrateTable(brIdx) * 1000) / sr + pad
      require(off + total <= bytes.length,
        s"mp3: frame at $off claims $total bytes past end of stream")
      // side info
      val mdb = br.bits(9)
      require(mdb == 0, "mp3: bit-reservoir streams unsupported")
      br.bits(5) // private
      br.bits(4) // scfsi
      val infos = (0 until 2).map { _ =>
        val p23 = br.bits(12)
        val bv = br.bits(9)
        val gg = br.bits(8)
        val sfc = br.bits(4)
        val wsf = br.bits(1)
        require(wsf == 0, "mp3: window-switched granules unsupported")
        val ts = Array(br.bits(5), br.bits(5), br.bits(5))
        val r0 = br.bits(4)
        val r1 = br.bits(3)
        br.bits(1) // preflag
        br.bits(1) // scalefac_scale
        val c1t = br.bits(1)
        GranuleInfo(p23, bv, gg, sfc, ts, r0, r1, c1t)
      }
      infos.foreach { gi =>
        val pcm = decodeGranule(br, gi)
        var i = 0
        while (i < GranuleSize) {
          val v = math.round(pcm(i))
          samples += math.max(-32768L, math.min(32767L, v)).toShort
          i += 1
        }
      }
      off += total
    }
    Audio(sampleRate, 1, samples.toArray)
  }
}
