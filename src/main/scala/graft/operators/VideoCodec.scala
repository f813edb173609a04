package graft.operators

import java.io.ByteArrayOutputStream

/** Pure-JVM video codec: Motion JPEG in an AVI (RIFF) container — the
  * classic camera/capture format, built entirely from the public
  * Microsoft RIFF/AVI layout ('RIFF…AVI ', LIST hdrl with avih/strh/
  * strf, LIST movi with 00dc frame chunks, idx1 index) with every frame
  * a real baseline JPEG through [[JpegCodec]].
  *
  * This retires the repo's last media stub family: video payloads now
  * decode through an actual container walk + per-frame entropy decode,
  * with the header fields load-bearing — the decoder cross-checks the
  * avih frame count, the strh 'vids'/'MJPG' tags, the strf dimensions
  * against every decoded frame, and the idx1 entry count, so a single
  * corrupted byte in header, index, or any frame's huffman stream fails
  * the decode (and sniff-routing degrades that payload to opaque stats,
  * never the whole query). Codecs this walker cannot parse (H.264 in
  * MP4, …) simply don't sniff as "avi" and take the opaque path — a
  * fallback, not a fake.
  *
  * Reference analog: none — OEDS stores no media
  * (open-energy-data-server has only relational/geo tables); this is
  * part of the training-data-pipeline extension layer.
  */
object VideoCodec {

  /** A decoded video: constant frame rate, constant dimensions, plus
    * the interleaved PCM audio track when the container carries one
    * (dual-stream AVI: 'vids' + 'auds'). */
  final case class Video(fps: Int, width: Int, height: Int,
      frames: Vector[MediaCodecs.Image],
      audio: Option[MediaCodecs.Audio] = None)

  // ---- little-endian byte helpers -------------------------------------

  private def w16(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def w32(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
    o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
  }
  private def wcc(o: ByteArrayOutputStream, cc: String): Unit = {
    require(cc.length == 4); cc.foreach(c => o.write(c.toInt & 0xff))
  }
  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def cc(b: Array[Byte], off: Int): String =
    new String(Array(b(off), b(off + 1), b(off + 2), b(off + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  /** Encode frames as MJPEG-in-AVI at a constant `fps` (strh scale=1,
    * rate=fps). All frames must share dimensions (AVI is a
    * constant-geometry container). Odd-sized JPEG chunks get the
    * RIFF pad byte; idx1 carries one keyframe entry per chunk (every
    * MJPEG frame is independently decodable).
    *
    * With `audio` set, the container becomes a dual-stream AVI
    * ('vids' + 'auds', avih dwStreams=2): the PCM-16 track is split
    * into one '01wb' chunk per video frame and interleaved after each
    * '00dc' — the layout real muxers produce so players can stream
    * A/V in lockstep. */
  def encodeAviMjpeg(fps: Int, frames: Seq[MediaCodecs.Image],
      quality: Int = 90, subsample420: Boolean = false,
      audio: Option[MediaCodecs.Audio] = None): Array[Byte] = {
    require(frames.nonEmpty, "AVI needs at least one frame")
    require(fps > 0, s"fps must be positive, got $fps")
    val w = frames.head.width; val h = frames.head.height
    require(frames.forall(f => f.width == w && f.height == h),
      "all AVI frames must share dimensions")
    val encoded = frames.map(f =>
      JpegCodec.encode(f, quality, subsample420)).toVector
    val maxChunk = encoded.map(_.length).max

    def list(listType: String)(body: ByteArrayOutputStream => Unit)
        : Array[Byte] = {
      val inner = new ByteArrayOutputStream()
      body(inner)
      val o = new ByteArrayOutputStream()
      wcc(o, "LIST"); w32(o, inner.size() + 4); wcc(o, listType)
      o.write(inner.toByteArray)
      o.toByteArray
    }
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      wcc(o, id); w32(o, data.length); o.write(data, 0, data.length)
      if ((data.length & 1) == 1) o.write(0) // RIFF even-byte padding
      o.toByteArray
    }

    // avih — MainAVIHeader (56 bytes)
    val avih = {
      val o = new ByteArrayOutputStream()
      w32(o, 1000000 / fps) // dwMicroSecPerFrame
      w32(o, maxChunk * fps) // dwMaxBytesPerSec
      w32(o, 0) // dwPaddingGranularity
      w32(o, 0x10) // dwFlags: AVIF_HASINDEX
      w32(o, frames.size) // dwTotalFrames
      w32(o, 0) // dwInitialFrames
      w32(o, if (audio.isDefined) 2 else 1) // dwStreams
      w32(o, maxChunk) // dwSuggestedBufferSize
      w32(o, w); w32(o, h)
      (0 until 4).foreach(_ => w32(o, 0)) // dwReserved
      o.toByteArray
    }
    // strh — AVIStreamHeader (56 bytes)
    val strh = {
      val o = new ByteArrayOutputStream()
      wcc(o, "vids"); wcc(o, "MJPG")
      w32(o, 0) // dwFlags
      w16(o, 0); w16(o, 0) // wPriority, wLanguage
      w32(o, 0) // dwInitialFrames
      w32(o, 1) // dwScale
      w32(o, fps) // dwRate → fps = rate/scale
      w32(o, 0) // dwStart
      w32(o, frames.size) // dwLength (in frames)
      w32(o, maxChunk) // dwSuggestedBufferSize
      w32(o, -1) // dwQuality (default)
      w32(o, 0) // dwSampleSize (0 = varying)
      w16(o, 0); w16(o, 0); w16(o, w); w16(o, h) // rcFrame
      o.toByteArray
    }
    // strf — BITMAPINFOHEADER (40 bytes), biCompression = 'MJPG'
    val strf = {
      val o = new ByteArrayOutputStream()
      w32(o, 40); w32(o, w); w32(o, h)
      w16(o, 1); w16(o, 24) // biPlanes, biBitCount
      wcc(o, "MJPG") // biCompression fourcc
      w32(o, w * h * 3) // biSizeImage (nominal)
      w32(o, 0); w32(o, 0); w32(o, 0); w32(o, 0)
      o.toByteArray
    }
    // auds strh + WAVEFORMATEX strf for the optional PCM track
    val audStrl = audio.map { a =>
      require(a.channels > 0 && a.sampleRate > 0, "degenerate audio")
      val sh = new ByteArrayOutputStream()
      wcc(sh, "auds"); w32(sh, 0) // fccHandler 0 = raw PCM
      w32(sh, 0) // dwFlags
      w16(sh, 0); w16(sh, 0)
      w32(sh, 0) // dwInitialFrames
      w32(sh, 1) // dwScale
      w32(sh, a.sampleRate) // dwRate → samples/s
      w32(sh, 0) // dwStart
      w32(sh, a.samples.length / a.channels) // dwLength (sample blocks)
      w32(sh, a.sampleRate * a.channels * 2) // dwSuggestedBufferSize
      w32(sh, -1); w32(sh, a.channels * 2) // dwQuality, dwSampleSize
      w16(sh, 0); w16(sh, 0); w16(sh, 0); w16(sh, 0) // rcFrame unused
      val sf = new ByteArrayOutputStream()
      w16(sf, 1) // wFormatTag = WAVE_FORMAT_PCM
      w16(sf, a.channels)
      w32(sf, a.sampleRate)
      w32(sf, a.sampleRate * a.channels * 2) // nAvgBytesPerSec
      w16(sf, a.channels * 2); w16(sf, 16) // nBlockAlign, wBitsPerSample
      list("strl") { s =>
        s.write(chunk("strh", sh.toByteArray))
        s.write(chunk("strf", sf.toByteArray))
      }
    }
    val hdrl = list("hdrl") { o =>
      o.write(chunk("avih", avih))
      o.write(list("strl") { s =>
        s.write(chunk("strh", strh))
        s.write(chunk("strf", strf))
      })
      audStrl.foreach(o.write)
    }
    // Audio split into one chunk per video frame (even sample-block
    // boundaries via floor(k·n/F)), interleaved after each '00dc' —
    // constant-rate interleave, the muxer's job.
    val audChunks: Vector[Array[Byte]] = audio match {
      case None => Vector.empty
      case Some(a) =>
        val blocks = a.samples.length / a.channels
        val nF = frames.size
        (0 until nF).map { k =>
          val from = (k.toLong * blocks / nF).toInt * a.channels
          val to = ((k + 1).toLong * blocks / nF).toInt * a.channels
          val o = new ByteArrayOutputStream()
          (from until to).foreach(i => w16(o, a.samples(i) & 0xffff))
          o.toByteArray
        }.toVector
    }
    // movi chunks, tracking each chunk's id/offset/size relative to
    // the movi list's 'movi' fourcc (the idx1 offset convention)
    val moviInner = new ByteArrayOutputStream()
    val index = Vector.newBuilder[(String, Int, Int)]
    encoded.zipWithIndex.foreach { case (jpg, k) =>
      index += (("00dc", moviInner.size() + 4, jpg.length))
      moviInner.write(chunk("00dc", jpg))
      if (audChunks.nonEmpty) {
        val ac = audChunks(k)
        index += (("01wb", moviInner.size() + 4, ac.length))
        moviInner.write(chunk("01wb", ac))
      }
    }
    val movi = {
      val o = new ByteArrayOutputStream()
      wcc(o, "LIST"); w32(o, moviInner.size() + 4); wcc(o, "movi")
      o.write(moviInner.toByteArray)
      o.toByteArray
    }
    val idx1 = {
      val o = new ByteArrayOutputStream()
      index.result().foreach { case (id, off, len) =>
        wcc(o, id)
        w32(o, if (id == "00dc") 0x10 else 0) // AVIIF_KEYFRAME on video
        w32(o, off)
        w32(o, len)
      }
      chunk("idx1", o.toByteArray)
    }
    val riffInner = new ByteArrayOutputStream()
    wcc(riffInner, "AVI ")
    riffInner.write(hdrl)
    riffInner.write(movi)
    riffInner.write(idx1)
    val out = new ByteArrayOutputStream()
    wcc(out, "RIFF"); w32(out, riffInner.size())
    out.write(riffInner.toByteArray)
    out.toByteArray
  }

  /** Decode an MJPEG AVI. Strict: header/index fields are cross-checked
    * against the decoded stream (frame count, dimensions, stream type),
    * so corrupt containers fail loudly — the sniff-routing layer above
    * ([[MediaCodecs.decodeVideo]]) turns that into the opaque fallback
    * per payload. */
  def decode(bytes: Array[Byte]): Video = {
    require(bytes.length >= 12 && cc(bytes, 0) == "RIFF" &&
      cc(bytes, 8) == "AVI ", "not a RIFF AVI")
    val riffEnd = math.min(bytes.length.toLong, 8L + i32(bytes, 4)).toInt

    var totalFrames = -1; var avihW = -1; var avihH = -1
    var scale = 0; var rate = 0; var strhLen = -1
    var sawVids = false; var sawMjpg = false
    var strfW = -1; var strfH = -1
    // optional 'auds' stream state
    var sawAuds = false; var audScale = 0; var audRate = 0
    var audLen = -1; var audChannels = -1; var audSps = -1
    var audFmt = -1; var audBits = -1
    var pendingStrh = "" // which stream the next strf describes
    val frames = Vector.newBuilder[MediaCodecs.Image]
    val audioBytes = new ByteArrayOutputStream()
    var nChunks = 0
    var nAudChunks = 0
    var idxEntries = -1

    def walk(from: Int, to: Int): Unit = {
      var p = from
      while (p + 8 <= to) {
        val id = cc(bytes, p)
        val size = i32(bytes, p + 4)
        require(size >= 0 && p + 8 + size <= to,
          s"chunk $id overruns container")
        val body = p + 8
        if (id == "LIST") {
          require(size >= 4, "LIST too small")
          walk(body + 4, body + size)
        } else id match {
          case "avih" =>
            require(size >= 40, "avih too small")
            totalFrames = i32(bytes, body + 16)
            avihW = i32(bytes, body + 32)
            avihH = i32(bytes, body + 36)
          case "strh" =>
            val fccType = cc(bytes, body)
            pendingStrh = fccType
            if (fccType == "vids") {
              sawVids = true
              sawMjpg = cc(bytes, body + 4) == "MJPG"
              scale = i32(bytes, body + 20)
              rate = i32(bytes, body + 24)
              strhLen = i32(bytes, body + 32)
            } else if (fccType == "auds") {
              sawAuds = true
              audScale = i32(bytes, body + 20)
              audRate = i32(bytes, body + 24)
              audLen = i32(bytes, body + 32)
            }
          case "strf" =>
            if (pendingStrh == "vids" && strfW < 0 && size >= 40) {
              strfW = i32(bytes, body + 4)
              strfH = i32(bytes, body + 8)
            } else if (pendingStrh == "auds" && size >= 16) {
              audFmt = u16le(bytes, body)
              audChannels = u16le(bytes, body + 2)
              audSps = i32(bytes, body + 4)
              audBits = u16le(bytes, body + 14)
            }
          case "00dc" | "00db" =>
            frames += JpegCodec.decode(
              java.util.Arrays.copyOfRange(bytes, body, body + size))
            nChunks += 1
          case "01wb" =>
            audioBytes.write(bytes, body, size)
            nAudChunks += 1
          case "idx1" =>
            idxEntries = size / 16
          case _ => () // unknown chunk: skip, as RIFF requires
        }
        p = body + size + (size & 1) // even-byte alignment
      }
    }
    walk(12, riffEnd)

    val fs = frames.result()
    require(sawVids && sawMjpg, "no MJPG video stream header")
    require(fs.nonEmpty, "no frame chunks in movi")
    require(totalFrames == fs.size,
      s"avih dwTotalFrames $totalFrames != ${fs.size} decoded frames")
    require(strhLen == fs.size,
      s"strh dwLength $strhLen != ${fs.size} decoded frames")
    require(idxEntries < 0 || idxEntries == fs.size + nAudChunks,
      s"idx1 carries $idxEntries entries for ${fs.size} video + " +
        s"$nAudChunks audio chunks")
    require(fs.forall(f => f.width == strfW && f.height == strfH),
      "decoded frame dimensions disagree with strf header")
    require(avihW == strfW && avihH == strfH,
      "avih and strf dimensions disagree")
    require(scale > 0 && rate > 0 && rate % scale == 0,
      s"non-integral frame rate $rate/$scale")

    val audio =
      if (!sawAuds) {
        require(nAudChunks == 0, "audio chunks without an auds header")
        None
      } else {
        val raw = audioBytes.toByteArray
        require(audFmt == 1 && audBits == 16,
          s"unsupported audio format tag=$audFmt bits=$audBits (PCM-16 only)")
        require(audChannels > 0 && audSps > 0, "degenerate WAVEFORMATEX")
        require(audScale > 0 && audRate % audScale == 0 &&
          audRate / audScale == audSps,
          s"strh rate ${audRate}/${audScale} disagrees with strf $audSps")
        require(raw.length % (2 * audChannels) == 0,
          "audio byte stream not block-aligned")
        val samples = new Array[Short](raw.length / 2)
        var i = 0
        while (i < samples.length) {
          samples(i) = ((raw(2 * i) & 0xff) |
            ((raw(2 * i + 1) & 0xff) << 8)).toShort
          i += 1
        }
        require(audLen == samples.length / audChannels,
          s"strh dwLength $audLen != ${samples.length / audChannels} " +
            "decoded sample blocks")
        Some(MediaCodecs.Audio(audSps, audChannels, samples))
      }
    Video(rate / scale, strfW, strfH, fs, audio)
  }

  private def u16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
}
