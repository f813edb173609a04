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

  /** A decoded video: constant frame rate, constant dimensions. */
  final case class Video(fps: Int, width: Int, height: Int,
      frames: Vector[MediaCodecs.Image])

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
    * RIFF pad byte; idx1 carries one keyframe entry per frame (every
    * MJPEG frame is independently decodable). */
  def encodeAviMjpeg(fps: Int, frames: Seq[MediaCodecs.Image],
      quality: Int = 90, subsample420: Boolean = false): Array[Byte] = {
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
      w32(o, 1) // dwStreams
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
    val hdrl = list("hdrl") { o =>
      o.write(chunk("avih", avih))
      o.write(list("strl") { s =>
        s.write(chunk("strh", strh))
        s.write(chunk("strf", strf))
      })
    }
    // movi chunks, tracking each frame's offset relative to the movi
    // list's 'movi' fourcc (the idx1 offset convention)
    val moviInner = new ByteArrayOutputStream()
    val offsets = encoded.map { jpg =>
      val off = moviInner.size() + 4 // +4: offsets count from 'movi'
      moviInner.write(chunk("00dc", jpg))
      off
    }
    val movi = {
      val o = new ByteArrayOutputStream()
      wcc(o, "LIST"); w32(o, moviInner.size() + 4); wcc(o, "movi")
      o.write(moviInner.toByteArray)
      o.toByteArray
    }
    val idx1 = {
      val o = new ByteArrayOutputStream()
      encoded.zip(offsets).foreach { case (jpg, off) =>
        wcc(o, "00dc")
        w32(o, 0x10) // AVIIF_KEYFRAME
        w32(o, off)
        w32(o, jpg.length)
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
    val frames = Vector.newBuilder[MediaCodecs.Image]
    var nChunks = 0
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
            if (fccType == "vids") {
              sawVids = true
              sawMjpg = cc(bytes, body + 4) == "MJPG"
              scale = i32(bytes, body + 20)
              rate = i32(bytes, body + 24)
              strhLen = i32(bytes, body + 32)
            }
          case "strf" =>
            if (strfW < 0 && size >= 40) {
              strfW = i32(bytes, body + 4)
              strfH = i32(bytes, body + 8)
            }
          case "00dc" | "00db" =>
            frames += JpegCodec.decode(
              java.util.Arrays.copyOfRange(bytes, body, body + size))
            nChunks += 1
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
    require(idxEntries < 0 || idxEntries == fs.size,
      s"idx1 carries $idxEntries entries for ${fs.size} frames")
    require(fs.forall(f => f.width == strfW && f.height == strfH),
      "decoded frame dimensions disagree with strf header")
    require(avihW == strfW && avihH == strfH,
      "avih and strf dimensions disagree")
    require(scale > 0 && rate > 0 && rate % scale == 0,
      s"non-integral frame rate $rate/$scale")
    Video(rate / scale, strfW, strfH, fs)
  }
}
