package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Pure-JVM media codecs — one honest format per modality, so the
  * multimodal pipeline exercises REAL byte-level decoding without any
  * external codec library:
  *
  *  - BMP: 24-bit uncompressed BI_RGB (BITMAPFILEHEADER +
  *    BITMAPINFOHEADER), bottom-up or top-down rows, 4-byte row padding.
  *  - PPM: binary P6, maxval 255, whitespace/comment-tolerant header.
  *  - WAV: RIFF/WAVE PCM 16-bit, chunk-walking parser (unknown chunks
  *    like LIST are skipped, as the spec requires).
  *
  * JPEG (baseline DCT) is REAL too, in [[JpegCodec]], as are FLAC
  * ([[FlacCodec]]), MPEG-1 Layer III audio ([[Mp3Codec]] — real
  * frame/side-info/Huffman bitstream, documented repo-canonical
  * tables) and MJPEG-in-AVI video ([[VideoCodec]] — real RIFF
  * container walk + per-frame JPEG entropy decode). Every modality now
  * has at least one real codec; payloads in formats outside this set
  * (H.264-in-MP4, arithmetic-coded JPEG, LPC FLAC, …) don't sniff or don't
  * decode and degrade per-payload to the deterministic opaque path —
  * a fallback, not a fake. All functions are executor-side pure byte
  * transforms.
  */
object MediaCodecs {

  final case class Image(width: Int, height: Int, rgb: Array[Byte])
  final case class Audio(sampleRate: Int, channels: Int,
      samples: Array[Short])

  /** Absolute pixel ceiling for any decoded image (~32 Mpixel ≈
    * 100 MiB rgb). Ratio-based bomb guards bound expansion relative
    * to file size, but a few-hundred-KiB crafted file can still
    * claim ~2 GiB of pixels inside those ratios; with 32 decode
    * tasks per executor that is fatal. Real corpus images sit far
    * below this; also keeps width*height*3 inside Int. */
  private[operators] val MaxImagePixels: Long = 32L * 1024 * 1024

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G',
    0x0d, 0x0a, 0x1a, 0x0a)

  /** Identify a payload by magic bytes. */
  def sniff(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') Some("bmp")
    else if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6')
      Some("ppm")
    else if (bytes.length >= 13 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8' &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a') Some("gif")
    else if (bytes.length >= 8 && bytes.take(8).sameElements(PngSig))
      Some("png")
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) Some("jpeg")
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
      bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') Some("wav")
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'A' &&
      bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' ') Some("avi")
    else if (WebpCodec.sniff(bytes)) Some("webp")
    else if (bytes.length >= 12 && bytes(0) == 'F' && bytes(1) == 'O' &&
      bytes(2) == 'R' && bytes(3) == 'M' && bytes(8) == 'A' &&
      bytes(9) == 'I' && bytes(10) == 'F' && bytes(11) == 'F') Some("aiff")
    else if (bytes.length >= 24 && bytes(0) == '.' && bytes(1) == 's' &&
      bytes(2) == 'n' && bytes(3) == 'd') Some("au")
    else if (bytes.length >= 4 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C') Some("flac")
    // MPEG-1 Layer III frame sync: FF FA (CRC) / FF FB (no CRC) —
    // checked after JPEG, whose FF D8 FF prefix cannot collide
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xfe) == 0xfa) Some("mp3")
    // ID3v2-tagged MP3 (how wild MP3s usually open); the frame sync
    // follows the tag, located by Mp3Codec's census/decode walk
    else if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
      bytes(2) == '3') Some("mp3")
    // ISO-BMFF (MP4/MOV/3GP…): every conformant file opens with an
    // ftyp box — size(4) then 'ftyp'. Frames don't decode (AVC/HEVC),
    // but Mp4Census yields full container metadata.
    else if (bytes.length >= 12 && bytes(4) == 'f' && bytes(5) == 't' &&
      bytes(6) == 'y' && bytes(7) == 'p') Some("mp4")
    else None

  /** Run a decode thunk, mapping ANY failure to None: a sniffable
    * magic does not guarantee a decodable payload (arithmetic-coded
    * JPEG sniffs as jpeg, LPC-predicted FLAC sniffs as flac, a truncated
    * BMP sniffs as bmp), and the pipeline contract is "decode what we
    * can, fall back deterministically for the rest" — one exotic
    * payload must degrade to the opaque path, not fail a corpus-wide
    * query. The per-format decoders themselves stay loud (their
    * `require`s are what the specs exercise); only this sniff-routing
    * layer absorbs the failure. */
  private def tryDecode[A](body: => A): Option[A] =
    try Some(body) catch { case scala.util.control.NonFatal(_) => None }

  /** Sniff-and-decode any supported audio container → (format, audio):
    * the audio analog of [[decodeImage]] — WAV (PCM-16 / μ-law / IMA
    * ADPCM by format tag) and lossless FLAC. Sniffed-but-undecodable
    * variants (e.g. real-world FLAC with LPC subframes) return None. */
  def decodeAudio(bytes: Array[Byte]): Option[(String, Audio)] =
    sniff(bytes).flatMap {
      case "wav" => tryDecode(("wav", decodeWav(bytes)))
      case "aiff" => tryDecode(("aiff", decodeAiff(bytes)))
      case "au" => tryDecode(("au", decodeAu(bytes)))
      case "flac" => tryDecode(("flac", FlacCodec.decode(bytes)))
      case "mp3" => // repo-canonical streams first, then the wild
        // empty-granule class (exact silence — Mp3Codec.decodeWild)
        // the fallback rides inside tryDecode like every other decode
        // path: decodeWild returning None is the documented "not this
        // class" signal, but an unexpected throw (a BitReader require
        // on a pathological frame) must also degrade to opaque, not
        // fail the corpus-wide query
        tryDecode(("mp3", Mp3Codec.decode(bytes)))
          .orElse(tryDecode(Mp3Codec.decodeWild(bytes)).flatten
            .map(("mp3", _)))
      case _ => None
    }

  /** Sniff-and-decode any supported still-image format → (format, image).
    * The single routing point for image payloads: adding a codec here
    * lights it up in every downstream operator (stats, channel stats,
    * dHash, near-dup, …). Sniffed-but-undecodable variants (e.g.
    * arithmetic-coded JPEG) return None. */
  def decodeImage(bytes: Array[Byte]): Option[(String, Image)] =
    sniff(bytes).flatMap {
      case "bmp" => tryDecode(("bmp", decodeBmp(bytes)))
      case "ppm" => tryDecode(("ppm", decodePpm(bytes)))
      case "png" => tryDecode(("png", decodePng(bytes)))
      case "gif" => tryDecode(("gif", decodeGif(bytes)))
      case "jpeg" => tryDecode(("jpeg", JpegCodec.decode(bytes)))
      case "webp" => // lossless (VP8L) decodes to pixels; lossy VP8
        // returns None here and takes the census route downstream
        tryDecode(WebpCodec.decode(bytes)).flatten.map(("webp", _))
      case _ => None
    }

  /** Sniff-and-decode any supported video container → (format, video):
    * MJPEG-in-AVI through the container walker + per-frame JPEG decode
    * ([[VideoCodec]]). Sniffed-but-undecodable variants (an AVI whose
    * stream is not MJPEG, a corrupt index, a truncated frame) return
    * None and take the opaque path downstream. */
  def decodeVideo(bytes: Array[Byte]): Option[(String, VideoCodec.Video)] =
    sniff(bytes).flatMap {
      case "avi" => tryDecode(("avi", VideoCodec.decode(bytes)))
      case "webp" => // animated WebP whose frames are all full-canvas
        // non-blending VP8L or VP8 (r15): each frame IS a canvas
        // state (the compositing-free class); lossy frames decode via
        // Vp8Codec with the documented toRgb conversion — the pinned
        // YUV surface is decodeAnimationLossyPlanes/q324; anything
        // else routes to the census
        tryDecode(WebpCodec.decodeAnimation(bytes)).flatten.map {
          case (c, frames) =>
            val fps = math.max(1, math.round(frames.size * 1000.0 /
              math.max(1L, c.totalDurationMs)).toInt)
            ("webp", VideoCodec.Video(fps, c.canvasWidth, c.canvasHeight,
              frames))
        }
      case _ => None
    }

  // ---- little-endian helpers ------------------------------------------

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def w16(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def w32(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
    o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
  }

  // ---- BMP (24bpp BI_RGB) ---------------------------------------------

  /** Encode row-major top-down RGB as a bottom-up 24-bit BMP. */
  def encodeBmp(img: Image): Array[Byte] = {
    require(img.rgb.length == img.width * img.height * 3,
      s"rgb length ${img.rgb.length} != ${img.width}x${img.height}x3")
    val rowBytes = img.width * 3
    val pad = (4 - rowBytes % 4) % 4
    val imageSize = (rowBytes + pad) * img.height
    val out = new ByteArrayOutputStream(54 + imageSize)
    out.write('B'); out.write('M')
    w32(out, 54 + imageSize); w32(out, 0); w32(out, 54)
    w32(out, 40); w32(out, img.width); w32(out, img.height)
    w16(out, 1); w16(out, 24); w32(out, 0); w32(out, imageSize)
    w32(out, 2835); w32(out, 2835); w32(out, 0); w32(out, 0)
    var y = img.height - 1
    while (y >= 0) { // bottom-up rows, BGR byte order
      var x = 0
      while (x < img.width) {
        val p = (y * img.width + x) * 3
        out.write(img.rgb(p + 2)); out.write(img.rgb(p + 1))
        out.write(img.rgb(p))
        x += 1
      }
      var k = 0
      while (k < pad) { out.write(0); k += 1 }
      y -= 1
    }
    out.toByteArray
  }

  /** Decode a 24-bit uncompressed BMP (bottom-up or top-down) to
    * row-major top-down RGB. */
  def decodeBmp(bytes: Array[Byte]): Image = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP")
    val dataOffset = i32(bytes, 10)
    val headerSize = i32(bytes, 14)
    require(headerSize >= 40, s"unsupported BMP header size $headerSize")
    val width = i32(bytes, 18)
    val rawHeight = i32(bytes, 22)
    val bottomUp = rawHeight > 0
    val height = math.abs(rawHeight)
    val bpp = u16(bytes, 28)
    val compression = i32(bytes, 30)
    require(bpp == 24 && compression == 0,
      s"only 24bpp BI_RGB supported (got bpp=$bpp comp=$compression)")
    val rowBytes = width * 3
    val stride = rowBytes + (4 - rowBytes % 4) % 4
    // uncompressed: the claimed pixel grid must FIT in the file —
    // corrupt dims degrade to the opaque path, never an OOM
    require(dataOffset.toLong + height.toLong * stride <=
      bytes.length.toLong + stride,
      s"bmp dims ${width}x$height exceed ${bytes.length} bytes")
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (bottomUp) height - 1 - y else y
      val src = dataOffset + srcRow * stride
      var x = 0
      while (x < width) {
        val s = src + x * 3
        val d = (y * width + x) * 3
        rgb(d) = bytes(s + 2); rgb(d + 1) = bytes(s + 1)
        rgb(d + 2) = bytes(s)
        x += 1
      }
      y += 1
    }
    Image(width, height, rgb)
  }

  // ---- PPM (binary P6, maxval 255) ------------------------------------

  def encodePpm(img: Image): Array[Byte] = {
    require(img.rgb.length == img.width * img.height * 3)
    val header = s"P6\n${img.width} ${img.height}\n255\n"
      .getBytes(StandardCharsets.US_ASCII)
    val out = new ByteArrayOutputStream(header.length + img.rgb.length)
    out.write(header); out.write(img.rgb)
    out.toByteArray
  }

  def decodePpm(bytes: Array[Byte]): Image = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a P6 PPM")
    var pos = 2
    // read the next whitespace-separated token, skipping '#' comments
    def nextToken(): Int = {
      while (pos < bytes.length &&
        (Character.isWhitespace(bytes(pos)) || bytes(pos) == '#')) {
        if (bytes(pos) == '#')
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else pos += 1
      }
      var v = 0
      while (pos < bytes.length && !Character.isWhitespace(bytes(pos))) {
        v = v * 10 + (bytes(pos) - '0'); pos += 1
      }
      v
    }
    val width = nextToken(); val height = nextToken()
    val maxval = nextToken()
    require(maxval == 255, s"only maxval 255 supported (got $maxval)")
    pos += 1 // exactly one whitespace byte after maxval, per spec
    // long math: Int overflow on huge claimed dims must not wrap the
    // bound check into a pass
    require(width.toLong * height * 3 <= bytes.length.toLong,
      s"ppm dims ${width}x$height exceed ${bytes.length} bytes")
    val n = width * height * 3
    require(bytes.length >= pos + n, "truncated PPM pixel data")
    Image(width, height,
      java.util.Arrays.copyOfRange(bytes, pos, pos + n))
  }

  // ---- PNG (8-bit RGB, non-interlaced) --------------------------------
  //
  // A REAL compressed format in pure JVM: zlib via java.util.zip
  // Inflater/Deflater, chunk CRCs via java.util.zip.CRC32, and the
  // five standard scanline filters (None/Sub/Up/Average/Paeth)
  // implemented from the public PNG specification.

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def writeChunk(out: ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    def w32be(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    w32be(data.length)
    val t = typ.getBytes(StandardCharsets.US_ASCII)
    out.write(t); out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    w32be(crc.getValue.toInt)
  }

  /** Encode row-major RGB as an 8-bit truecolor PNG (filter 0 rows,
    * one zlib IDAT). */
  def encodePng(img: Image): Array[Byte] = {
    require(img.rgb.length == img.width * img.height * 3)
    val raw = new Array[Byte](img.height * (1 + img.width * 3))
    var y = 0
    while (y < img.height) {
      val off = y * (1 + img.width * 3)
      raw(off) = 0 // filter: None
      System.arraycopy(img.rgb, y * img.width * 3, raw, off + 1,
        img.width * 3)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zout = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished())
      zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = new ByteArrayOutputStream()
    def w32be(o: ByteArrayOutputStream, v: Int): Unit = {
      o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
      o.write((v >>> 8) & 0xff); o.write(v & 0xff)
    }
    w32be(ihdr, img.width); w32be(ihdr, img.height)
    ihdr.write(8); ihdr.write(2) // bit depth 8, color type 2 (RGB)
    ihdr.write(0); ihdr.write(0); ihdr.write(0)
    val out = new ByteArrayOutputStream()
    out.write(PngSig)
    writeChunk(out, "IHDR", ihdr.toByteArray)
    writeChunk(out, "IDAT", zout.toByteArray)
    writeChunk(out, "IEND", Array.empty)
    out.toByteArray
  }

  /** Decode an 8-bit truecolor non-interlaced PNG: chunk walk
    * (multiple IDATs concatenate; ancillary chunks skipped), zlib
    * inflate, and full scanline de-filtering. */
  /** PNG decode — all five standard color types (grayscale, RGB,
    * palette, gray+alpha, RGBA; alpha dropped, palette resolved via
    * PLTE) at bit depth 8, plus depth 16 for the non-palette types
    * (narrowed to 8 bits by taking each big-endian sample's high
    * byte — libpng's `png_set_strip_16` convention), non-interlaced
    * or Adam7. De-filtering operates on the CHANNEL bytes at the
    * color type's bytes-per-pixel (the spec's filter distance —
    * channels × bytes-per-sample), then pixels map to RGB. */
  def decodePng(bytes: Array[Byte]): Image = {
    require(sniff(bytes).contains("png"), "not a PNG")
    var pos = 8
    var width = -1; var height = -1; var color = -1
    var interlace = -1; var depth = -1
    var plte: Array[Byte] = null
    val idat = new ByteArrayOutputStream()
    var done = false
    while (!done && pos + 8 <= bytes.length) {
      val len = be32(bytes, pos)
      // a corrupt negative length would walk pos backwards — loop forever
      require(len >= 0, s"negative PNG chunk length $len")
      val typ = new String(bytes, pos + 4, 4, StandardCharsets.US_ASCII)
      val body = pos + 8
      typ match {
        case "IHDR" =>
          width = be32(bytes, body); height = be32(bytes, body + 4)
          depth = bytes(body + 8); color = bytes(body + 9)
          interlace = bytes(body + 12)
          require((interlace == 0 || interlace == 1) &&
            (depth == 8 && (color == 0 || color == 2 || color == 3 ||
              color == 4 || color == 6) ||
              depth == 16 && (color == 0 || color == 2 || color == 4 ||
                color == 6)),
            s"only color types 0/2/3/4/6 at depth 8 (0/2/4/6 at 16), " +
              s"interlace 0/1 supported (depth=$depth color=$color " +
              s"interlace=$interlace)")
        case "PLTE" => plte = bytes.slice(body, body + len)
        case "IDAT" => idat.write(bytes, body, len)
        case "IEND" => done = true
        case _ => // ancillary (tEXt, pHYs, …) — skip
      }
      pos = body + len + 4 // skip CRC
    }
    require(width > 0 && height > 0, "missing IHDR")
    require(color != 3 || plte != null, "palette PNG without PLTE")
    val bps = depth / 8 // bytes per sample (1 or 2, big-endian)
    val bpp = bps * (color match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    })
    // Interlacing: Adam7's seven sub-images (x0, y0, dx, dy), each a
    // self-contained scanline sequence inside ONE shared zlib stream;
    // interlace 0 is the degenerate single full-size pass.
    val passes =
      if (interlace == 0) Seq((0, 0, 1, 1))
      else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val passDims = passes.map { case (x0, y0, dx, dy) =>
      (math.max(0, (width - x0 + dx - 1) / dx),
        math.max(0, (height - y0 + dy - 1) / dy))
    }
    val rawLen = passDims.map { case (wp, hp) =>
      if (wp == 0 || hp == 0) 0L else hp.toLong * (1 + wp.toLong * bpp)
    }.sum
    // decompression-bomb guard: deflate expands at most 1032:1, so
    // a corrupt IHDR claiming dims beyond that bound cannot be a
    // real image — fail cleanly instead of allocating gigabytes
    require(rawLen <= idat.size().toLong * 1032 + 4096,
      s"png dims ${width}x$height implausible for ${idat.size()} " +
        "compressed bytes")
    require(width.toLong * height <= MaxImagePixels,
      s"png dims ${width}x$height exceed the $MaxImagePixels-pixel cap")
    val raw = new Array[Byte](rawLen.toInt)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    var stalled = false
    while (!inflater.finished() && off < raw.length && !stalled) {
      val n = inflater.inflate(raw, off, raw.length - off)
      // n == 0 with finished() false means the (truncated/corrupt)
      // stream wants more input that will never come — bail loudly
      // instead of busy-looping a decode task forever
      stalled = n == 0
      off += n
    }
    inflater.end()
    require(off == raw.length, s"short IDAT: $off of ${raw.length}")
    // de-filter each pass independently (filters reference the pass's
    // OWN previous row/pixel), then scatter into the full pixel grid
    val chan = new Array[Byte](width * height * bpp)
    var rawOff = 0
    passes.zip(passDims).foreach { case ((x0, y0, dx, dy), (wp, hp)) =>
      if (wp > 0 && hp > 0) {
        val p = new Array[Byte](wp * hp * bpp)
        var y = 0
        while (y < hp) {
          val filter = raw(rawOff + y * (1 + wp * bpp)) & 0xff
          val rowIn = rawOff + y * (1 + wp * bpp) + 1
          val rowOut = y * wp * bpp
          var x = 0
          while (x < wp * bpp) {
            val cur = raw(rowIn + x) & 0xff
            val left = if (x >= bpp) p(rowOut + x - bpp) & 0xff else 0
            val up = if (y > 0) p(rowOut - wp * bpp + x) & 0xff else 0
            val upLeft =
              if (y > 0 && x >= bpp) p(rowOut - wp * bpp + x - bpp) & 0xff
              else 0
            val recon = filter match {
              case 0 => cur
              case 1 => cur + left
              case 2 => cur + up
              case 3 => cur + (left + up) / 2
              case 4 =>
                val pr = left + up - upLeft
                val pa = math.abs(pr - left); val pb = math.abs(pr - up)
                val pc = math.abs(pr - upLeft)
                val paeth =
                  if (pa <= pb && pa <= pc) left
                  else if (pb <= pc) up else upLeft
                cur + paeth
              case f => throw new IllegalArgumentException(
                s"unknown PNG filter $f")
            }
            p(rowOut + x) = (recon & 0xff).toByte
            x += 1
          }
          // scatter this pass row into the full grid
          var i2 = 0
          while (i2 < wp) {
            val destPx = (y0 + y * dy) * width + (x0 + i2 * dx)
            var b2 = 0
            while (b2 < bpp) {
              chan(destPx * bpp + b2) = p(rowOut + i2 * bpp + b2); b2 += 1
            }
            i2 += 1
          }
          y += 1
        }
        rawOff += hp * (1 + wp * bpp)
      }
    }
    // samples are big-endian, so at depth 16 a channel's HIGH byte is
    // its first byte: indexing channel c at i*bpp + c*bps narrows
    // 16→8 for free (png_set_strip_16's convention)
    val rgb = new Array[Byte](width * height * 3)
    var i = 0
    val n = width * height
    while (i < n) {
      color match {
        case 0 | 4 =>
          val g = chan(i * bpp)
          rgb(i * 3) = g; rgb(i * 3 + 1) = g; rgb(i * 3 + 2) = g
        case 2 | 6 =>
          rgb(i * 3) = chan(i * bpp)
          rgb(i * 3 + 1) = chan(i * bpp + bps)
          rgb(i * 3 + 2) = chan(i * bpp + 2 * bps)
        case 3 =>
          val idx = (chan(i) & 0xff) * 3
          require(idx + 2 < plte.length, s"palette index out of range")
          rgb(i * 3) = plte(idx)
          rgb(i * 3 + 1) = plte(idx + 1)
          rgb(i * 3 + 2) = plte(idx + 2)
      }
      i += 1
    }
    Image(width, height, rgb)
  }

  // ---- WAV (RIFF PCM 16-bit) ------------------------------------------

  def encodeWav(a: Audio): Array[Byte] = {
    val dataBytes = a.samples.length * 2
    val out = new ByteArrayOutputStream(44 + dataBytes)
    out.write("RIFF".getBytes(StandardCharsets.US_ASCII))
    w32(out, 36 + dataBytes)
    out.write("WAVE".getBytes(StandardCharsets.US_ASCII))
    out.write("fmt ".getBytes(StandardCharsets.US_ASCII))
    w32(out, 16); w16(out, 1); w16(out, a.channels)
    w32(out, a.sampleRate)
    w32(out, a.sampleRate * a.channels * 2)
    w16(out, a.channels * 2); w16(out, 16)
    out.write("data".getBytes(StandardCharsets.US_ASCII))
    w32(out, dataBytes)
    var i = 0
    while (i < a.samples.length) { w16(out, a.samples(i) & 0xffff); i += 1 }
    out.toByteArray
  }

  /** Decode RIFF/WAVE: PCM 16-bit (format 1), G.711 μ-law (format 7)
    * and IMA ADPCM (format 0x11) — so the audio path handles REAL
    * compressed payloads, not just raw PCM. Chunk-walking parser;
    * unknown chunks (LIST, fact, …) skipped per spec. */
  def decodeWav(bytes: Array[Byte]): Audio = {
    require(sniff(bytes).contains("wav"), "not a RIFF/WAVE file")
    var pos = 12
    var format = -1; var channels = -1; var sampleRate = -1; var bits = -1
    var blockAlign = -1
    var dataOff = -1; var dataSize = -1
    while (pos + 8 <= bytes.length && (dataOff < 0 || format < 0)) {
      val id = new String(bytes, pos, 4, StandardCharsets.US_ASCII)
      val size = i32(bytes, pos + 4)
      // corrupt negative size stops pos advancing — loop forever
      require(size >= 0, s"negative RIFF chunk size $size")
      val body = pos + 8
      id match {
        case "fmt " =>
          format = u16(bytes, body)
          channels = u16(bytes, body + 2)
          sampleRate = i32(bytes, body + 4)
          blockAlign = u16(bytes, body + 12)
          bits = u16(bytes, body + 14)
        case "data" => dataOff = body; dataSize = size
        case _ => // LIST, fact, … — skip
      }
      pos = body + size + (size & 1) // chunks are word-aligned
    }
    require(format > 0 && dataOff >= 0, "missing fmt/data chunk")
    // a hostile header can claim dataSize near 2^31 with a tiny file
    // behind it; every sample-array allocation below sizes off this,
    // so clamp to bytes actually present first (the decodeAu rule)
    val dataLen = math.min(dataSize.toLong,
      math.max(0L, bytes.length.toLong - dataOff)).toInt
    format match {
      case 1 =>
        // PCM at the common wild depths, normalized to 16-bit: 8-bit
        // WAV is UNSIGNED (offset-binary), 24/32-bit truncate their
        // low bits (arithmetic shift — the standard narrowing)
        require(bits == 8 || bits == 16 || bits == 24 || bits == 32,
          s"PCM bit depth $bits unsupported (8/16/24/32)")
        val bpsB = bits / 8
        val n = dataLen / bpsB
        val samples = new Array[Short](n)
        var i = 0
        bits match {
          case 8 => while (i < n) {
            samples(i) = (((bytes(dataOff + i) & 0xff) - 128) << 8)
              .toShort
            i += 1
          }
          case 16 => while (i < n) {
            samples(i) = u16(bytes, dataOff + i * 2).toShort; i += 1
          }
          case 24 => while (i < n) {
            val o = dataOff + i * 3
            val v = ((bytes(o) & 0xff)) | ((bytes(o + 1) & 0xff) << 8) |
              (bytes(o + 2) << 16) // sign from the top byte
            samples(i) = (v >> 8).toShort
            i += 1
          }
          case 32 => while (i < n) {
            samples(i) = (i32(bytes, dataOff + i * 4) >> 16).toShort
            i += 1
          }
        }
        Audio(sampleRate, channels, samples)
      case 7 =>
        require(bits == 8, s"mu-law is 8-bit (got $bits)")
        val samples = new Array[Short](dataLen)
        var i = 0
        while (i < dataLen) {
          samples(i) = mulawToLinear(bytes(dataOff + i) & 0xff); i += 1
        }
        Audio(sampleRate, channels, samples)
      case 0x11 =>
        require(bits == 4, s"IMA ADPCM is 4-bit (got $bits)")
        require(channels >= 1 && channels <= 2,
          s"IMA ADPCM: 1-2 channels (got $channels)")
        decodeImaBlocks(bytes, dataOff, dataLen, blockAlign, channels,
          sampleRate)
      case f => throw new IllegalArgumentException(
        s"unsupported WAV format tag $f (PCM=1, mu-law=7, IMA ADPCM=17)")
    }
  }

  // ---- G.711 mu-law ----------------------------------------------------

  /** Standard G.711 μ-law expansion (8-bit code → 16-bit linear). */
  // ---- GIF (LZW, 87a/89a) ---------------------------------------------

  /** GIF decode, first image frame: global/local color tables, both
    * 87a and 89a (extensions skipped via their sub-block chains), the
    * 4-pass row interlace, and the real variable-width LSB-first LZW
    * with clear/end codes and 12-bit dictionary growth. Animated GIFs
    * yield their first frame. */
  def decodeGif(bytes: Array[Byte]): Image = {
    require(sniff(bytes).contains("gif"), "not a GIF")
    val packed = bytes(10) & 0xff
    var pos = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val sz = 3 * (1 << ((packed & 7) + 1))
      gct = java.util.Arrays.copyOfRange(bytes, pos, pos + sz)
      pos += sz
    }
    while (pos < bytes.length) {
      (bytes(pos) & 0xff) match {
        case 0x21 => // extension: label byte then sub-block chain
          pos += 2
          while (pos < bytes.length && bytes(pos) != 0)
            pos += 1 + (bytes(pos) & 0xff)
          pos += 1
        case 0x2c => // image descriptor
          val iw = u16(bytes, pos + 5); val ih = u16(bytes, pos + 7)
          val ip = bytes(pos + 9) & 0xff
          val interlaced = (ip & 0x40) != 0
          pos += 10
          var ct = gct
          if ((ip & 0x80) != 0) {
            val sz = 3 * (1 << ((ip & 7) + 1))
            ct = java.util.Arrays.copyOfRange(bytes, pos, pos + sz)
            pos += sz
          }
          require(ct != null, "GIF image without a color table")
          // decompression-bomb guard: a 12-bit LZW code can emit at
          // most a 4096-pixel run, so pixels beyond bytes*4096
          // cannot be a real stream — and even a plausible ratio
          // must not admit multi-GiB buffers (or Int overflow in
          // the iw*ih*3 rgb allocation), so an absolute pixel cap
          // applies regardless of file size
          require(iw.toLong * ih <= bytes.length.toLong * 4096,
            s"gif dims ${iw}x$ih implausible for ${bytes.length} bytes")
          require(iw.toLong * ih <= MaxImagePixels,
            s"gif dims ${iw}x$ih exceed the $MaxImagePixels-pixel cap")
          val minCode = bytes(pos) & 0xff
          pos += 1
          // concatenate the data sub-blocks
          val data = new ByteArrayOutputStream()
          while (pos < bytes.length && bytes(pos) != 0) {
            val n = bytes(pos) & 0xff
            data.write(bytes, pos + 1, n)
            pos += 1 + n
          }
          val d = data.toByteArray
          // LZW, codes LSB-first
          val clear = 1 << minCode
          val endCode = clear + 1
          val prefix = new Array[Int](4096)
          val suffix = new Array[Byte](4096)
          val stack = new Array[Byte](4097)
          var dictSize = endCode + 1
          var codeSize = minCode + 1
          val idx = new Array[Byte](iw * ih)
          var out = 0
          var bitPos = 0L
          var prev = -1
          var firstByte = 0
          def nextCode(): Int = {
            if ((bitPos + codeSize) > d.length.toLong * 8) return endCode
            var v = 0; var k = 0
            while (k < codeSize) {
              val b = ((bitPos + k) / 8).toInt
              if (((d(b) >> ((bitPos + k) % 8).toInt) & 1) != 0)
                v |= 1 << k
              k += 1
            }
            bitPos += codeSize
            v
          }
          var running = true
          while (running && out < idx.length) {
            val code = nextCode()
            if (code == clear) {
              dictSize = endCode + 1; codeSize = minCode + 1; prev = -1
            } else if (code == endCode) running = false
            else {
              var sp = 0
              var c = code
              if (c >= dictSize) { // KwKwK case
                stack(sp) = firstByte.toByte; sp += 1
                c = prev
              }
              require(c < dictSize, s"gif: invalid LZW code $code")
              while (c >= clear) {
                stack(sp) = suffix(c); sp += 1; c = prefix(c)
              }
              firstByte = c
              stack(sp) = c.toByte; sp += 1
              while (sp > 0 && out < idx.length) {
                sp -= 1; idx(out) = stack(sp); out += 1
              }
              if (prev >= 0 && dictSize < 4096) {
                prefix(dictSize) = prev
                suffix(dictSize) = firstByte.toByte
                dictSize += 1
                if (dictSize == (1 << codeSize) && codeSize < 12)
                  codeSize += 1
              }
              prev = code
            }
          }
          require(out == idx.length,
            s"gif: short LZW stream ($out of ${idx.length} pixels)")
          // de-interlace (rows in passes 0/8, 4/8, 2/4, 1/2) + palette
          val rowOrder = new Array[Int](ih)
          if (interlaced) {
            var r = 0
            for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                y <- start until ih by step) { rowOrder(r) = y; r += 1 }
          } else {
            var y = 0
            while (y < ih) { rowOrder(y) = y; y += 1 }
          }
          val rgb = new Array[Byte](iw * ih * 3)
          var r2 = 0
          while (r2 < ih) {
            val destY = rowOrder(r2)
            var x = 0
            while (x < iw) {
              val ci = (idx(r2 * iw + x) & 0xff) * 3
              require(ci + 2 < ct.length, "gif: palette index out of range")
              val o = (destY * iw + x) * 3
              rgb(o) = ct(ci); rgb(o + 1) = ct(ci + 1); rgb(o + 2) = ct(ci + 2)
              x += 1
            }
            r2 += 1
          }
          return Image(iw, ih, rgb)
        case 0x3b => throw new IllegalArgumentException("GIF trailer before any image")
        case b => throw new IllegalArgumentException(s"unknown GIF block $b")
      }
    }
    throw new IllegalArgumentException("GIF ended without an image")
  }

  // ---- AIFF (big-endian IFF) and Sun AU -------------------------------

  /** AIFF decode (PCM-16/8): FORM/AIFF chunk walk — COMM (channel
    * count, frame count, sample size, the 80-bit extended-precision
    * sample rate) + SSND, ancillary chunks (NAME/AUTH/ANNO/ID3…)
    * skipped with the spec's odd-length pad byte. */
  def decodeAiff(bytes: Array[Byte]): Audio = {
    require(sniff(bytes).contains("aiff"), "not an AIFF stream")
    var channels = -1; var frames = -1; var bits = -1
    var sampleRate = -1
    var samples: Array[Short] = null
    var i = 12
    while (i + 8 <= bytes.length) {
      val cid = new String(bytes, i, 4, StandardCharsets.US_ASCII)
      val len = be32(bytes, i + 4)
      require(len >= 0, s"negative AIFF chunk length $len")
      val body = i + 8
      cid match {
        case "COMM" =>
          channels = ((bytes(body) & 0xff) << 8) | (bytes(body + 1) & 0xff)
          frames = be32(bytes, body + 2)
          bits = ((bytes(body + 6) & 0xff) << 8) | (bytes(body + 7) & 0xff)
          // 80-bit IEEE extended: 1 sign, 15 exponent, 64 mantissa
          // (explicit integer bit); value = mant · 2^(exp−16383−63)
          val exp = (((bytes(body + 8) & 0x7f) << 8) |
            (bytes(body + 9) & 0xff)) - 16383 - 63
          var mant = 0L
          var k = 0
          while (k < 8) { mant = (mant << 8) | (bytes(body + 10 + k) & 0xffL); k += 1 }
          // mantissa's explicit integer bit sets the Long sign —
          // shift LOGICALLY or the rate sign-extends negative
          sampleRate =
            (if (exp >= 0) mant << exp else mant >>> -exp).toInt
        case "SSND" =>
          require(bits == 16 || bits == 8,
            s"AIFF sample size $bits unsupported (8/16 only)")
          val dataOff = body + 8 + be32(bytes, body) // skip offset+blockSize
          // bound the allocation by the bytes ACTUALLY present — a
          // corrupt COMM frame count must not force a multi-GiB
          // allocation (OutOfMemoryError is fatal and escapes the
          // opaque-path NonFatal catch, killing the whole task)
          val avail = math.max(0L,
            math.min(len.toLong - 8 - be32(bytes, body),
              bytes.length.toLong - dataOff)) / (bits / 8)
          val n = math.min(frames.toLong * channels, avail).toInt
          require(n >= 0, s"bad AIFF frame count $frames")
          samples = new Array[Short](n)
          var j = 0
          if (bits == 16) while (j < n) {
            samples(j) = (((bytes(dataOff + 2 * j) & 0xff) << 8) |
              (bytes(dataOff + 2 * j + 1) & 0xff)).toShort
            j += 1
          } else while (j < n) {
            // AIFF 8-bit is SIGNED (unlike WAV) — widen to 16
            samples(j) = (bytes(dataOff + j) << 8).toShort
            j += 1
          }
        case _ => // NAME/AUTH/ANNO/ID3/… ancillary
      }
      i = body + len + (len & 1) // chunks pad to even length
    }
    require(channels > 0 && sampleRate > 0 && samples != null,
      "AIFF missing COMM/SSND")
    Audio(sampleRate, channels, samples)
  }

  /** Sun AU decode: `.snd` header (data offset/size, encoding, rate,
    * channels); encodings 1 (G.711 μ-law), 2 (8-bit linear), 3
    * (16-bit linear big-endian). */
  def decodeAu(bytes: Array[Byte]): Audio = {
    require(sniff(bytes).contains("au"), "not an AU stream")
    val off = be32(bytes, 4)
    val size0 = be32(bytes, 8)
    val enc = be32(bytes, 12)
    val sampleRate = be32(bytes, 16)
    val channels = be32(bytes, 20)
    // size 0xffffffff = unknown → until EOF
    val size = if (size0 == -1) bytes.length - off
      else math.min(size0, bytes.length - off)
    require(channels >= 1 && sampleRate > 0, "bad AU header")
    enc match {
      case 1 =>
        val samples = new Array[Short](size)
        var j = 0
        while (j < size) {
          samples(j) = mulawToLinear(bytes(off + j) & 0xff); j += 1
        }
        Audio(sampleRate, channels, samples)
      case 2 =>
        val samples = new Array[Short](size)
        var j = 0
        while (j < size) { samples(j) = (bytes(off + j) << 8).toShort; j += 1 }
        Audio(sampleRate, channels, samples)
      case 3 =>
        val n = size / 2
        val samples = new Array[Short](n)
        var j = 0
        while (j < n) {
          samples(j) = (((bytes(off + 2 * j) & 0xff) << 8) |
            (bytes(off + 2 * j + 1) & 0xff)).toShort
          j += 1
        }
        Audio(sampleRate, channels, samples)
      case e => throw new IllegalArgumentException(
        s"AU encoding $e unsupported (1=mulaw, 2=pcm8, 3=pcm16)")
    }
  }

  def mulawToLinear(code: Int): Short = {
    val u = ~code & 0xff
    val exp = (u >> 4) & 7
    val mant = u & 0xf
    val s = (((mant << 3) + 0x84) << exp) - 0x84
    (if ((u & 0x80) != 0) -s else s).toShort
  }

  /** Standard G.711 μ-law compression (16-bit linear → 8-bit code). */
  def linearToMulaw(sampleIn: Int): Int = {
    var sample = sampleIn
    val sign = if (sample < 0) { sample = -sample; 0x80 } else 0
    if (sample > 32635) sample = 32635
    sample += 0x84
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (sample & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (sample >> (exp + 3)) & 0x0f
    ~(sign | (exp << 4) | mant) & 0xff
  }

  /** Encode 16-bit samples as a μ-law (format 7) WAV. */
  def encodeMulawWav(a: Audio): Array[Byte] = {
    val out = new ByteArrayOutputStream(46 + a.samples.length)
    out.write("RIFF".getBytes(StandardCharsets.US_ASCII))
    w32(out, 38 + a.samples.length)
    out.write("WAVE".getBytes(StandardCharsets.US_ASCII))
    out.write("fmt ".getBytes(StandardCharsets.US_ASCII))
    w32(out, 18); w16(out, 7); w16(out, a.channels)
    w32(out, a.sampleRate); w32(out, a.sampleRate * a.channels)
    w16(out, a.channels); w16(out, 8); w16(out, 0) // cbSize = 0
    out.write("data".getBytes(StandardCharsets.US_ASCII))
    w32(out, a.samples.length)
    var i = 0
    while (i < a.samples.length) {
      out.write(linearToMulaw(a.samples(i))); i += 1
    }
    if (a.samples.length % 2 == 1) out.write(0) // word-align
    out.toByteArray
  }

  // ---- IMA ADPCM (WAV format 0x11) ------------------------------------

  private val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val ImaIndexAdjust: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Per-channel decoder state stepping one 4-bit code. */
  private final class ImaState(var pred: Int, var index: Int) {
    def step(nibble: Int): Short = {
      val st = ImaStepTable(index)
      var delta = st >> 3
      if ((nibble & 1) != 0) delta += st >> 2
      if ((nibble & 2) != 0) delta += st >> 1
      if ((nibble & 4) != 0) delta += st
      pred = if ((nibble & 8) != 0) pred - delta else pred + delta
      if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
      index += ImaIndexAdjust(nibble & 7)
      if (index < 0) index = 0 else if (index > 88) index = 88
      pred.toShort
    }
  }

  private def decodeImaBlocks(bytes: Array[Byte], dataOff: Int,
      dataSize: Int, blockAlign: Int, channels: Int,
      sampleRate: Int): Audio = {
    require(blockAlign > 4 * channels, s"bad blockAlign $blockAlign")
    val perBlock = (blockAlign - 4 * channels) * 2 / channels + 1
    // Real-world IMA WAVs commonly end with a SHORT final block whose
    // header + whole nibble-groups still carry valid samples — count it
    // in, clamping its group count to the bytes actually present (a
    // sub-header remnant, < 4 bytes/channel, cannot carry samples and
    // is skipped).
    val nBlocks = dataSize / blockAlign +
      (if (dataSize % blockAlign >= 4 * channels) 1 else 0)
    val out = new scala.collection.mutable.ArrayBuffer[Short](
      nBlocks * perBlock * channels)
    var b = 0
    while (b < nBlocks) {
      val base = dataOff + b * blockAlign
      val avail = math.min(blockAlign, dataOff + dataSize - base)
      val states = Array.tabulate(channels) { c =>
        val o = base + c * 4
        val s0 = u16(bytes, o).toShort
        out += s0 // header carries the first sample verbatim
        new ImaState(s0, bytes(o + 2) & 0xff)
      }
      // after headers: 4-byte (8-nibble) groups per channel, interleaved
      val dataStart = base + 4 * channels
      val groups = (avail - 4 * channels) / (4 * channels)
      // decode channel-by-channel into per-channel buffers, then
      // interleave (the stream interleaves GROUPS, samples interleave 1:1)
      val chBuf = Array.fill(channels)(
        new scala.collection.mutable.ArrayBuffer[Short](perBlock - 1))
      var g = 0
      while (g < groups) {
        var c = 0
        while (c < channels) {
          val o = dataStart + (g * channels + c) * 4
          var k = 0
          while (k < 4) {
            val byte = bytes(o + k) & 0xff
            chBuf(c) += states(c).step(byte & 0xf)        // low nibble first
            chBuf(c) += states(c).step((byte >> 4) & 0xf) // then high
            k += 1
          }
          c += 1
        }
        g += 1
      }
      var i = 0
      while (i < chBuf(0).length) {
        var c = 0
        while (c < channels) { out += chBuf(c)(i); c += 1 }
        i += 1
      }
      b += 1
    }
    Audio(sampleRate, channels, out.toArray)
  }

  /** Encode 16-bit samples (interleaved if stereo) as IMA ADPCM WAV.
    * The encoder tracks the decoder's reconstruction state, so error
    * never accumulates beyond one step's quantization. Sample count
    * per channel must fill whole blocks exactly. */
  def encodeImaAdpcmWav(a: Audio, blockAlign: Int = 256): Array[Byte] = {
    val ch = a.channels
    require(ch >= 1 && ch <= 2, "1-2 channels")
    require((blockAlign - 4 * ch) % (4 * ch) == 0, "bad blockAlign")
    val perBlock = (blockAlign - 4 * ch) * 2 / ch + 1
    val nPerCh = a.samples.length / ch
    require(nPerCh % perBlock == 0,
      s"sample count per channel $nPerCh must be a multiple of $perBlock")
    val nBlocks = nPerCh / perBlock
    val dataBytes = nBlocks * blockAlign
    val out = new ByteArrayOutputStream(52 + dataBytes)
    out.write("RIFF".getBytes(StandardCharsets.US_ASCII))
    // file total = 12 (RIFF/WAVE) + 28 ("fmt "+size+20-byte body)
    // + 8 ("data"+size) + dataBytes; the RIFF field excludes its own
    // 8-byte header → 40 + dataBytes
    w32(out, 40 + dataBytes)
    out.write("WAVE".getBytes(StandardCharsets.US_ASCII))
    out.write("fmt ".getBytes(StandardCharsets.US_ASCII))
    w32(out, 20); w16(out, 0x11); w16(out, ch)
    w32(out, a.sampleRate)
    w32(out, a.sampleRate * blockAlign / perBlock)
    w16(out, blockAlign); w16(out, 4)
    w16(out, 2); w16(out, perBlock) // cbSize, samples per block
    out.write("data".getBytes(StandardCharsets.US_ASCII))
    w32(out, dataBytes)
    val index = new Array[Int](ch)
    var pendingNibble = 0
    var b = 0
    while (b < nBlocks) {
      val blockBase = b * perBlock * ch
      val states = Array.tabulate(ch) { c =>
        val s0 = a.samples(blockBase + c)
        w16(out, s0 & 0xffff)
        out.write(index(c)); out.write(0)
        new ImaState(s0, index(c))
      }
      val groups = (blockAlign - 4 * ch) / (4 * ch)
      var g = 0
      while (g < groups) {
        var c = 0
        while (c < ch) {
          var k = 0
          while (k < 8) {
            val si = blockBase + (1 + g * 8 + k) * ch + c
            val nib = encodeImaNibble(states(c), a.samples(si))
            if (k % 2 == 0) pendingNibble = nib
            else out.write(pendingNibble | (nib << 4))
            k += 1
          }
          c += 1
        }
        g += 1
      }
      var c = 0
      while (c < ch) { index(c) = states(c).index; c += 1 }
      b += 1
    }
    out.toByteArray
  }

  /** Quantize one sample against the running state; mutates the state
    * exactly as the decoder will. */
  private def encodeImaNibble(st: ImaState, target: Short): Int = {
    val stepSize = ImaStepTable(st.index)
    var diff = target - st.pred
    var nib = 0
    if (diff < 0) { nib = 8; diff = -diff }
    if (diff >= stepSize) { nib |= 4; diff -= stepSize }
    if (diff >= (stepSize >> 1)) { nib |= 2; diff -= stepSize >> 1 }
    if (diff >= (stepSize >> 2)) { nib |= 1 }
    st.step(nib) // advance reconstruction state
    nib
  }
}
