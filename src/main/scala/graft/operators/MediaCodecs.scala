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
  * Formats the container genuinely cannot decode (JPEG/MP3/H.264 …)
  * remain stubbed in [[Multimodal]]; [[sniff]] routes payloads so the
  * pipeline decodes what it can and falls back deterministically for
  * the rest. All functions are executor-side pure byte transforms.
  */
object MediaCodecs {

  final case class Image(width: Int, height: Int, rgb: Array[Byte])
  final case class Audio(sampleRate: Int, channels: Int,
      samples: Array[Short])

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G',
    0x0d, 0x0a, 0x1a, 0x0a)

  /** Identify a payload by magic bytes. */
  def sniff(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') Some("bmp")
    else if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6')
      Some("ppm")
    else if (bytes.length >= 8 && bytes.take(8).sameElements(PngSig))
      Some("png")
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
      bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') Some("wav")
    else None

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
  def decodePng(bytes: Array[Byte]): Image = {
    require(sniff(bytes).contains("png"), "not a PNG")
    var pos = 8
    var width = -1; var height = -1
    val idat = new ByteArrayOutputStream()
    var done = false
    while (!done && pos + 8 <= bytes.length) {
      val len = be32(bytes, pos)
      val typ = new String(bytes, pos + 4, 4, StandardCharsets.US_ASCII)
      val body = pos + 8
      typ match {
        case "IHDR" =>
          width = be32(bytes, body); height = be32(bytes, body + 4)
          val depth = bytes(body + 8); val color = bytes(body + 9)
          val interlace = bytes(body + 12)
          require(depth == 8 && color == 2 && interlace == 0,
            s"only 8-bit RGB non-interlaced supported " +
              s"(depth=$depth color=$color interlace=$interlace)")
        case "IDAT" => idat.write(bytes, body, len)
        case "IEND" => done = true
        case _ => // ancillary (tEXt, pHYs, …) — skip
      }
      pos = body + len + 4 // skip CRC
    }
    require(width > 0 && height > 0, "missing IHDR")
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val stride = 1 + width * 3
    val raw = new Array[Byte](height * stride)
    var off = 0
    while (!inflater.finished() && off < raw.length)
      off += inflater.inflate(raw, off, raw.length - off)
    inflater.end()
    require(off == raw.length, s"short IDAT: $off of ${raw.length}")
    // de-filter, per the PNG spec's five filter types
    val rgb = new Array[Byte](width * height * 3)
    val bpp = 3
    var y = 0
    while (y < height) {
      val filter = raw(y * stride) & 0xff
      val rowIn = y * stride + 1
      val rowOut = y * width * 3
      var x = 0
      while (x < width * 3) {
        val cur = raw(rowIn + x) & 0xff
        val left = if (x >= bpp) rgb(rowOut + x - bpp) & 0xff else 0
        val up = if (y > 0) rgb(rowOut - width * 3 + x) & 0xff else 0
        val upLeft =
          if (y > 0 && x >= bpp) rgb(rowOut - width * 3 + x - bpp) & 0xff
          else 0
        val recon = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 =>
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - upLeft)
            val paeth =
              if (pa <= pb && pa <= pc) left
              else if (pb <= pc) up else upLeft
            cur + paeth
          case f => throw new IllegalArgumentException(
            s"unknown PNG filter $f")
        }
        rgb(rowOut + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
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

  def decodeWav(bytes: Array[Byte]): Audio = {
    require(sniff(bytes).contains("wav"), "not a RIFF/WAVE file")
    var pos = 12
    var channels = -1; var sampleRate = -1; var bits = -1
    var samples: Array[Short] = null
    // chunk walk: fmt before data per spec; unknown chunks skipped
    while (pos + 8 <= bytes.length && (samples == null || bits < 0)) {
      val id = new String(bytes, pos, 4, StandardCharsets.US_ASCII)
      val size = i32(bytes, pos + 4)
      val body = pos + 8
      id match {
        case "fmt " =>
          val fmt = u16(bytes, body)
          require(fmt == 1, s"only PCM supported (format $fmt)")
          channels = u16(bytes, body + 2)
          sampleRate = i32(bytes, body + 4)
          bits = u16(bytes, body + 14)
          require(bits == 16, s"only 16-bit PCM supported (got $bits)")
        case "data" =>
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = u16(bytes, body + i * 2).toShort; i += 1
          }
        case _ => // LIST, fact, … — skip
      }
      pos = body + size + (size & 1) // chunks are word-aligned
    }
    require(samples != null && bits == 16, "missing fmt/data chunk")
    Audio(sampleRate, channels, samples)
  }
}
