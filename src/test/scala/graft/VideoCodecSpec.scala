package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaCodecs, VideoCodec}
import graft.operators.MediaCodecs.Image

/** MJPEG-in-AVI video codec: container roundtrip, frame order, header
  * cross-checks (every load-bearing field tamper-detected), RIFF pad
  * handling, and sniff routing. */
class VideoCodecSpec extends AnyFunSuite {

  private def solid(w: Int, h: Int, c: Int): Image =
    Image(w, h, Array.fill(w * h * 3)(c.toByte))

  private def gradient(w: Int, h: Int, seed: Int): Image =
    Image(w, h, Array.tabulate(w * h * 3)(i => ((i * 7 + seed) % 256).toByte))

  private def frameMean(img: Image): Double = {
    var s = 0L; var i = 0
    while (i < img.rgb.length) { s += (img.rgb(i) & 0xff); i += 1 }
    s.toDouble / img.rgb.length
  }

  test("multi-frame roundtrip preserves order, dims, fps, and content") {
    val frames = Seq(solid(16, 8, 40), solid(16, 8, 200), solid(16, 8, 100))
    val avi = VideoCodec.encodeAviMjpeg(25, frames, quality = 90)
    val v = VideoCodec.decode(avi)
    assert(v.fps == 25)
    assert(v.width == 16 && v.height == 8)
    assert(v.frames.size == 3)
    // solid-color roundtrip error is bounded by DC quantization (≤ 2,
    // JpegCodecSpec), so frame ORDER is observable through the means
    val means = v.frames.map(frameMean)
    assert(math.abs(means(0) - 40) <= 2.0)
    assert(math.abs(means(1) - 200) <= 2.0)
    assert(math.abs(means(2) - 100) <= 2.0)
  }

  test("4:2:0 subsampled frames and non-multiple-of-8 dims roundtrip") {
    val frames = Seq(gradient(20, 12, 1), gradient(20, 12, 77))
    val avi = VideoCodec.encodeAviMjpeg(10, frames, quality = 90,
      subsample420 = true)
    val v = VideoCodec.decode(avi)
    assert(v.frames.size == 2 && v.width == 20 && v.height == 12)
    // gradient content: decoded mean stays near source mean
    v.frames.zip(frames).foreach { case (got, src) =>
      assert(math.abs(frameMean(got) - frameMean(src)) <= 8.0)
    }
  }

  test("single-frame video and odd-sized JPEG chunks are padded correctly") {
    // scan several seeds so at least one encoded JPEG has odd length —
    // the RIFF pad byte must not shift subsequent chunk parsing
    val seeds = (0 until 8)
    val frames = seeds.map(s => gradient(16, 16, s * 31))
    val avi = VideoCodec.encodeAviMjpeg(30, frames, quality = 85)
    val sizes = frames.map(f =>
      graft.operators.JpegCodec.encode(f, 85).length)
    assert(sizes.exists(sz => sz % 2 == 1),
      s"fixture defect: no odd-sized frame among $sizes — change seeds")
    val v = VideoCodec.decode(avi)
    assert(v.frames.size == seeds.size)
  }

  test("header fields are load-bearing: tampering fails the decode") {
    val avi = VideoCodec.encodeAviMjpeg(25,
      Seq(solid(16, 8, 100), solid(16, 8, 150)))
    def corrupt(at: Int, to: Byte): Array[Byte] = {
      val c = avi.clone(); c(at) = to; c
    }
    def findCc(cc: String): Int = {
      val pat = cc.getBytes("US-ASCII")
      avi.indices.find(i => i + 4 <= avi.length &&
        pat.indices.forall(j => avi(i + j) == pat(j))).get
    }
    // avih dwTotalFrames (offset avih+8+16): 2 → 3
    val avih = findCc("avih")
    intercept[IllegalArgumentException] {
      VideoCodec.decode(corrupt(avih + 8 + 16, 3.toByte))
    }
    // strh dwLength (offset strh+8+32): 2 → 5
    val strh = findCc("strh")
    intercept[IllegalArgumentException] {
      VideoCodec.decode(corrupt(strh + 8 + 32, 5.toByte))
    }
    // strh handler fourcc MJPG → MJPX
    intercept[IllegalArgumentException] {
      VideoCodec.decode(corrupt(strh + 8 + 7, 'X'.toByte))
    }
    // strf biWidth: 16 → 17 (disagrees with decoded frames AND avih)
    val strf = findCc("strf")
    intercept[IllegalArgumentException] {
      VideoCodec.decode(corrupt(strf + 8 + 4, 17.toByte))
    }
    // idx1 truncated to one entry (16 bytes): count disagrees
    val idx1 = findCc("idx1")
    val short = avi.clone()
    // patch idx1 size from 32 → 16 and drop the trailing 16 bytes
    short(idx1 + 4) = 16.toByte
    intercept[IllegalArgumentException] {
      VideoCodec.decode(java.util.Arrays.copyOf(short, avi.length - 16))
    }
    // sanity: the untampered container still decodes
    assert(VideoCodec.decode(avi).frames.size == 2)
  }

  test("a corrupted frame byte fails decode; routing degrades it to None") {
    val avi = VideoCodec.encodeAviMjpeg(25, Seq(gradient(16, 8, 5)))
    // find the movi payload and stomp bytes mid-frame: entropy-coded
    // data is fragile, so corruption must not silently pass
    val movi = {
      val pat = "00dc".getBytes("US-ASCII")
      avi.indices.find(i => i + 4 <= avi.length &&
        pat.indices.forall(j => avi(i + j) == pat(j))).get
    }
    val c = avi.clone()
    // stomp the marker structure right after SOI — a guaranteed parse
    // failure (mid-stream huffman corruption is separately proven to
    // move decoded pixels by the q213/q220 oracle-bucket contracts)
    for (k <- 2 until 12) c(movi + 8 + k) = 0x55.toByte
    val failed =
      try { VideoCodec.decode(c); false }
      catch { case _: Throwable => true }
    assert(failed, "corrupted huffman stream decoded silently")
    assert(MediaCodecs.decodeVideo(c).isEmpty)
    assert(MediaCodecs.decodeVideo(avi).isDefined)
  }

  test("dual-stream AVI round-trips interleaved PCM audio exactly") {
    val frames = Seq(solid(16, 8, 40), solid(16, 8, 100), solid(16, 8, 200))
    // 25 sample blocks over 3 frames → uneven 8/8/9 interleave split
    val samples = Array.tabulate[Short](25)(i => (i * 311 - 3000).toShort)
    val audio = MediaCodecs.Audio(8000, 1, samples)
    val avi = VideoCodec.encodeAviMjpeg(10, frames, quality = 90,
      audio = Some(audio))
    val v = VideoCodec.decode(avi)
    assert(v.frames.size == 3 && v.fps == 10)
    val a = v.audio.getOrElse(fail("audio track lost"))
    assert(a.sampleRate == 8000 && a.channels == 1)
    // PCM is lossless AND order-sensitive: chunk reassembly must
    // reproduce the exact sample sequence, not just the multiset
    assert(a.samples.toSeq == samples.toSeq)
    // a video-only container still decodes with audio = None
    assert(VideoCodec.decode(
      VideoCodec.encodeAviMjpeg(10, frames)).audio.isEmpty)
  }

  test("stereo audio blocks and header cross-checks hold in the mux") {
    val frames = Seq(gradient(16, 8, 3), gradient(16, 8, 9))
    val samples = Array.tabulate[Short](48)(i => (i * 77 - 1500).toShort)
    val avi = VideoCodec.encodeAviMjpeg(12, frames,
      audio = Some(MediaCodecs.Audio(16000, 2, samples)))
    val a = VideoCodec.decode(avi).audio.get
    assert(a.channels == 2 && a.sampleRate == 16000)
    assert(a.samples.toSeq == samples.toSeq)
    // tamper the auds dwLength (strh data offset 32): decode must fail
    def findNthCc(cc: String, n: Int): Int = {
      val pat = cc.getBytes("US-ASCII")
      avi.indices.filter(i => i + 4 <= avi.length &&
        pat.indices.forall(j => avi(i + j) == pat(j))).apply(n)
    }
    val strh2 = findNthCc("strh", 1) // second strl = audio stream
    val bad = avi.clone(); bad(strh2 + 8 + 32) = 99.toByte
    intercept[IllegalArgumentException] { VideoCodec.decode(bad) }
  }

  test("sniff distinguishes AVI from WAV and routes each correctly") {
    val avi = VideoCodec.encodeAviMjpeg(25, Seq(solid(16, 8, 64)))
    val wav = MediaCodecs.encodeWav(
      MediaCodecs.Audio(8000, 1, Array.fill[Short](32)(100)))
    assert(MediaCodecs.sniff(avi).contains("avi"))
    assert(MediaCodecs.sniff(wav).contains("wav"))
    assert(MediaCodecs.decodeVideo(wav).isEmpty)
    assert(MediaCodecs.decodeImage(avi).isEmpty)
    assert(MediaCodecs.decodeAudio(avi).isEmpty)
  }
}
