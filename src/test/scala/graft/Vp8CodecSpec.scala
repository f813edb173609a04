package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Vp8Codec, WebpCodec}

/** VP8 (lossy WebP) intra decoder, pinned BYTE-EXACT against the
  * system reference implementation: every fixture was decoded by
  * libwebp 1.2.4's WebPDecodeYUV at golden-build time
  * (scripts/vp8_probe.py → vp8_golden.json) and [[Vp8Codec]] must
  * reproduce the raw Y/U/V planes bit-for-bit — boolean decoder,
  * extracted probability tables, token trees, dequant, WHT/IDCT, all
  * intra predictors and the normal-profile loop filter are all inside
  * the comparison (one wrong table byte desynchronizes the boolean
  * decoder and fails everything downstream).
  *
  * Coverage across the nine fixtures: 16×16 single-MB B_PRED, i16
  * DC/V modes with second-order luma (WHT), non-multiple-of-16 dims
  * (33×17 crop), segmentation with per-segment quantizers, skipped
  * MBs, filter levels 2..60 (both hev tiers), qualities 40..95, two
  * WILD files from earlier rounds (incl. CPython's test-corpus
  * python.webp), and — via libwebp's ADVANCED encoder API driven
  * through ctypes (scripts/vp8_probe_adv.py; the simple API emits
  * neither) — the SIMPLE loop-filter profile and 4- and 8-way
  * multi-partition token streams, so every decoder path the
  * reference encoder can produce is golden-pinned.
  */
class Vp8CodecSpec extends AnyFunSuite {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    try in.readAllBytes() finally in.close()
  }

  private lazy val golden = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    om.readTree(res("vp8_golden.json"))
  }

  private def md5(a: Array[Byte]) = java.security.MessageDigest
    .getInstance("MD5").digest(a).map(b => f"${b & 0xff}%02x").mkString

  private val fixtures = Seq(
    ("vp8_grad_48x32_q75", "/graft test resources"),
    ("vp8_odd_33x17_q40", "/graft test resources"),
    ("vp8_tex_64x64_q90", "/graft test resources"),
    ("vp8_flat_16x16_q95", "/graft test resources"),
    // diagonal gradient: MB(0,0) lands in B_PRED with corner-reading
    // sub-modes, pinning the above-left frame-border convention (127,
    // same as the rest of the top border row — r15 ADVICE fix)
    ("vp8_tlcorner_16x16_q95", "top-left corner border pixel"),
    ("wild_lossy_alpha", "main resources (r14 wild fixture)"),
    ("wild_vp8x_alpha", "CPython test corpus python.webp"),
    // advanced-API fixtures (scripts/vp8_probe_adv.py): the two paths
    // the simple encoder API never emits — goldens prove the header
    // peeker saw simple_filter=true / n_partitions 4 and 8
    ("vp8_simplefilter_48x48", "SIMPLE loop-filter profile"),
    ("vp8_4part_64x48", "4 token partitions"),
    ("vp8_8part_sf_80x48", "8 token partitions + simple filter"))

  for ((name, provenance) <- fixtures)
    test(s"$name decodes byte-exact vs libwebp WebPDecodeYUV " +
        s"($provenance)") {
      val bytes = res(name + ".webp")
      val g = golden.get(name)
      val p = WebpCodec.decodeVp8Planes(bytes)
        .getOrElse(fail(s"$name refused"))
      assert(p.width == g.get("w").asInt && p.height == g.get("h").asInt)
      assert(md5(p.y) == g.get("y_md5").asText(), "Y plane diverges")
      assert(md5(p.u) == g.get("u_md5").asText(), "U plane diverges")
      assert(md5(p.v) == g.get("v_md5").asText(), "V plane diverges")
    }

  test("toRgb: deterministic, right-sized, flat-gray YUV maps to gray") {
    val w = 6; val h = 4
    val p = Vp8Codec.Planes(w, h,
      Array.fill(w * h)(128.toByte),
      Array.fill(((w + 1) / 2) * ((h + 1) / 2))(128.toByte),
      Array.fill(((w + 1) / 2) * ((h + 1) / 2))(128.toByte))
    val img = Vp8Codec.toRgb(p)
    assert(img.rgb.length == w * h * 3)
    // y=u=v=128 is mid-gray in BT.601: all three channels equal and
    // near 128 (the fixed-point rounding keeps them within 2)
    val px = img.rgb.map(_ & 0xff)
    assert(px.distinct.length <= 3)
    assert(px.forall(v => math.abs(v - 128) <= 2), px.take(3).toSeq)
  }

  test("hostile inputs refuse cleanly: truncation, dimension bomb, " +
      "oversized first partition, non-keyframe") {
    val good = res("vp8_grad_48x32_q75.webp")
    for (n <- Seq(13, 20, 25, 40, good.length / 2)) {
      val cut = java.util.Arrays.copyOf(good, n)
      assert(WebpCodec.decodeVp8Planes(cut).isEmpty, s"truncated at $n")
    }
    // locate the VP8 chunk payload and attack its header in place
    def vp8Off(b: Array[Byte]): Int = {
      var o = 12
      while (!(b(o) == 'V' && b(o + 1) == 'P' && b(o + 2) == '8' &&
        b(o + 3) == ' ')) o += 1
      o + 8
    }
    val o = vp8Off(good)
    // inter-frame bit set -> keyframe-only decoder must refuse
    val inter = good.clone(); inter(o) = (inter(o) | 1).toByte
    assert(WebpCodec.decodeVp8Planes(inter).isEmpty)
    // invalid profile (version bits 1-3 > 3) -> libwebp refuses; so
    // must we, instead of silently decoding as profile 0
    for (prof <- Seq(4, 7)) {
      val bad = good.clone()
      bad(o) = ((bad(o) & ~0x0e) | (prof << 1)).toByte
      assert(WebpCodec.decodeVp8Planes(bad).isEmpty, s"profile $prof")
    }
    // 16383x16383 claimed dims (268M pixels) must hit the pixel cap
    // before any allocation
    val bomb = good.clone()
    bomb(o + 6) = 0xff.toByte; bomb(o + 7) = 0x3f.toByte
    bomb(o + 8) = 0xff.toByte; bomb(o + 9) = 0x3f.toByte
    val t0 = System.nanoTime()
    assert(WebpCodec.decodeVp8Planes(bomb).isEmpty)
    assert((System.nanoTime() - t0) / 1e9 < 2.0, "dimension bomb not capped")
    // first-partition length overrunning the chunk
    val over = good.clone()
    over(o + 2) = 0xff.toByte // part0 size high bits -> far past the end
    assert(WebpCodec.decodeVp8Planes(over).isEmpty)
  }
}
