package graft

/** Emit the deterministic encoder sample for driver-side verification:
  * `sbt "Test/runMain graft.WebpEncodeEmit"` writes
  * /tmp/graft_webp_encode_sample.webp, then
  * scripts/verify_webp_encode.py decodes it with libwebp AND the
  * independent Python spec decoder and records the golden CRC —
  * the encoder's three-way evidence (WebpCodecSpec pins the bytes). */
object WebpEncodeEmit {
  val Width = 33
  val Height = 21
  def sample: graft.operators.MediaCodecs.Image =
    graft.operators.MediaCodecs.Image(Width, Height,
      Array.tabulate(Width * Height * 3)(i => ((i * 7 + 13) % 256).toByte))

  def main(args: Array[String]): Unit = {
    val bytes = graft.operators.WebpCodec.encode(sample)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/graft_webp_encode_sample.webp"), bytes)
    val crc = new java.util.zip.CRC32()
    crc.update(bytes)
    println(s"EMIT bytes=${bytes.length} crc32=${crc.getValue}")
  }
}
