package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media as
  * opaque `binary` payloads with typed metadata, decoded / featurized /
  * frame-sampled in partition-local batches.
  *
  * Decoding is REAL across all three modalities — BMP/PPM/PNG/JPEG
  * images, PCM/μ-law/ADPCM WAV, FLAC and MPEG-1 Layer III audio, and
  * MJPEG-in-AVI video — via the pure-JVM [[MediaCodecs]]
  * ([[decodeStats]] sniffs and routes; [[videoFrameStats]] walks the
  * container and decodes every frame). Payloads in formats outside the
  * codec set degrade per-payload to deterministic opaque statistics
  * ([[decode]] below — useful as the cheap determinism probe the specs
  * exercise). The plumbing is the production shape either way: schema,
  * encoders, mapPartitions batch iteration (the JVM analog of
  * `mapInPandas` batches), partition-local state, and explode
  * semantics for frame sampling.
  *
  * 100 TB posture: payloads never pass through a shuffle — decode and
  * featurize are map-side `mapPartitions`; only compact features and
  * metadata flow downstream.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int)

  final case class DecodedRow(
      media_id: Long, kind: String, n_bytes: Int, checksum: Long,
      width: Int, height: Int, checksum_md5: String)

  final case class FeatureRow(media_id: Long, feature: Array[Float])

  final case class FrameRow(
      media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Ingest-adapter analog: derive a deterministic media table from any
    * (id, text) corpus — payload bytes stand in for encoded media. */
  def packMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // NOT spread (round 19): the packed payloads are tiny and the
    // A/B showed the repair exchange costs more than the serial
    // decode saves on every consumer (see OPTIMIZATION_r19.md)
    docs.select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        (col("doc_id") % 640 + 64).cast("int").as("width"),
        (col("doc_id") % 480 + 48).cast("int").as("height"))
      .as[MediaRow]
  }

  final case class MediaStatsRow(
      media_id: Long, kind: String, format: String,
      dim1: Int, dim2: Int, n_units: Long, mean_value: Double)

  /** Ingest-adapter analog with REAL encoded payloads: each doc gets a
    * small deterministic media file derived from `doc_id` alone —
    * image → 16×8 BMP, audio → 256-sample mono WAV, video → 8×8 PPM —
    * so the decode stage downstream parses genuine file bytes. */
  def packEncodedMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // NOT spread (round 19): these 16×8/256-sample payloads decode in
    // microseconds — the same-JVM A/B measured the repair exchange as
    // a net loss on all ten packEncodedMedia consumers (1.2–2.0×);
    // the HEAVY codecs (mp3/video) spread at their own call sites
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        (id % 3).toInt match {
          case 0 =>
            val rgb = Array.tabulate[Byte](16 * 8 * 3)(i =>
              ((i * 31 + id) % 256).toByte)
            val img = MediaCodecs.Image(16, 8, rgb)
            // alternate the uncompressed and the COMPRESSED (zlib)
            // image codec so both decode paths sit under the oracle
            val payload =
              if (id % 6 == 0) MediaCodecs.encodeBmp(img)
              else MediaCodecs.encodePng(img)
            MediaRow(id, "image", payload, 16, 8)
          case 1 =>
            val samples = Array.tabulate[Short](256)(i =>
              ((i * 37 + id) % 2048 - 1024).toShort)
            MediaRow(id, "audio",
              MediaCodecs.encodeWav(MediaCodecs.Audio(8000, 1, samples)),
              0, 0)
          case _ =>
            val rgb = Array.tabulate[Byte](8 * 8 * 3)(i =>
              ((i * 13 + id) % 256).toByte)
            MediaRow(id, "video",
              MediaCodecs.encodePpm(MediaCodecs.Image(8, 8, rgb)), 8, 8)
        }
      }
    }
  }

  /** REAL decode: sniff each payload and run the matching pure-JVM
    * codec (image / audio / AVI video); dims come from the decoded
    * header, the mean from the decoded pixels/samples — so a single
    * corrupted byte in header or body changes the output. For video,
    * `n_units` is the decoded frame count and the mean spans all
    * frames' pixels. Payloads without a decodable magic fall back to
    * the deterministic stub statistics (format = "opaque"). Map-side
    * only: payloads never shuffle. */
  def decodeStats(media: Dataset[MediaRow]): Dataset[MediaStatsRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        MediaCodecs.decodeImage(m.payload) match {
          case Some((fmt, img)) =>
            var sum = 0L; var i = 0
            while (i < img.rgb.length) { sum += (img.rgb(i) & 0xff); i += 1 }
            MediaStatsRow(m.media_id, m.kind, fmt, img.width, img.height,
              img.rgb.length.toLong, sum.toDouble / img.rgb.length)
          case None => MediaCodecs.decodeAudio(m.payload) match {
            case Some((fmt, a)) =>
              var sum = 0L; var i = 0
              while (i < a.samples.length) { sum += a.samples(i); i += 1 }
              MediaStatsRow(m.media_id, m.kind, fmt, a.sampleRate,
                a.channels, a.samples.length.toLong,
                sum.toDouble / a.samples.length)
            case _ => MediaCodecs.decodeVideo(m.payload) match {
              case Some((fmt, v)) =>
                var sum = 0L; var n = 0L
                v.frames.foreach { f =>
                  var i = 0
                  while (i < f.rgb.length) { sum += (f.rgb(i) & 0xff); i += 1 }
                  n += f.rgb.length
                }
                MediaStatsRow(m.media_id, m.kind, fmt, v.width, v.height,
                  v.frames.size.toLong, if (n == 0) 0.0 else sum.toDouble / n)
              // ISO-BMFF: frames don't decode (AVC/HEVC codecs are out
              // of scope) but the container census yields real dims and
              // the sample count — richer keys than the opaque path.
              case _ => Mp4Census.census(m.payload) match {
                case Some(c) =>
                  val video = c.tracks.find(_.handler == "vide")
                  var sum = 0L; var i = 0
                  while (i < m.payload.length) {
                    sum += (m.payload(i) & 0xff); i += 1
                  }
                  MediaStatsRow(m.media_id, m.kind, "mp4",
                    video.map(_.width).getOrElse(0),
                    video.map(_.height).getOrElse(0),
                    video.map(_.nSamples).getOrElse(0L),
                    if (m.payload.length == 0) 0.0
                    else sum.toDouble / m.payload.length)
                // lossy WebP: full VP8 intra decode (r15, Vp8Codec —
                // byte-exact vs libwebp's WebPDecodeYUV) — stats
                // report the raw YUV420 planes, the decoder's
                // reference-pinned surface; files whose VP8 stream
                // refuses (hostile/truncated) fall through to the
                // census + exact-ALPH route below
                case _ => WebpCodec.decodeVp8Planes(m.payload) match {
                  case Some(p) =>
                    var psum = 0L
                    var i = 0
                    while (i < p.y.length) { psum += (p.y(i) & 0xff); i += 1 }
                    i = 0
                    while (i < p.u.length) {
                      psum += (p.u(i) & 0xff) + (p.v(i) & 0xff); i += 1
                    }
                    val nUnits = p.y.length.toLong + p.u.length + p.v.length
                    MediaStatsRow(m.media_id, m.kind, "webp-lossy",
                      p.width, p.height, nUnits,
                      if (nUnits == 0) 0.0 else psum.toDouble / nUnits)
                  case None => WebpCodec.census(m.payload) match {
                  case Some(c) =>
                    WebpCodec.alphaPlane(m.payload) match {
                      case Some((_, _, plane)) =>
                        var asum = 0L; var i = 0
                        while (i < plane.length) {
                          asum += (plane(i) & 0xff); i += 1
                        }
                        MediaStatsRow(m.media_id, m.kind, "webp-" + c.format,
                          c.width, c.height, plane.length.toLong,
                          if (plane.isEmpty) 0.0
                          else asum.toDouble / plane.length)
                      case None =>
                        var sum = 0L; var i = 0
                        while (i < m.payload.length) {
                          sum += (m.payload(i) & 0xff); i += 1
                        }
                        MediaStatsRow(m.media_id, m.kind, "webp-" + c.format,
                          c.width, c.height, m.payload.length.toLong,
                          if (m.payload.length == 0) 0.0
                          else sum.toDouble / m.payload.length)
                    }
                  case _ =>
                    var sum = 0L; var i = 0
                    while (i < m.payload.length) {
                      sum += (m.payload(i) & 0xff); i += 1
                    }
                    MediaStatsRow(m.media_id, m.kind, "opaque", m.width,
                      m.height, m.payload.length.toLong,
                      if (m.payload.length == 0) 0.0
                      else sum.toDouble / m.payload.length)
                }
              }
            }
          }
        }
      }
    }
  }
  }

  /** Decode: partition-local batch loop over payloads.
    * STUB — a real implementation calls an image/audio decoder here;
    * the fake emits byte count + rolling FNV checksum + a content md5
    * so tests AND the DuckDB oracle can assert determinism end-to-end
    * (md5 is bit-exact across engines; the FNV isn't SQL-expressible
    * but stays for the spec's cheap determinism probes). */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition setup happens once (decoder init in production)
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { m =>
        var sum = 1469598103934665603L // FNV-1a offset basis
        var i = 0
        while (i < m.payload.length) {
          sum = (sum ^ (m.payload(i) & 0xff)) * 1099511628211L
          i += 1
        }
        md.reset()
        val hex = md.digest(m.payload)
          .map(b => f"${b & 0xff}%02x").mkString
        DecodedRow(m.media_id, m.kind, m.payload.length, sum,
          m.width, m.height, hex)
      }
    }
  }

  /** Feature extraction: payload → fixed-dim Float vector.
    * STUB — production would run a vision/audio encoder per batch; the
    * fake projects byte n-grams into `dim` buckets, which preserves the
    * real signature (binary → Array[Float]) and batch shape. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int)
      : Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val acc = new Array[Float](dim)
        var i = 0
        while (i < m.payload.length) {
          val bucket = ((m.payload(i) & 0xff) * 31 + i) % dim
          acc(bucket) += 1.0f
          i += 1
        }
        val norm = math.sqrt(acc.map(x => x * x.toDouble).sum).toFloat
        FeatureRow(m.media_id,
          if (norm == 0f) acc else acc.map(_ / norm))
      }
    }
  }

  /** Frame sampling for video payloads: every `stride`-th fixed-size
    * block becomes a frame row (explode semantics — one input row, many
    * frame rows, still map-side). */
  def sampleFrames(media: Dataset[MediaRow], blockSize: Int, stride: Int)
      : Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video").flatMap { m =>
      val nBlocks = math.max(m.payload.length / blockSize, 0)
      (0 until nBlocks by stride).iterator.map { b =>
        FrameRow(m.media_id, b,
          java.util.Arrays.copyOfRange(
            m.payload, b * blockSize,
            math.min((b + 1) * blockSize, m.payload.length)))
      }
    }
  }

  final case class VideoFrameRow(
      media_id: Long, frame_idx: Long, fps: Int, width: Int, height: Int,
      mean_value: Double)

  /** REAL per-frame video statistics: walk each AVI container, decode
    * every MJPEG frame through the actual JPEG entropy decoder, and
    * explode to one row per frame with the decoded pixel mean — the
    * frame-sampling primitive of a video training pipeline, on real
    * bytes. fps comes from the stream header (rate/scale). Map-side
    * flatMap: payloads never shuffle, only (id, frame, dims, mean)
    * rows flow downstream. Non-video / undecodable payloads are
    * skipped (route mixed corpora through [[decodeStats]]'s sniff
    * for the fallback accounting). */
  def videoFrameStats(media: Dataset[MediaRow]): Dataset[VideoFrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { m =>
        MediaCodecs.decodeVideo(m.payload) match {
          case Some((_, v)) =>
            v.frames.iterator.zipWithIndex.map { case (f, idx) =>
              var sum = 0L; var i = 0
              while (i < f.rgb.length) { sum += (f.rgb(i) & 0xff); i += 1 }
              VideoFrameRow(m.media_id, idx.toLong, v.fps, f.width,
                f.height,
                if (f.rgb.length == 0) 0.0 else sum.toDouble / f.rgb.length)
            }
          case None => Iterator.empty
        }
      }
    }
  }

  final case class AvStatsRow(
      media_id: Long, n_frames: Long, fps: Int, sample_rate: Int,
      n_samples: Long, audio_weighted: Long)

  /** A/V track statistics from REAL dual-stream AVI decode: frame
    * count + fps from the video stream, sample count + rate from the
    * interleaved PCM track, and the position-weighted sample sum
    * Σ i·s[i] — exact (PCM is lossless) and ORDER-SENSITIVE, so a
    * mis-ordered or dropped '01wb' chunk during container reassembly
    * changes it even when the sample multiset survives. The input to
    * any A/V-drift gate a video training pipeline runs before pairing
    * audio with frames. Map-side; videos without an audio track emit
    * rate 0 / count 0. */
  def avStats(media: Dataset[MediaRow]): Dataset[AvStatsRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { m =>
        MediaCodecs.decodeVideo(m.payload) match {
          case Some((_, v)) =>
            val (n, wsum, sr) = v.audio match {
              case Some(a) =>
                var s = 0L; var i = 0
                while (i < a.samples.length) {
                  s += i.toLong * a.samples(i); i += 1
                }
                (a.samples.length.toLong, s, a.sampleRate)
              case None => (0L, 0L, 0)
            }
            Iterator.single(AvStatsRow(m.media_id,
              v.frames.size.toLong, v.fps, sr, n, wsum))
          case None => Iterator.empty
        }
      }
    }
  }

  final case class AudioFrameRow(
      media_id: Long, frame_idx: Long, n_samples: Long, ssq: Long,
      n_crossings: Long)

  /** Frame-level audio features from REAL decoded WAV bytes: per
    * `frameSize`-sample frame, the sum of squared samples (RMS energy
    * numerator, exact BIGINT) and the zero-crossing count (strict
    * sign flips, `s[i-1]·s[i] < 0`, within-frame only) — the two
    * features every audio-quality/VAD pipeline starts with. Map-side
    * flatMap; only (id, frame, two longs) rows flow on. Non-WAV
    * payloads are skipped (route them through [[decodeStats]]'s sniff
    * first if mixed). */
  def audioFrameFeatures(
      media: Dataset[MediaRow], frameSize: Int): Dataset[AudioFrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { m =>
        if (MediaCodecs.sniff(m.payload).contains("wav")) {
          val a = MediaCodecs.decodeWav(m.payload)
          val n = a.samples.length
          val nFrames = (n + frameSize - 1) / frameSize
          (0 until nFrames).iterator.map { f =>
            val start = f * frameSize
            val end = math.min(start + frameSize, n)
            var ssq = 0L; var zc = 0L; var i = start
            while (i < end) {
              val v = a.samples(i).toLong
              ssq += v * v
              if (i > start && a.samples(i - 1).toLong * v < 0L) zc += 1
              i += 1
            }
            AudioFrameRow(m.media_id, f.toLong, (end - start).toLong,
              ssq, zc)
          }
        } else Iterator.empty
      }
    }
  }

  final case class ChannelStatsRow(
      media_id: Long, format: String, channel: Long, n: Long,
      total: Long)

  /** Per-channel (R/G/B) pixel statistics from REAL decoded image
    * bytes — the normalization-constant pass every vision pipeline
    * runs before training. Works on any format [[MediaCodecs]] can
    * sniff (BMP, PNG, PPM); emits exact integer sums so the mean
    * stays one mirrored double division downstream. Map-side only. */
  def channelStats(media: Dataset[MediaRow]): Dataset[ChannelStatsRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { m =>
        MediaCodecs.decodeImage(m.payload) match {
          case Some((fmt, img)) =>
            val sums = new Array[Long](3)
            val ns = new Array[Long](3)
            var i = 0
            while (i < img.rgb.length) {
              sums(i % 3) += (img.rgb(i) & 0xff); ns(i % 3) += 1; i += 1
            }
            (0 until 3).iterator.map(c =>
              ChannelStatsRow(m.media_id, fmt, c.toLong, ns(c), sums(c)))
          case _ => Iterator.empty
        }
      }
    }
  }

  final case class DHashRow(
      media_id: Long, format: String, dhash: String, n_ones: Long)

  /** Perceptual difference hash (dHash) over REAL decoded pixels: for
    * every row of the green channel, one bit per adjacent-pixel pair —
    * 1 iff g(x) > g(x+1) (strict, integer — no tie ambiguity). The
    * standard near-duplicate fingerprint for image corpora: gradient
    * signs survive re-encoding and brightness shifts, so equal/close
    * hashes flag visual dups the byte hash misses. Works directly on
    * the codec's row-major RGB array — a BGR slip, padding error, or
    * bottom-up/top-down confusion in any codec breaks exactly that
    * format's bits. Map-side only; 8·(W−1) bits of fingerprint flow
    * downstream, never pixels. Pair search then rides the existing
    * band-LSH hamming machinery (q68) at corpus scale. */
  def dHash(media: Dataset[MediaRow]): Dataset[DHashRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { m =>
        MediaCodecs.decodeImage(m.payload) match {
          case Some((fmt, img)) =>
            def green(x: Int, y: Int): Int =
              img.rgb((y * img.width + x) * 3 + 1) & 0xff
            val sb = new StringBuilder(img.height * (img.width - 1))
            var ones = 0L
            var y = 0
            while (y < img.height) {
              var x = 0
              while (x < img.width - 1) {
                if (green(x, y) > green(x + 1, y)) { sb.append('1'); ones += 1 }
                else sb.append('0')
                x += 1
              }
              y += 1
            }
            Iterator.single(DHashRow(m.media_id, fmt, sb.toString, ones))
          case _ => Iterator.empty
        }
      }
    }
  }

  /** Image near-duplicate pairing over [[dHash]] fingerprints: band
    * LSH on the bit string (same design as the SimHash text pairing —
    * candidates collide on at least one of `bands` equal substrings;
    * pigeonhole guarantees NO misses for hamming < bands, hence the
    * require), then exact hamming on candidates only. Hash length
    * rides in the band key so only same-geometry images pair. The
    * per-position compare runs only on candidate pairs — never on the
    * corpus — so cost is Σ bucket², bounded exactly like q68. */
  def dHashNearDup(hashes: DataFrame, bands: Int,
      maxHamming: Int): DataFrame = {
    require(maxHamming < bands,
      s"maxHamming=$maxHamming >= bands=$bands loses pigeonhole " +
        "completeness")
    // Collapse to DISTINCT hashes before any pairing: duplicate-heavy
    // image corpora concentrate into few hash values (that is the
    // point of a perceptual hash), so banding the raw image table
    // generates every identical-hash pair bands× with full hash
    // strings as join payload — measured 102 s at sf0.1 vs 1.5 s for
    // this form. Identical-hash pairs need NO verification (hamming
    // is 0 by definition) and expand map-side from each group's
    // sorted member list; only pairs of DIFFERENT hash values — the
    // |distinct hashes| table, not the corpus — enter the band join
    // and pay the per-position compare. Per-group state is bounded by
    // the duplicate count of one hash value (the capWidth pattern
    // applies if a corpus degenerates further).
    // persisted: `groups` feeds three branches (same-hash expansion,
    // band keys, cross-pair expansion) and upstream of it sits the
    // full image decode + hash pipeline — without the persist each
    // branch re-decodes the corpus (the q183 lesson, Dedup.scala:473)
    val groups = hashes.select(col("media_id"), col("dhash"))
      .groupBy("dhash")
      .agg(sort_array(collect_list(col("media_id"))).as("ids"))
      .persist()
    val samePairs = groups
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), " +
          "y -> struct(x AS media_a, y AS media_b))))")).as("p"))
      .select(col("p.media_a"), col("p.media_b"), lit(0L).as("hamming"))
    val d = groups.select(col("dhash"))
      .withColumn("len", length(col("dhash")))
    val bk = d.select(col("dhash"), col("len"),
        explode(expr(s"transform(sequence(0, $bands - 1), b -> " +
          s"struct(b AS band, substring(dhash, " +
          s"b * (len div $bands) + 1, len div $bands) AS bkey))"))
          .as("bk"))
      .select(col("dhash"), col("len"), col("bk.band"), col("bk.bkey"))
    val candH = bk.as("a").join(bk.as("b"),
        col("a.len") === col("b.len") && col("a.band") === col("b.band") &&
          col("a.bkey") === col("b.bkey") &&
          col("a.dhash") < col("b.dhash"))
      .select(col("a.dhash").as("da"), col("b.dhash").as("db"))
      .distinct()
      // native codegen'd kernel (expressions/HammingDistance) — the
      // per-candidate hot loop; the previous higher-order-function SQL
      // allocated a position array + two substrings per bit
      .withColumn("hamming",
        graft.expressions.HammingDistance.hamming(col("da"), col("db")))
      .filter(col("hamming") <= maxHamming)
    val crossPairs = candH
      .join(groups.select(col("dhash").as("da"), col("ids").as("ids_a")),
        Seq("da"))
      .join(groups.select(col("dhash").as("db"), col("ids").as("ids_b")),
        Seq("db"))
      .select(col("hamming"), explode(expr(
        "flatten(transform(ids_a, x -> transform(ids_b, " +
          "y -> struct(least(x, y) AS media_a, " +
          "greatest(x, y) AS media_b))))")).as("p"))
      .select(col("p.media_a"), col("p.media_b"), col("hamming"))
    // Materialize the pair set eagerly (localCheckpoint — same lineage-
    // truncation device ConnectedComponents uses) and release `groups`
    // immediately: the cached branch point sits above the full image
    // decode + hash pipeline, and leaving it pinned for the session
    // accumulates executor memory across queries in a long-lived
    // driver. What stays resident afterwards is only the candidate-
    // pair table — bounded by Σ bucket², orders of magnitude smaller
    // than the decode cache — and it is GC-cleaned with the returned
    // frame.
    val result = samePairs.unionByName(crossPairs).localCheckpoint()
    groups.unpersist()
    result
  }

  /** Near-dup edge set sufficient for CONNECTED COMPONENTS — same
    * components as [[dHashNearDup]]'s full pair list, linearly many
    * edges. The full pair contract is inherently quadratic in
    * duplication: m copies of one image are m(m-1)/2 pairs, and the
    * r14 10× scale run measured exactly that (q192's shuffle grew 94×
    * on 10× data — output growth, not wasted work). Clustering never
    * needs the cliques: a STAR per hash group (each member → the
    * group's min id) plus ONE representative edge per cross-hash
    * candidate pair spans the identical components, so edges grow
    * with the corpus, not with duplication². Use this for component
    * building; use [[dHashNearDup]] when the pairs themselves are the
    * deliverable (q185's pair listing). */
  def dHashNearDupEdges(hashes: DataFrame, bands: Int,
      maxHamming: Int): DataFrame = {
    require(maxHamming < bands,
      s"maxHamming=$maxHamming >= bands=$bands loses pigeonhole " +
        "completeness")
    val groups = hashes.select(col("media_id"), col("dhash"))
      .groupBy("dhash")
      .agg(sort_array(collect_list(col("media_id"))).as("ids"))
      .persist()
    // star: group min -> every other member (m-1 edges, not m(m-1)/2)
    val starEdges = groups
      .select(explode(expr(
        "transform(slice(ids, 2, size(ids)), " +
          "y -> struct(ids[0] AS media_a, y AS media_b))")).as("p"))
      .select(col("p.media_a"), col("p.media_b"))
    val d = groups.select(col("dhash"))
      .withColumn("len", length(col("dhash")))
    val bk = d.select(col("dhash"), col("len"),
        explode(expr(s"transform(sequence(0, $bands - 1), b -> " +
          s"struct(b AS band, substring(dhash, " +
          s"b * (len div $bands) + 1, len div $bands) AS bkey))"))
          .as("bk"))
      .select(col("dhash"), col("len"), col("bk.band"), col("bk.bkey"))
    // one representative edge per qualifying hash pair: group A's
    // members all reach ids_a[0] via the star, so rep-to-rep connects
    // everything the full |A|×|B| expansion would
    val crossEdges = bk.as("a").join(bk.as("b"),
        col("a.len") === col("b.len") && col("a.band") === col("b.band") &&
          col("a.bkey") === col("b.bkey") &&
          col("a.dhash") < col("b.dhash"))
      .select(col("a.dhash").as("da"), col("b.dhash").as("db"))
      .distinct()
      .withColumn("hamming",
        graft.expressions.HammingDistance.hamming(col("da"), col("db")))
      .filter(col("hamming") <= maxHamming)
      .join(groups.select(col("dhash").as("da"),
        expr("ids[0]").as("media_a")), Seq("da"))
      .join(groups.select(col("dhash").as("db"),
        expr("ids[0]").as("media_b")), Seq("db"))
      .select(col("media_a"), col("media_b"))
    val result = starEdges.unionByName(crossEdges).localCheckpoint()
    groups.unpersist()
    result
  }

  final case class VideoHashRow(
      media_id: Long, format: String, n_frames: Long, thash: String)

  /** Temporal perceptual hash over REAL decoded video: dHash along the
    * time axis — one bit per adjacent-frame pair, 1 iff mean(frame f) >
    * mean(frame f+1) (strict). The sign of the frame-to-frame luminance
    * delta survives re-encoding (codec/quality changes move a solid
    * frame's mean by at most the DC quantization bound) and uniform
    * brightness shifts (both frames move together), so equal hashes
    * flag the same footage across encodes — the videos a byte hash can
    * never pair. Frame count rides alongside so only same-length
    * fingerprints cluster downstream (the dHash `len` convention).
    * Map-side only: the container walk, per-frame JPEG decode, and
    * mean reduction all happen in the partition; (id, n, bits) flows
    * on, never frames. */
  def videoTemporalHash(media: Dataset[MediaRow]): Dataset[VideoHashRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { m =>
        MediaCodecs.decodeVideo(m.payload) match {
          case Some((fmt, v)) =>
            val means = v.frames.map { f =>
              var s = 0L; var i = 0
              while (i < f.rgb.length) { s += (f.rgb(i) & 0xff); i += 1 }
              if (f.rgb.length == 0) 0.0 else s.toDouble / f.rgb.length
            }
            val sb = new StringBuilder(math.max(means.size - 1, 0))
            var f = 0
            while (f < means.size - 1) {
              sb.append(if (means(f) > means(f + 1)) '1' else '0')
              f += 1
            }
            Iterator.single(VideoHashRow(m.media_id, fmt,
              v.frames.size.toLong, sb.toString))
          case None => Iterator.empty
        }
      }
    }
  }

  final case class ResizedPixelRow(
      media_id: Long, format: String, out_w: Int, out_h: Int,
      ox: Int, oy: Int, r: Int, g: Int, b: Int)

  /** REAL pixel resize — integer box-filter downsample by `k` on both
    * axes: each output channel is the floor-mean of its k×k input
    * block (exact integer arithmetic, no float resampling kernel to
    * diverge across engines). The resized raster is re-encoded (BMP)
    * and decoded AGAIN before emission, so what this returns has
    * round-tripped a real image file — codec byte layout included —
    * not an in-memory shortcut.
    *
    * 100 TB posture: decode → filter → encode → decode all run inside
    * one mapPartitions batch; payloads never shuffle, and the emitted
    * rows are resized-raster-sized (input pixels / k²). Payloads that
    * don't decode as images, or whose dims don't divide by k, are
    * skipped (the metadata-only [[resizeMeta]] path covers those). */
  def resizePixels(media: Dataset[MediaRow], k: Int)
      : Dataset[ResizedPixelRow] = {
    require(k >= 1, s"resize factor must be >= 1, got $k")
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { m =>
        MediaCodecs.decodeImage(m.payload) match {
          case Some((fmt, img)) if img.width >= k && img.height >= k &&
              img.width % k == 0 && img.height % k == 0 =>
            val ow = img.width / k
            val oh = img.height / k
            val out = new Array[Byte](ow * oh * 3)
            var oy = 0
            while (oy < oh) {
              var ox = 0
              while (ox < ow) {
                var c = 0
                while (c < 3) {
                  var sum = 0
                  var dy = 0
                  while (dy < k) {
                    val rowBase =
                      ((oy * k + dy) * img.width + ox * k) * 3 + c
                    var dx = 0
                    while (dx < k) {
                      sum += img.rgb(rowBase + dx * 3) & 0xff
                      dx += 1
                    }
                    dy += 1
                  }
                  out((oy * ow + ox) * 3 + c) = (sum / (k * k)).toByte
                  c += 1
                }
                ox += 1
              }
              oy += 1
            }
            val rt = MediaCodecs.decodeBmp(
              MediaCodecs.encodeBmp(MediaCodecs.Image(ow, oh, out)))
            for (py <- 0 until rt.height; px <- 0 until rt.width) yield {
              val b0 = (py * rt.width + px) * 3
              ResizedPixelRow(m.media_id, fmt, rt.width, rt.height,
                px, py, rt.rgb(b0) & 0xff, rt.rgb(b0 + 1) & 0xff,
                rt.rgb(b0 + 2) & 0xff)
            }
          case _ => Iterator.empty
        }
      }
    }
  }

  final case class ResampledAudioRow(
      media_id: Long, format: String, out_rate: Int, channels: Int,
      out_n: Long, out_sum: Long, checksum: Long, mean: Double)

  /** REAL audio resample — decimate by integer factor `k`: each output
    * sample is the truncating-division mean of its k consecutive
    * per-channel input samples (exact integer arithmetic; truncation
    * toward zero matches SQL integer division on both engines). The
    * decimated PCM is re-encoded (WAV at rate/k) and decoded AGAIN, so
    * the emitted stats have round-tripped a real audio file. The
    * position-weighted checksum makes sample ORDER load-bearing, not
    * just the value multiset.
    *
    * Map-side only; payloads never shuffle; the trailing partial block
    * (fewer than k samples) is dropped, as is any payload that doesn't
    * decode as audio. */
  def resampleAudio(media: Dataset[MediaRow], k: Int)
      : Dataset[ResampledAudioRow] = {
    require(k >= 1, s"resample factor must be >= 1, got $k")
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { m =>
        MediaCodecs.decodeAudio(m.payload) match {
          case Some((fmt, a)) if a.channels >= 1 &&
              a.samples.length >= k * a.channels &&
              a.sampleRate >= k =>
            val ch = a.channels
            val nPerCh = a.samples.length / ch
            val outPerCh = nPerCh / k
            val out = new Array[Short](outPerCh * ch)
            var j = 0
            while (j < outPerCh) {
              var c = 0
              while (c < ch) {
                var sum = 0L
                var d = 0
                while (d < k) {
                  sum += a.samples((j * k + d) * ch + c)
                  d += 1
                }
                out(j * ch + c) = (sum / k).toShort
                c += 1
              }
              j += 1
            }
            val rt = MediaCodecs.decodeWav(MediaCodecs.encodeWav(
              MediaCodecs.Audio(a.sampleRate / k, ch, out)))
            var s = 0L; var cks = 0L; var i = 0
            while (i < rt.samples.length) {
              s += rt.samples(i)
              cks += (i + 1L) * rt.samples(i)
              i += 1
            }
            Iterator.single(ResampledAudioRow(m.media_id, fmt,
              rt.sampleRate, rt.channels, rt.samples.length.toLong, s,
              cks, s.toDouble / rt.samples.length))
          case _ => Iterator.empty
        }
      }
    }
  }

  final case class EdgeHistRow(
      media_id: Long, format: String, n_interior: Long,
      b0: Long, b1: Long, b2: Long, b3: Long,
      mag0: Long, mag1: Long, mag2: Long, mag3: Long)

  /** HOG-style edge-orientation histogram — the feature-extraction
    * verb over decoded pixels: integer central-difference gradients of
    * the green channel at every interior pixel, quantized to 4
    * orientation bins (gx-dominant, gy-dominant, and the two diagonal
    * quadrants by gradient-sign product), with per-bin |gx|+|gy|
    * magnitude sums. Entirely integer arithmetic — bins and magnitudes
    * hash-match any engine that can replay the pixel formula.
    * Bin rule (deterministic, no atan): |gx| ≥ 2|gy| → 0;
    * |gy| ≥ 2|gx| → 1; else gx·gy > 0 → 2, otherwise 3.
    * Map-side decode; payloads never shuffle. */
  def edgeHistogram(media: Dataset[MediaRow]): Dataset[EdgeHistRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { m =>
        MediaCodecs.decodeImage(m.payload) match {
          case Some((fmt, img)) if img.width >= 3 && img.height >= 3 =>
            def green(x: Int, y: Int): Int =
              img.rgb((y * img.width + x) * 3 + 1) & 0xff
            val b = new Array[Long](4)
            val mag = new Array[Long](4)
            var n = 0L
            var y = 1
            while (y < img.height - 1) {
              var x = 1
              while (x < img.width - 1) {
                val gx = green(x + 1, y) - green(x - 1, y)
                val gy = green(x, y + 1) - green(x, y - 1)
                val ax = math.abs(gx); val ay = math.abs(gy)
                val bin =
                  if (ax >= 2 * ay) 0
                  else if (ay >= 2 * ax) 1
                  else if (gx * gy > 0) 2
                  else 3
                b(bin) += 1
                mag(bin) += ax + ay
                n += 1
                x += 1
              }
              y += 1
            }
            Iterator.single(EdgeHistRow(m.media_id, fmt, n,
              b(0), b(1), b(2), b(3), mag(0), mag(1), mag(2), mag(3)))
          case _ => Iterator.empty
        }
      }
    }
  }

  final case class AugmentedImageRow(
      media_id: Long, format: String, out_w: Int, out_h: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, pos_checksum: Long)

  /** Deterministic image augmentation — horizontal FLIP then CROP to
    * the top-left `cw`×`ch` window, re-encoded (BMP) and decoded
    * again (the resizePixels round-trip discipline). The emitted
    * position-weighted checksum makes the flip ORIENTATION and crop
    * OFFSETS load-bearing, not just the surviving pixel multiset:
    * Σ (y·out_w + x + 1) · (r + 2g + 3b) over the cropped raster.
    * Map-side only; payloads never shuffle. Images smaller than the
    * crop window are skipped. */
  def flipCrop(media: Dataset[MediaRow], cw: Int, ch: Int)
      : Dataset[AugmentedImageRow] = {
    require(cw >= 1 && ch >= 1, s"bad crop ${cw}x$ch")
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { m =>
        MediaCodecs.decodeImage(m.payload) match {
          case Some((fmt, img)) if img.width >= cw && img.height >= ch =>
            val out = new Array[Byte](cw * ch * 3)
            var y = 0
            while (y < ch) {
              var x = 0
              while (x < cw) {
                // horizontal flip: source column is width-1-x
                val src = (y * img.width + (img.width - 1 - x)) * 3
                val dst = (y * cw + x) * 3
                out(dst) = img.rgb(src)
                out(dst + 1) = img.rgb(src + 1)
                out(dst + 2) = img.rgb(src + 2)
                x += 1
              }
              y += 1
            }
            val rt = MediaCodecs.decodeBmp(
              MediaCodecs.encodeBmp(MediaCodecs.Image(cw, ch, out)))
            var sr = 0L; var sg = 0L; var sb = 0L; var cks = 0L
            var i = 0
            while (i < rt.width * rt.height) {
              val r = rt.rgb(i * 3) & 0xff
              val g = rt.rgb(i * 3 + 1) & 0xff
              val b = rt.rgb(i * 3 + 2) & 0xff
              sr += r; sg += g; sb += b
              cks += (i + 1L) * (r + 2L * g + 3L * b)
              i += 1
            }
            Iterator.single(AugmentedImageRow(m.media_id, fmt,
              rt.width, rt.height, sr, sg, sb, cks))
          case _ => Iterator.empty
        }
      }
    }
  }

  final case class AugmentedAudioRow(
      media_id: Long, format: String, n: Long, n_clipped: Long,
      sum_out: Long, pos_checksum: Long)

  /** Deterministic audio augmentation — integer gain by num/den
    * (truncating division, the engines' shared contract) with
    * clipping to int16, through a WAV round-trip. Reports how many
    * samples actually clipped plus order-pinning checksums. */
  def gainClip(media: Dataset[MediaRow], num: Long, den: Long)
      : Dataset[AugmentedAudioRow] = {
    require(num > 0 && den > 0, s"bad gain $num/$den")
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { m =>
        MediaCodecs.decodeAudio(m.payload) match {
          case Some((fmt, a)) if a.samples.nonEmpty =>
            val out = new Array[Short](a.samples.length)
            var clipped = 0L
            var i = 0
            while (i < out.length) {
              val v = a.samples(i) * num / den
              val c =
                if (v > 32767L) { clipped += 1; 32767L }
                else if (v < -32768L) { clipped += 1; -32768L }
                else v
              out(i) = c.toShort
              i += 1
            }
            val rt = MediaCodecs.decodeWav(MediaCodecs.encodeWav(
              MediaCodecs.Audio(a.sampleRate, a.channels, out)))
            var s = 0L; var cks = 0L; var k = 0
            while (k < rt.samples.length) {
              s += rt.samples(k)
              cks += (k + 1L) * rt.samples(k)
              k += 1
            }
            Iterator.single(AugmentedAudioRow(m.media_id, fmt,
              rt.samples.length.toLong, clipped, s, cks))
          case _ => Iterator.empty
        }
      }
    }
  }

  /** Resize: pure metadata transform (the real op also re-encodes the
    * payload — stubbed to keep bytes unchanged). */
  def resizeMeta(media: Dataset[MediaRow], maxW: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.width <= maxW) m
      else {
        val scale = maxW.toDouble / m.width
        m.copy(width = maxW,
          height = math.max((m.height * scale).toInt, 1))
      }
    }
  }
}
