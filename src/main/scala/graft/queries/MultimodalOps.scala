package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Multimodal pipeline surface (rows-only gate — payload bytes aren't
  * ANSI-SQL territory; MultimodalSpec asserts determinism and batch
  * shape instead). */
object MultimodalOps {

  val qs: Seq[Q] = Seq(
    Q("q34_multimodal_pipeline",
      (s, dir) => {
        val media = Multimodal.packMedia(Tables.load(s, dir, "documents"))
        val decoded = Multimodal.decode(media).toDF()
        val feats = Multimodal.extractFeatures(media, 32).toDF()
        decoded.join(feats, "media_id")
          .select(col("media_id"), col("kind"), col("n_bytes"),
            col("checksum"), element_at(col("feature"), 1).as("f0"))
          .orderBy("media_id")
      },
      None))
}
