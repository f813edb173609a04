package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Embedding similarity search over an `Array[Float]` column.
  *
  * Exact brute-force cosine is the correctness baseline; partial scores
  * are computed in fixed-scale DECIMAL so results are associative —
  * deterministic under any partitioning (and bit-identical to the DuckDB
  * oracle). The LSH path (random-hyperplane bucketing) is the 100 TB
  * scale route: it turns the O(Q·N) cross product into a bucket-local
  * join.
  */
object Similarity {

  private val dec = DecimalType(18, 9)

  /** Long form: one row per (vec_id, i, e) with doubles. Map-side only. */
  def explodeVecs(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol), posexplode(col(vecCol)).as(Seq("i", "e")))
      .select(col(idCol), col("i"), col("e").cast(DoubleType).as("e"))

  /** Squared norms per vector, exact (decimal partials). */
  def norms(ex: DataFrame, idCol: String): DataFrame =
    ex.groupBy(idCol)
      .agg(sum((col("e") * col("e")).cast(dec)).cast(DoubleType).as("nn"))

  /** Exact top-k cosine neighbors for every query vector.
    *
    * queries/candidates are long-form frames from [[explodeVecs]]. The
    * dot products reduce by (query, candidate) with map-side partial
    * aggregation; for a bounded query set the query side is broadcast so
    * the candidate scan parallelizes without a shuffle of the big side.
    */
  def bruteForceTopK(
      queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val qx = queries.select(
      col("vec_id").as("query_id"), col("i"), col("e").as("qe"))
    val cx = candidates.select(
      col("vec_id").as("cand_id"), col("i"), col("e").as("ce"))
    val dots = cx.join(broadcast(qx), Seq("i"))
      .filter(col("query_id") =!= col("cand_id"))
      .groupBy("query_id", "cand_id")
      .agg(sum((col("qe") * col("ce")).cast(dec)).cast(DoubleType).as("dot"))
    val nq = norms(queries, "vec_id")
      .withColumnsRenamed(Map("vec_id" -> "query_id", "nn" -> "qnn"))
    val nc = norms(candidates, "vec_id")
      .withColumnsRenamed(Map("vec_id" -> "cand_id", "nn" -> "cnn"))
    val scored = dots
      .join(broadcast(nq), Seq("query_id"))
      .join(nc, Seq("cand_id"))
      .withColumn("cosine",
        col("dot") / (sqrt(col("qnn")) * sqrt(col("cnn"))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("cand_id"))
    scored
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "rank", "cosine")
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup detection).
    * Exact; the LSH variant prunes the same computation by bucket. */
  def cosinePairsAbove(ex: DataFrame, threshold: Double): DataFrame = {
    val a = ex.select(col("vec_id").as("id_a"), col("i"), col("e").as("ea"))
    val b = ex.select(col("vec_id").as("id_b"), col("i"), col("e").as("eb"))
    val dots = a.join(b, Seq("i"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(sum((col("ea") * col("eb")).cast(dec)).cast(DoubleType).as("dot"))
    val nn = norms(ex, "vec_id")
    dots
      .join(nn.withColumnsRenamed(Map("vec_id" -> "id_a", "nn" -> "nna")),
        Seq("id_a"))
      .join(nn.withColumnsRenamed(Map("vec_id" -> "id_b", "nn" -> "nnb")),
        Seq("id_b"))
      .withColumn("cosine",
        col("dot") / (sqrt(col("nna")) * sqrt(col("nnb"))))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Random-hyperplane LSH bucketing: `nBits` sign bits from fixed
    * pseudo-random hyperplanes (deterministic, seeded by dimension
    * index — no RNG state to ship to executors). Vectors that share a
    * bucket signature are candidate neighbors; at scale the exact
    * scoring then runs per-bucket instead of all-pairs. */
  def lshBuckets(emb: DataFrame, idCol: String, vecCol: String,
      nBits: Int, dim: Int): DataFrame = {
    // hyperplane h, component i = sin(h * dim + i) — fixed, cheap,
    // full-rank in practice; evaluated inside codegen.
    val bits = (0 until nBits).map { h =>
      val dot = (0 until dim).map { i =>
        element_at(col(vecCol), i + 1).cast(DoubleType) *
          sin(lit((h * dim + i + 1).toDouble))
      }.reduce(_ + _)
      when(dot >= 0, lit("1")).otherwise(lit("0"))
    }
    emb.select(col(idCol), concat(bits: _*).as("bucket"))
  }
}
