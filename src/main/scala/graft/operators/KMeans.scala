package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Lloyd's k-means over an `Array[Float]` embedding column — the
  * clustering step of embedding-space corpus curation (semantic
  * dedup cells, diversity sampling, IVF coarse-quantizer training for
  * [[Similarity.ivfTopK]]).
  *
  * Deterministic and oracle-exact by construction:
  *   - init: the k lowest-vec_id vectors are the seed centroids (the
  *     standard "first k points" seeding, made reproducible);
  *   - distance: squared L2 with per-term DECIMAL(18,9) quantized
  *     partial sums — associative, so bit-identical under any
  *     partitioning and in DuckDB;
  *   - assignment: lexicographic (distance, centroid-id) argmin as a
  *     struct-min aggregate (map-side combinable — no sort+window);
  *   - update: per-dimension decimal-exact sums divided by the cluster
  *     size in double (IEEE division is deterministic).
  *
  * Scale shape: vectors stay in long form (vec_id, dim, value) only
  * inside per-iteration aggregations; centroids (k×dim rows) are
  * broadcast every round — the same structure Spark MLlib uses, minus
  * its driver-side centroid array. Each iteration is two shuffles
  * (distance agg keyed on (vec, centroid), update agg keyed on
  * (cluster, dim)); iteration count is a fixed small constant, so
  * lineage stays bounded without checkpointing.
  */
object KMeans {

  private val termDec = DecimalType(18, 9)

  /** (id, i, x) long form; x as double. */
  private def longForm(df: DataFrame, id: String): DataFrame =
    df.select(col("vec_id").as(id),
        posexplode(col("embedding")).as(Seq("i", "xf")))
      .select(col(id), col("i"), col("xf").cast(DoubleType).as("x"))

  /** Run `iters` Lloyd iterations from the k lowest-id seeds and
    * return the final assignment: (vec_id, cluster, dist) where
    * cluster is the seed centroid's id slot and dist the exact squared
    * L2 distance to the final centroid. */
  def fitAssign(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    require(iters >= 1)
    val ev = longForm(emb, "vec_id")
    // (cid, i, c) — seed centroids are data points
    var cent = longForm(emb.filter(col("vec_id") < k), "cid")
      .select(col("cid"), col("i"), col("x").as("c"))
    var assigned: DataFrame = null
    for (t <- 1 to iters) {
      val dist = ev.join(broadcast(cent), Seq("i"))
        .groupBy("vec_id", "cid")
        .agg(sum(((col("x") - col("c")) * (col("x") - col("c")))
          .cast(termDec)).cast(DoubleType).as("d"))
      assigned = dist.groupBy("vec_id")
        .agg(min(struct(col("d"), col("cid"))).as("_m"))
        .select(col("vec_id"), col("_m.cid").as("cluster"),
          col("_m.d").as("dist"))
      if (t < iters)
        cent = assigned.join(ev, "vec_id")
          .groupBy(col("cluster").as("cid"), col("i"))
          .agg((sum(col("x").cast(termDec)).cast(DoubleType) /
            count(lit(1))).as("c"))
    }
    assigned
  }
}
