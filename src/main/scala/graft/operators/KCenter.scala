package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Greedy (Gonzalez) k-center — farthest-point traversal over an
  * `Array[Float]` embedding column: the classic 2-approximation for
  * max-coverage center selection, used in corpus curation as a
  * DIVERSITY coreset (pick the k mutually-farthest documents as
  * anchors / eval probes / annotation seeds — the opposite selection
  * pressure from density-seeking k-means).
  *
  * Deterministic and oracle-exact by construction, like [[KMeans]]:
  * squared-L2 with DECIMAL(18,9) per-term quantized partials
  * (associative → partitioning-independent and DuckDB-replayable), and
  * the farthest-point argmax is the lexicographic (d, -vec_id)
  * struct-max — greatest distance, lowest id on ties.
  *
  * Scale shape: each of the k rounds is ONE map-side projection over
  * the corpus (current centers collapse to a single broadcast row of
  * (cid, carr) arrays; every vector computes its min distance to them
  * inside one Project) followed by a single-row struct-max aggregate —
  * no pairwise join, no shuffle of vectors, O(k) scans total. The
  * 1-row-per-round collect is control-plane (the BPE-merges pattern),
  * not a data path. k is a small constant; centers live as a k-row
  * filter, never a driver-side matrix.
  */
object KCenter {

  /** Run greedy k-center from the lowest-id seed. Returns one row per
    * round: (round, center_id, radius) where radius is the max-min
    * squared distance that SELECTED the round's center — i.e. the
    * coverage radius of the previous center set (round 0 = the seed,
    * radius 0 by convention). */
  def select(emb: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val spark = emb.sparkSession
    // spread before caching: the cached frame inherits the scan's
    // partitioning, so a single-row-group table would otherwise run
    // every round's min-distance projection on ONE task (round 19,
    // see ScanSpread); identity when the input already scans wide
    val vecs = graft.sources.ScanSpread
      .spread(emb.select(col("vec_id"), col("embedding"))).cache()

    def longForm(df: DataFrame, id: String): DataFrame =
      df.select(col("vec_id").as(id),
          posexplode(col("embedding")).as(Seq("i", "xf")))
        .select(col(id), col("i"), col("xf").cast(DoubleType).as("x"))

    // one broadcast row: [(cid, carr), ...] for the current center set
    def gather(ids: Seq[Long]): DataFrame =
      longForm(vecs.filter(col("vec_id").isin(ids: _*)), "cid")
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("i"), col("x")))),
          t => t.getField("x")).as("carr"))
        .agg(collect_list(struct(col("cid"), col("carr"))).as("cents"))

    // min over centers of the exact decimal squared L2 — the KMeans
    // assign kernel with min-distance instead of argmin (round 20:
    // compiled DecimalFold kernel, semantics pinned by DecimalFoldSpec)
    val minDist = array_min(transform(col("cents"), ct =>
      graft.expressions.DecimalFold
        .sqDist(col("embedding"), ct.getField("carr"))))

    val seed = vecs.agg(min(col("vec_id"))).head().getLong(0)
    var chosen = Seq(seed)
    val rounds = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    rounds += ((0L, seed, 0.0))
    for (t <- 1 until k) {
      // argmax (d, -vec_id): farthest point, lowest id on exact ties
      val next = vecs.crossJoin(broadcast(gather(chosen)))
        .select(col("vec_id"), minDist.as("d"))
        .agg(max(struct(col("d"), (-col("vec_id")).as("nid"))).as("m"))
        .select(col("m.d"), (-col("m.nid")).as("vec_id"))
        .head()
      val (r, cid) = (next.getDouble(0), next.getLong(1))
      rounds += ((t.toLong, cid, r))
      chosen = chosen :+ cid
    }
    vecs.unpersist()
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rounds.toSeq.map { case (a, b, c) => Row(a, b, c) }, 1),
      StructType(Seq(
        StructField("round", LongType, nullable = false),
        StructField("center_id", LongType, nullable = false),
        StructField("radius", DoubleType, nullable = false))))
  }
}
