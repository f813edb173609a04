package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off A/B: does repartitioning the single-row-group documents
  * scan before the shingle explode parallelize the dedup family's
  * dominant stage? (round 19 measurement; see OPTIMIZATION_r19.md) */
object SpreadExperiment {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val docs = Tables.load(spark, dir, "documents")
    println(s"scan partitions: ${docs.rdd.getNumPartitions}")

    // warm both paths once (codegen/JIT), then measure twice each
    for (round <- 0 to 2) {
      val tag = if (round == 0) "warmup" else s"run$round"
      time(s"$tag serial-shingles") {
        graft.operators.Dedup.shingleSets(docs, 3)
          .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"$tag spread-shingles") {
        graft.operators.Dedup.shingleSets(
            docs.repartition(spark.sparkContext.defaultParallelism), 3)
          .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"$tag serial-q70-pairs") {
        graft.operators.Dedup.ngramJaccardPairs(docs, 3, 0.3, 1 << 20)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"$tag spread-q70-pairs") {
        graft.operators.Dedup.ngramJaccardPairs(
            docs.repartition(spark.sparkContext.defaultParallelism),
            3, 0.3, 1 << 20)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
