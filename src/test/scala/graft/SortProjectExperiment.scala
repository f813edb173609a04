package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off A/B (round 19): a map-only pipeline ending in a global
  * orderBy pays the range-partitioner SAMPLE pass, which re-executes
  * the whole child — including the expensive projection. Reordering
  * to sort FIRST and project AFTER should sample only the cheap scan.
  * Verifies Catalyst keeps Project above Sort, and times both. */
object SortProjectExperiment {
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
    import graft.functions.TextFuncs._

    val docs = Tables.load(spark, dir, "documents")
    def heavy = Seq(
      tokenCount(col("text")).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("len_chars"),
      avgWordLen(col("text")).as("avg_word_len"))

    val a = docs.select(col("doc_id") +: heavy: _*).orderBy("doc_id")
    val b = docs.select(col("doc_id"), col("text")).orderBy("doc_id")
      .select(col("doc_id") +: heavy: _*)

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm
    a.write.format("noop").mode("overwrite").save()
    b.write.format("noop").mode("overwrite").save()
    println("== plan B (sort-first) ==")
    println(b.queryExecution.executedPlan.toString.linesIterator
      .take(8).mkString("\n"))
    for (r <- 1 to 3) {
      time(s"run$r project-then-sort") {
        a.write.format("noop").mode("overwrite").save() }
      time(s"run$r sort-then-project") {
        b.write.format("noop").mode("overwrite").save() }
    }
    // result equality
    val ca = a.collect().map(_.toString)
    val cb = b.collect().map(_.toString)
    println(s"rows equal: ${ca.sameElements(cb)}")
    spark.stop()
  }
}
