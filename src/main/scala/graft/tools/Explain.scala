package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Plan inspection / single-query timing:
  *   sbt "runMain graft.tools.Explain q27_embedding_neardup /root/testdata/sf0.1"
  * Prints the formatted physical plan, then executes with timing.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)
    val df = Registry.queries(name)(spark, sfDir)
    df.explain("formatted")
    (1 to 2).foreach { round =>
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[explain] run$round rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
