package graft

import org.apache.spark.sql.SparkSession

/** Same-JVM alternating A/B for the ScanSpread repair: runs each named
  * query `reps`× with the repair ON and OFF, interleaved (so box phase
  * hits both arms equally), and prints per-arm medians. This is the
  * decision tool for the borderline call sites — cross-session ratios
  * at the 0.2–0.5 s scale are dominated by window noise.
  *
  * `sbt "Test/runMain graft.SpreadAB <dir> <q,[q...]> [reps]"`
  */
object SpreadAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args(1).split(",").map(_.trim).toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.seal.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      s
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    names.foreach { name =>
      // warm both arms (codegen + JIT) before measuring
      spark.conf.set("spark.graft.scanspread.enabled", "true"); once(name)
      spark.conf.set("spark.graft.scanspread.enabled", "false"); once(name)
      val on = scala.collection.mutable.ArrayBuffer[Double]()
      val off = scala.collection.mutable.ArrayBuffer[Double]()
      for (_ <- 1 to reps) {
        spark.conf.set("spark.graft.scanspread.enabled", "true")
        on += once(name)
        spark.conf.set("spark.graft.scanspread.enabled", "false")
        off += once(name)
      }
      println(f"AB $name%-40s on=${median(on.toSeq)}%6.3f " +
        f"off=${median(off.toSeq)}%6.3f  ratio=${
          median(on.toSeq) / median(off.toSeq)}%5.2f  " +
        f"(on: ${on.map(x => f"$x%.2f").mkString(",")} | " +
        f"off: ${off.map(x => f"$x%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
