package graft

import org.apache.spark.sql.SparkSession

/** Same-JVM alternating A/B for the streaming landing-zone fan-out
  * (round 20): runs each named twin `reps`× with the multi-file
  * landing (default caps) and with the single-file landing
  * (`spark.graft.stream.landing.fanout = 1`), interleaved, and prints
  * per-arm medians — the same decision discipline as SpreadAB. Each
  * layout keys its own landing/checkpoint dirs, so after the first
  * build both arms reuse their on-disk copies.
  *
  * `sbt "Test/runMain graft.StreamAB <dir> <q,[q...]> [reps]"`
  */
object StreamAB {
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
      graft.operators.CacheOps.sweep(spark, blocking = true)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val key = "spark.graft.stream.landing.fanout"

    // multi arm fan: default = the call sites' own caps (conf unset);
    // STREAM_AB_FAN=<n> pins the multi arm to n instead
    val multiFan = sys.env.get("STREAM_AB_FAN")
    def setMulti(): Unit = multiFan match {
      case Some(n) => spark.conf.set(key, n)
      case None => spark.conf.unset(key)
    }
    names.foreach { name =>
      // warm both arms (landing build + codegen + JIT) before measuring
      setMulti(); once(name)
      spark.conf.set(key, "1"); once(name)
      val multi = scala.collection.mutable.ArrayBuffer[Double]()
      val single = scala.collection.mutable.ArrayBuffer[Double]()
      for (_ <- 1 to reps) {
        setMulti()
        multi += once(name)
        spark.conf.set(key, "1")
        single += once(name)
      }
      println(f"AB $name%-40s multi=${median(multi.toSeq)}%6.3f " +
        f"single=${median(single.toSeq)}%6.3f  ratio=${
          median(multi.toSeq) / median(single.toSeq)}%5.2f  " +
        f"(multi: ${multi.map(x => f"$x%.2f").mkString(",")} | " +
        f"single: ${single.map(x => f"$x%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
