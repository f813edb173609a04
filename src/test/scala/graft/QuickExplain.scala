package graft

import org.apache.spark.sql.SparkSession

/** One-off executed-plan dump for a registered query at an arbitrary
  * data dir — the adjudication tool behind cross-scale plan diffs
  * (e.g. "did AQE flip a join strategy between 10x and 100x?").
  *
  * `sbt "Test/runMain graft.QuickExplain <dir> <query>[,query...]"`
  * — prints the ADAPTIVE final plan (runs the query through noop
  * first so AQE has materialized its decisions), then the PlanAudit
  * counts.
  */
object QuickExplain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).headOption
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("q1_time_bucket_agg"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.seal.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan
      println(s"==== $name @ $dir ====")
      println(plan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Aggregate") || l.contains("Window"))
        .mkString("\n"))
      println(s"AUDIT $name ${PlanAudit.audit(plan)}")
    }
    spark.stop()
  }
}
