package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one per suite, lazy), with the
  * engine's extensions installed — the same surface Verify/Bench run. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.register(s)
    s
  }

  lazy val sf: String = "/root/testdata/sf0.001"

  /** Executed-plan string of a registry query with sealing DISABLED
    * while building: CacheOps.sealThen otherwise replaces the whole
    * upstream plan with `Scan ExistingRDD`, making every plan
    * assertion on a sealed query vacuously true. One shared
    * definition — per-suite copies of this protocol is how the
    * vacuous-assert bug crept in. */
  protected def plan(name: String): String = {
    val prev = spark.conf.getOption("spark.graft.seal.enabled")
    spark.conf.set("spark.graft.seal.enabled", "false")
    try queries.Registry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString
    finally {
      operators.CacheOps.sweep(spark)
      prev match {
        case Some(v) => spark.conf.set("spark.graft.seal.enabled", v)
        case None => spark.conf.unset("spark.graft.seal.enabled")
      }
    }
  }
}
