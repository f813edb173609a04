package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins (reference's composite-index replacement,
  * SURVEY.md §4): write both sides of a recurring join bucketed by the
  * join key so every subsequent join between them is shuffle-free —
  * the bucketing metadata lives in the session catalog and Catalyst
  * plans a SortMergeJoin with zero Exchange.
  *
  * This is the 100 TB answer for fact⋈fact joins repeated across many
  * queries (e.g. lineitem⋈orders): pay the shuffle once at write time.
  */
object CoLocate {

  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    // idempotent: drop catalog entry AND any orphaned location left by
    // a previous session (the in-memory catalog forgets, the dir stays)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** True if the physical plan of `df` contains a shuffle exchange —
    * used by tests to prove co-located joins skip the shuffle. Executes
    * the frame first so AQE's final plan (hidden behind the leaf-like
    * AdaptiveSparkPlanExec wrapper) is what gets inspected. */
  def hasShuffle(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    df.write.format("noop").mode("overwrite").save()
    def walk(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case _: ShuffleExchangeLike => true
      case q: QueryStageExec => walk(q.plan)
      case other => other.children.exists(walk)
    }
    walk(df.queryExecution.executedPlan)
  }
}
