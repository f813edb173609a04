package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Row counts from parquet FOOTER metadata — no data scan.
  *
  * A dispatch decision ("is this corpus big enough to sample?") that
  * runs `df.count()` reads the whole corpus once just to decide how to
  * read it (r15 verdict #5). Every parquet file's footer already
  * carries its exact row count; summing footers gives the same number
  * for a few KB of metadata I/O per file. At cluster scale the footer
  * reads are distributed (one lightweight task per file batch), so the
  * probe is proportional to FILE COUNT, not data volume.
  */
object ParquetStats {

  /** True iff `df` has more than `threshold` rows, WITHOUT a full
    * scan: catalog/CBO row-count statistics when present, else a
    * bounded take-probe — `executeTake` evaluates partitions
    * incrementally (1 partition, then 4× scale-ups), so deciding
    * "more than N rows?" against a petabyte table reads the first
    * partition's leading row groups, not the table. The probed
    * projection is a literal, so the columnar scan materializes no
    * data columns. This is the routing probe for every
    * size-dispatched operator (near-dup, ANN, spatial join): the
    * alternative, `df.count()`, reads the corpus once just to decide
    * how to read it. */
  def exceedsRows(df: DataFrame, threshold: Long): Boolean =
    df.queryExecution.optimizedPlan.stats.rowCount match {
      case Some(n) => n > BigInt(threshold)
      case None =>
        val probe = (math.min(threshold, Int.MaxValue - 2L) + 1).toInt
        df.select(org.apache.spark.sql.functions.lit(true))
          .take(probe).length > threshold
    }

  /** Exact row count of `df`'s backing parquet files, or None when
    * the frame is not a pure file-backed scan (in-memory test frames,
    * post-transform frames whose row count differs from the files').
    *
    * CORRECTNESS GUARD: the footer count equals `df.count()` only
    * when nothing between the scan and `df` changes cardinality —
    * callers must pass the raw loaded table (projections are fine,
    * filters are not). WHITELIST, not blacklist: only plans built
    * entirely from provably row-preserving nodes (projection, alias,
    * sort, repartition) over a file relation qualify; any node we
    * can't vouch for (Filter, Aggregate, Join, Generate, Expand,
    * MapPartitions, limits, set ops, …) refuses — the caller falls
    * back to an exact count(), so an unknown node can never produce a
    * wrong answer, only a slower one. */
  def footerRowCount(spark: SparkSession, df: DataFrame): Option[Long] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val cardinalityPreserving = df.queryExecution.optimizedPlan.collect {
      case n => n
    }.forall {
      case _: Project | _: SubqueryAlias | _: Sort => true
      case _: RepartitionOperation => true
      case _: LogicalRelation => true
      case _ => false
    }
    if (!cardinalityPreserving) return None
    val files =
      try df.inputFiles.toSeq
      catch { case _: Throwable => Seq.empty }
    if (files.isEmpty || !files.forall(_.contains(".parquet"))) None
    else {
      try {
        val conf = new org.apache.spark.util.SerializableConfiguration(
          spark.sessionState.newHadoopConf())
        // distributed footer reads: tasks ∝ files, bytes ∝ footers
        val slices = math.max(1, math.min(files.size, 64))
        Some(spark.sparkContext.parallelize(files, slices).map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f), conf.value)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRecordCount finally r.close()
        }.sum().toLong)
      } catch { case _: Throwable => None }
    }
  }
}
