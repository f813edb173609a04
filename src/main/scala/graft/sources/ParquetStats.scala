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

  /** Row count that is EXACT by construction: only plan shapes whose
    * cardinality is statically known (a local relation, a Range) under
    * provably row-preserving wrappers. Deliberately NOT
    * `optimizedPlan.stats.rowCount` — with CBO/plan-stats enabled that
    * field can be a catalog-stale or filter-selectivity ESTIMATE, and
    * a dispatch gate that trusts an estimate near its threshold flips
    * the execution path (exact-jaccard vs LSH, broadcast vs shuffle)
    * on a guess where the contract is an exact decision (r16 ADVICE). */
  private def exactPlanRows(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Option[Long] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    p match {
      case l: LocalRelation => Some(l.data.size.toLong)
      case r: Range => Some(r.numElements).filter(_.isValidLong)
        .map(_.toLong)
      case pr: Project => exactPlanRows(pr.child)
      case s: SubqueryAlias => exactPlanRows(s.child)
      case s: Sort => exactPlanRows(s.child)
      case r: RepartitionOperation => exactPlanRows(r.child)
      case _ => None
    }
  }

  /** True iff `df` has more than `threshold` rows, WITHOUT a full
    * scan: a statically-exact plan cardinality when available
    * ([[exactPlanRows]] — never a CBO estimate), else a bounded
    * incremental probe: partitions are counted in executeTake-style
    * waves (1 partition, then 4× scale-ups) and each task stops
    * iterating once it alone has seen threshold+1 rows — so deciding
    * "more than N rows?" against a petabyte table reads the first
    * partition's leading row groups, not the table, and the driver
    * holds one Long per probed partition (O(partitions), NOT
    * O(threshold) — no materialized rows, no Int clamp on the
    * threshold). The probed projection is a literal, so the columnar
    * scan materializes no data columns. This is the routing probe for
    * every size-dispatched operator (near-dup, ANN, spatial join):
    * the alternative, `df.count()`, reads the corpus once just to
    * decide how to read it. */
  def exceedsRows(df: DataFrame, threshold: Long): Boolean = {
    require(threshold >= 0, s"threshold must be non-negative: $threshold")
    exactPlanRows(df.queryExecution.optimizedPlan) match {
      case Some(n) => n > threshold
      case None =>
        val rdd = df.select(org.apache.spark.sql.functions.lit(true)).rdd
        val total = rdd.getNumPartitions
        val sc = df.sparkSession.sparkContext
        var seen = 0L
        var scanned = 0
        var wave = 1
        while (seen <= threshold && scanned < total) {
          val parts = scanned until math.min(total, scanned + wave)
          // per-task cap: a single over-threshold partition stops
          // iterating (and reading) at threshold+1 rows
          val counts = sc.runJob(rdd,
            (it: Iterator[org.apache.spark.sql.Row]) => {
              var c = 0L
              while (it.hasNext && c <= threshold) { it.next(); c += 1L }
              c
            }, parts)
          var i = 0
          while (i < counts.length) { seen += counts(i); i += 1 }
          scanned += parts.size
          wave *= 4
        }
        seen > threshold
    }
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
        // distributed footer reads: tasks ∝ files, bytes ∝ footers.
        // Summed as Long via fold — RDD.sum() accumulates in Double,
        // which above 2^53 total rows would silently round the "exact
        // row count" contract (q325 pins footer == count(*)).
        val slices = math.max(1, math.min(files.size, 64))
        Some(spark.sparkContext.parallelize(files, slices).map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f), conf.value)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRecordCount finally r.close()
        }.fold(0L)(_ + _))
      } catch { case _: Throwable => None }
    }
  }
}
