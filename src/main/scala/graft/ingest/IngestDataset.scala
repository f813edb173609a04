package graft.ingest

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-per-dataset ingest namespace over partitioned parquet — the
  * Spark analog of the reference's per-crawler Postgres schema +
  * hypertable layout (`common/base_crawler.py:20-22`,
  * `create_hypertable` sites, SURVEY.md §1.1).
  *
  * Layout: `<warehouse>/<schemaName>/<table>/[date=YYYY-MM-DD/]*.parquet`
  * Time-partitioned tables derive a `date` partition column from their
  * time column at write, so Catalyst partition pruning replaces
  * TimescaleDB chunk exclusion. At 100 TB each daily partition is
  * written once and appended-to idempotently; no operation here ever
  * rewrites more than the touched partitions except the explicitly
  * schema-evolving path.
  */
final class IngestDataset(
    val spark: SparkSession, warehouse: String, schemaName: String) {

  def tablePath(table: String): String = s"$warehouse/$schemaName/$table"

  def tableExists(table: String): Boolean = {
    val p = new Path(tablePath(table))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p)
  }

  def read(table: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(tablePath(table))

  /** K1 — plain transactional-ish append. `pk` dedups the incoming
    * batch (reference declares PKs and drops dups ingest-side,
    * SURVEY.md §1.3); `antiJoinExisting` additionally drops rows whose
    * key already exists (smard.py:169-171 keep-first semantics). */
  /** `clusterBy` — K9 analog of the reference's composite b-tree
    * indexes: sortWithinPartitions before write, so parquet row-group
    * min/max statistics become selective on those columns and point/
    * range reads skip row groups (no extra shuffle — sorting is
    * partition-local). */
  def append(
      table: String, df: DataFrame, partitionTs: Option[String] = None,
      pk: Seq[String] = Nil, antiJoinExisting: Boolean = false,
      clusterBy: Seq[String] = Nil): Unit = {
    var batch = if (pk.nonEmpty) df.dropDuplicates(pk) else df
    if (antiJoinExisting && pk.nonEmpty && tableExists(table))
      batch = batch.join(read(table).select(pk.map(col): _*).distinct(),
        pk, "left_anti")
    write(batch, table, SaveMode.Append, partitionTs, clusterBy)
  }

  /** K2 — full replace (dimension/static tables). */
  def overwrite(table: String, df: DataFrame,
      partitionTs: Option[String] = None): Unit = {
    if (tableExists(table)) rewriteAtomically(table, df, partitionTs)
    else write(df, table, SaveMode.Overwrite, partitionTs)
  }

  /** K3 — schema-evolving append: if the new batch's columns differ
    * from the stored schema, fall back to union-by-name + rewrite
    * (exactly the reference's concat-replace path,
    * `entsoe_crawler.py:196-209`); otherwise a plain append. */
  def appendEvolve(table: String, df: DataFrame,
      partitionTs: Option[String] = None): Unit = {
    if (!tableExists(table)) { write(df, table, SaveMode.Append, partitionTs); return }
    val existing = read(table)
    val existingCols = existing.columns.map(_.toLowerCase).toSet
    val newCols = df.columns.map(_.toLowerCase).toSet
    val dropPart = partitionTs.map(_ => Set("date")).getOrElse(Set.empty)
    if (newCols == existingCols -- dropPart) {
      write(df, table, SaveMode.Append, partitionTs)
    } else {
      val merged = existing.drop(dropPart.toSeq: _*)
        .unionByName(df, allowMissingColumns = true)
      rewriteAtomically(table, merged, partitionTs)
    }
  }

  /** I5 — revision-window overwrite (Delta `replaceWhere` analog on
    * parquet): replaces exactly the partitions intersecting
    * [from, until) with (existing-outside-window ∪ batch), leaving all
    * other partitions untouched. This is how mutable upstream windows
    * (re-crawl from last Sunday, 30-day quality lag) are re-ingested
    * without duplicating rows. */
  def replaceWindow(table: String, batch: DataFrame, tsCol: String,
      from: java.sql.Timestamp, until: java.sql.Timestamp): Unit = {
    require(tableExists(table), s"$table must exist for replaceWindow")
    val existing = read(table)
    // Enumerate the touched date partitions up front: dynamic partition
    // overwrite only rewrites partitions that receive replacement rows,
    // so a touched partition whose rows all fell inside [from, until)
    // and got nothing back from the batch must be deleted explicitly or
    // its stale rows would survive the re-ingest.
    // Partition dir names are derived with Spark's own date rendering
    // (date_format on the partition column, session TZ) so the
    // "date=<v>" strings below match whatever the writer emitted —
    // no coupling to java.sql.Date.toString.
    val touchedDates = existing
      .filter(col("date") >= to_date(lit(from)) &&
        col("date") <= to_date(lit(until)))
      .select(date_format(col("date"), "yyyy-MM-dd")).distinct().collect()
      .map(_.getString(0)).toSet
    val touched = existing
      .filter(col("date") >= to_date(lit(from)) &&
        col("date") <= to_date(lit(until)))
      .filter(!(col(tsCol) >= lit(from) && col(tsCol) < lit(until)))
      .drop("date")
    val replacement = touched.unionByName(
      batch.filter(col(tsCol) >= lit(from) && col(tsCol) < lit(until)),
      allowMissingColumns = false)
      .withColumn("date", to_date(col(tsCol)))
      // the plan reads the table it overwrites — materialize first
      .localCheckpoint(eager = true)
    val replacedDates = replacement
      .select(date_format(col("date"), "yyyy-MM-dd")).distinct().collect()
      .map(_.getString(0)).toSet
    // Touched partitions that receive NO replacement rows have "empty"
    // as their correct end state — delete them BEFORE the overwrite
    // commit. Each single-partition delete is itself a correct final
    // state, so a crash anywhere in this loop (or between it and the
    // write below) never resurrects stale rows; the only remaining
    // non-atomicity is the dynamic overwrite's own per-partition
    // commit, which is inherent to plain parquet (Delta/Iceberg would
    // make the multi-partition commit atomic).
    val tableDir = new Path(tablePath(table))
    val fs = tableDir.getFileSystem(spark.sessionState.newHadoopConf())
    (touchedDates -- replacedDates).foreach { d =>
      fs.delete(new Path(tableDir, s"date=$d"), true)
    }
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      replacement
        .hint("rebalance", col("date"))
        .write.mode(SaveMode.Overwrite).partitionBy("date")
        .parquet(tablePath(table))
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      // drop the materialized replacement's checkpoint blocks on the
      // FAILURE path too — a failed commit must not pin the full
      // replacement dataset in block storage for the session
      graft.operators.CacheOps.releaseCheckpoint(replacement)
    }
  }

  /** K-ops maintenance — small-file compaction. Long-running
    * incremental ingest (one file per chunked append per date) is THE
    * small-file generator at 100 TB; this rewrites only the partitions
    * whose file count exceeds `maxFilesPerPartition`, sizing output by
    * `targetBytes` via AQE rebalance, and leaves healthy partitions
    * physically untouched (their files keep their identity). Each
    * compacted partition is staged fully, then swapped in with a
    * retire-then-promote rename pair — a crash anywhere leaves the
    * partition either live or recoverable from the retired dir, and
    * never mixes old and new files in one partition. CRASH-safe, not
    * concurrent-READER-safe: a query overlapping the swap can see the
    * partition absent for the instant between the renames, or lose
    * retired file paths captured at planning time — inherent to plain
    * parquet (a transactional table format makes the swap atomic); run
    * compaction in a maintenance window. Rows are
    * byte-identical; only the file layout changes. For an
    * unpartitioned table the whole-table stage-swap path runs instead.
    * Returns the number of partitions rewritten. */
  def compact(table: String, maxFilesPerPartition: Int = 8,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(tableExists(table), s"$table must exist for compact")
    val tableDir = new Path(tablePath(table))
    val fs = tableDir.getFileSystem(spark.sessionState.newHadoopConf())
    val partDirs = fs.listStatus(tableDir)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
    if (partDirs.isEmpty) {
      // unpartitioned: compact the whole table iff it is fragmented
      val files = fs.listStatus(tableDir)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      if (files.length <= maxFilesPerPartition) 0
      else {
        val n = math.max(1,
          math.ceil(files.map(_.getLen).sum.toDouble / targetBytes).toInt)
        rewriteAtomically(table, read(table).repartition(n), None)
        1
      }
    } else {
      val fragmented = partDirs.filter { d =>
        fs.listStatus(d.getPath)
          .count(s => s.isFile && s.getPath.getName.endsWith(".parquet")) >
          maxFilesPerPartition
      }
      val prevAdvisory =
        spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        targetBytes.toString)
      try {
        fragmented.foreach { d =>
          val suffix = s"$table-${d.getPath.getName}-${UUID.randomUUID()}"
          val staging = new Path(tableDir.getParent, s".compact-$suffix")
          val retired = new Path(tableDir.getParent, s".retired-$suffix")
          // read ONLY this partition — with mergeSchema, matching the
          // dataset's read() contract: appendEvolve legally leaves
          // heterogeneous file schemas in one partition, and a
          // single-footer inference would silently drop the evolved
          // columns from the rewrite. Rebalance so AQE emits
          // ~targetBytes output files; stage fully before the swap.
          spark.read.option("mergeSchema", "true")
            .parquet(d.getPath.toString)
            .hint("rebalance")
            .write.parquet(staging.toString)
          // drop the _SUCCESS marker: only the parquet files move
          fs.delete(new Path(staging, "_SUCCESS"), false)
          // swap via retire-then-promote: the old files are renamed
          // aside (not deleted) before the staging dir takes their
          // place, so a crash at any point leaves the partition either
          // live or recoverable from the .retired dir — never gone.
          // Hadoop rename reports failure by RETURNING FALSE, not
          // throwing — every result is checked, and the retired copy
          // is deleted only after a successful promote (an unchecked
          // failed promote followed by the delete would destroy the
          // only remaining copy).
          if (!fs.rename(d.getPath, retired)) {
            fs.delete(staging, true) // don't strand the staged copy
            throw new java.io.IOException(
              s"compact: failed to retire ${d.getPath}")
          }
          if (!fs.rename(staging, d.getPath)) {
            val rolledBack = fs.rename(retired, d.getPath) // roll back
            fs.delete(staging, true)
            throw new java.io.IOException(
              s"compact: failed to promote $staging to ${d.getPath} " +
                (if (rolledBack) "(old data restored)"
                 else s"(ROLLBACK ALSO FAILED — data is at $retired)"))
          }
          fs.delete(retired, true)
        }
        fragmented.length
      } finally prevAdvisory match {
        case Some(v) => spark.conf
          .set("spark.sql.adaptive.advisoryPartitionSizeInBytes", v)
        case None => spark.conf
          .unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      }
    }
  }

  /** K-ops maintenance — retention policy, the analog of TimescaleDB's
    * `drop_chunks` / `add_retention_policy` (the reference keeps
    * hypertables partitioned by time precisely so expiry is a chunk
    * drop, never a row-level DELETE). Deletes every `date=` partition
    * STRICTLY older than `olderThan` as a directory unlink — O(expired
    * partitions) metadata work, zero data rewrite, zero shuffle, at any
    * table size. Surviving partitions keep their physical files
    * untouched (asserted by IngestSpec on file identity). Each
    * single-partition delete is an independently correct final state,
    * so a crash mid-loop just leaves some expired partitions for the
    * next run — retention is idempotent by construction. Returns the
    * dropped partition count. Date strings compare correctly as
    * strings because the writer renders them zero-padded ISO
    * (`date_format`'s yyyy-MM-dd, same rendering replaceWindow relies
    * on). */
  def dropChunks(table: String, olderThan: java.time.LocalDate): Int = {
    require(tableExists(table), s"$table must exist for dropChunks")
    val tableDir = new Path(tablePath(table))
    val fs = tableDir.getFileSystem(spark.sessionState.newHadoopConf())
    val cutoff = olderThan.toString // ISO yyyy-MM-dd
    val expired = fs.listStatus(tableDir)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
      .filter(_.getPath.getName.stripPrefix("date=") < cutoff)
    expired.foreach(d => fs.delete(d.getPath, true))
    expired.length
  }

  /** Date-partitioned writes REBALANCE on the partition column first:
    * without it every task writes a file into every date dir it sees
    * (tasks × dates small files — the classic partitioned-write
    * explosion); with it each date's rows co-locate into few
    * right-sized output files. The REBALANCE hint (vs a plain
    * `repartition(date)`) lets AQE split a skewed date across several
    * tasks, so one hot day can't serialize the write. `clusterBy` sorts
    * within the rebalanced partitions (K9 index analog) — it must run
    * after the shuffle or the sort order would be destroyed. */
  private def write(df: DataFrame, table: String, mode: SaveMode,
      partitionTs: Option[String], clusterBy: Seq[String] = Nil): Unit =
    partitionTs match {
      case Some(ts) =>
        var out = df.withColumn("date", to_date(col(ts)))
          .hint("rebalance", col("date"))
        if (clusterBy.nonEmpty)
          out = out.sortWithinPartitions(clusterBy.map(col): _*)
        out.write.mode(mode).partitionBy("date").parquet(tablePath(table))
      case None =>
        var out = df
        if (clusterBy.nonEmpty)
          out = out.sortWithinPartitions(clusterBy.map(col): _*)
        out.write.mode(mode).parquet(tablePath(table))
    }

  /** Stage-swap rewrite: the source of a full-table rewrite is the
    * table itself, so write to a staging dir and swap directories —
    * never overwrite a path that is being read lazily. */
  private def rewriteAtomically(table: String, df: DataFrame,
      partitionTs: Option[String]): Unit = {
    val path = new Path(tablePath(table))
    val staging = new Path(
      s"$warehouse/$schemaName/.staging-$table-${UUID.randomUUID()}")
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val staged = partitionTs match {
      case Some(ts) => df.withColumn("date", to_date(col(ts)))
        .hint("rebalance", col("date"))
        .write.partitionBy("date")
      case None => df.write
    }
    staged.parquet(staging.toString)
    fs.delete(path, true)
    fs.rename(staging, path)
  }
}
