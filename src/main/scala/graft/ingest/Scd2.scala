package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) maintenance: validity-interval
  * histories with `valid_from`/`valid_to`/`is_current`, built either
  * from a full change log or by merging one update batch into an
  * existing history — the nightly-dimension-merge shape of a warehouse
  * ingest, generalizing the reference's replace/upsert semantics
  * (`common/base_crawler.py` revision overwrites keep only the latest
  * state; SCD2 keeps the lineage).
  *
  * Both operators are window/join compositions on the key column —
  * they shuffle once on the key and scale with the dimension, not the
  * fact table.
  */
object Scd2 {

  /** Full SCD2 history from a change log: one row per (key, run of
    * equal `attr` values), valid from its first timestamp until the
    * next change (null = still current). `ord` breaks timestamp ties
    * deterministically. */
  def historyFromLog(log: DataFrame, key: String, attr: String,
      ts: String, ord: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(ord))
    log
      .withColumn("_prev", lag(col(attr), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col(attr))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .select(col(key), col(attr).as("state"), col(ts).as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }

  /** Merge one update batch (exactly one row per key: `key`, `u_state`,
    * `u_ts`) into an SCD2 `history` (shape of [[historyFromLog]]):
    * a changed state closes the key's current row at `u_ts` and opens a
    * new current row; an unchanged state is a no-op; an unseen key
    * inserts its first row. Closed rows pass through untouched. */
  def merge(history: DataFrame, updates: DataFrame,
      key: String): DataFrame = {
    val histCols = Seq(col(key), col("state"), col("valid_from"),
      col("valid_to"), col("is_current"))
    val closed = history.filter(!col("is_current"))
    val cur = history.filter(col("is_current"))
    val curJoined = cur.join(updates, Seq(key), "left")
    val stillCurrent = curJoined
      .filter(col("u_state").isNull || col("u_state") === col("state"))
      .select(histCols: _*)
    val toClose = curJoined
      .filter(col("u_state").isNotNull && col("u_state") =!= col("state"))
      .select(col(key), col("state"), col("valid_from"),
        col("u_ts").as("valid_to"), lit(false).as("is_current"))
    val newRows = updates
      .join(cur.select(col(key), col("state").as("_cur_state")),
        Seq(key), "left")
      .filter(col("_cur_state").isNull ||
        col("_cur_state") =!= col("u_state"))
      .select(col(key), col("u_state").as("state"),
        col("u_ts").as("valid_from"),
        lit(null).cast(history.schema("valid_to").dataType).as("valid_to"),
        lit(true).as("is_current"))
    closed.union(stillCurrent).union(toClose).union(newRows)
  }

  /** Stitch one BATCH's mini-history (the [[historyFromLog]] of a
    * change-log batch, possibly several runs per key) into an existing
    * SCD2 state — the incremental form that makes a streaming SCD2
    * sink equal the batch history under any chunking, PROVIDED batches
    * arrive in event-time order per key (the CDC contract; in-batch
    * disorder is handled by the mini-history's own sort).
    *
    * Rules: a key's current run EXTENDS through the batch's first run
    * when the value is unchanged (its original `valid_from` is
    * preserved — a run spanning a batch boundary must not fragment);
    * a changed value closes the current row at the batch run's start;
    * later batch runs insert as-is; keys absent from the batch pass
    * through untouched. */
  def applyBatch(state: DataFrame, mini: DataFrame,
      key: String): DataFrame = {
    val histCols = Seq(col(key), col("state"), col("valid_from"),
      col("valid_to"), col("is_current"))
    val w = Window.partitionBy(key).orderBy("valid_from")
    val numbered = mini.withColumn("_rn", row_number().over(w))
    val first = numbered.filter(col("_rn") === 1)
      .select(col(key), col("state").as("f_state"),
        col("valid_from").as("f_from"), col("valid_to").as("f_to"),
        col("is_current").as("f_cur"))
    val rest = numbered.filter(col("_rn") > 1).select(histCols: _*)
    val closed = state.filter(!col("is_current"))
    val cur = state.filter(col("is_current"))
    val curJ = cur.join(first, Seq(key), "left")
    val untouched = curJ.filter(col("f_state").isNull)
      .select(histCols: _*)
    val extended = curJ.filter(col("f_state") === col("state"))
      .select(col(key), col("state"), col("valid_from"),
        col("f_to").as("valid_to"), col("f_cur").as("is_current"))
    val closedNow = curJ
      .filter(col("f_state").isNotNull && col("f_state") =!= col("state"))
      .select(col(key), col("state"), col("valid_from"),
        col("f_from").as("valid_to"), lit(false).as("is_current"))
    val firstInsert = first
      .join(cur.select(col(key), col("state").as("_c")), Seq(key), "left")
      .filter(col("_c").isNull || col("_c") =!= col("f_state"))
      .select(col(key), col("f_state").as("state"),
        col("f_from").as("valid_from"), col("f_to").as("valid_to"),
        col("f_cur").as("is_current"))
    closed.unionByName(untouched).unionByName(extended)
      .unionByName(closedNow).unionByName(firstInsert)
      .unionByName(rest)
  }
}
