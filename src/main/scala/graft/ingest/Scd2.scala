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
}
