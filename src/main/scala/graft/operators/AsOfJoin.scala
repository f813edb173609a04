package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Reshape

/** As-of (most-recent-value) join: for every left row, the latest right
  * row with `rightTs <= leftTs` on the same key (reference J5:
  * FX-rate alignment `usdeur.reindex(df.index).bfill().ffill()`,
  * `opec.py:82`, `instrat_pl.py:64-83`).
  *
  * Implemented as the union + ordered forward-fill pattern: both sides
  * are tagged and unioned, a single window pass per key carries the
  * last right-side values forward, then left rows are kept. ONE shuffle
  * on the key — no per-row probes, no range join explosion — the
  * canonical scalable form (a sort-merge as-of at 100 TB shuffles
  * exactly the same data).
  *
  * Ties (equal timestamps) resolve right-before-left, matching
  * `ASOF JOIN ... ON l.ts >= r.ts` inclusive semantics.
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry (each appears in the
    *                  output as `asof_<name>`) */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_is_right", lit(0))
    val r0 = right.select(
      (keys.map(col) :+ col(rightTs).as("_ts") :+
        lit(1).as("_is_right")) ++
        valueCols.map(c => col(c).as(s"asof_$c")): _*)
    val unioned = l.unionByName(r0, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_is_right").desc)
    val filled = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c",
        Reshape.ffill(
          when(col("_is_right") === 1, col(s"asof_$c")), w))
    }
    filled.filter(col("_is_right") === 0)
      .select((leftCols.map(col) ++
        valueCols.map(c => col(s"asof_$c"))): _*)
  }

  /** As-of join with a TOLERANCE horizon — pandas
    * `merge_asof(tolerance=…)` semantics: a match older than
    * `toleranceSec` (whole-second floor-epoch difference, the engine-
    * portable comparison) is treated as NO match and its carried
    * values go null. Same single-shuffle union+ffill plan as [[asOf]];
    * the matched right timestamp rides along as one extra carried
    * column and the staleness test is a map-side projection. */
  def asOfTolerance(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String],
      toleranceSec: Long): DataFrame = {
    val withTs = asOf(left, right, keys, leftTs, rightTs,
      valueCols :+ rightTs)
    val stale = col(s"asof_$rightTs").isNull ||
      unix_timestamp(col(leftTs)) -
        unix_timestamp(col(s"asof_$rightTs")) > toleranceSec
    valueCols.foldLeft(withTs) { (df, c) =>
      df.withColumn(s"asof_$c",
        when(stale, lit(null)).otherwise(col(s"asof_$c")))
    }.drop(s"asof_$rightTs")
  }
}
