package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Reshape operators: the reference's signature pandas transforms
  * re-expressed as Catalyst-friendly DataFrame ops.
  *
  * melt       — `df.melt(id_vars, value_vars, …)` (reference:
  *              `regelleistung.py:281-303`, `vea_industrial_load_profiles.py:122`,
  *              `entsoe_crawler.py:476-480`)
  * pivot      — inverse, `groupBy().pivot()` (reference:
  *              `entsoe_crawler.py:359-371`, `ninja.py:33-46`)
  * ffill/bfill — ordered fill within a key group (reference: `opec.py:82`,
  *              `instrat_pl.py:64-65,83`, `iwugebaeudetypen.py:53-54`)
  * dedupKeepFirst — `~index.duplicated(keep="first")` with explicit order
  *              (reference: `smard.py:169-171`, `e2watch.py:199-201`)
  * unionEvolve — schema-evolving append: `pd.concat` of old+new with
  *              union-by-name null-fill (reference: `entsoe_crawler.py:196-209`,
  *              `regelleistung.py:631-642`)
  */
object Reshape {

  /** Wide→long unpivot. Implemented with array-of-structs + explode rather
    * than one giant `stack()` call: stack with tens of thousands of
    * branches (the reference melts 35,136 columns in
    * `vea_industrial_load_profiles.py:122`) blows past the JVM 64 KB
    * method limit in codegen, while a single `explode(array(...))` stays
    * one narrow generated loop and never materializes the wide row twice.
    * Runs map-side only — no shuffle.
    */
  def melt(
      df: DataFrame,
      idVars: Seq[String],
      valueVars: Seq[String],
      varName: String = "variable",
      valueName: String = "value"): DataFrame = {
    val kvs = valueVars.map { c =>
      struct(lit(c).as(varName), col(c).cast(DoubleType).as(valueName))
    }
    df.select(idVars.map(col) :+ explode(array(kvs: _*)).as("_kv"): _*)
      .select(idVars.map(col) :+
        col(s"_kv.$varName") :+ col(s"_kv.$valueName"): _*)
  }

  /** Long→wide pivot with an explicit (deterministic) column list.
    * Passing `values` avoids the extra distinct-collect job Spark runs
    * to discover pivot values — at 100 TB that discovery pass is a full
    * extra scan. */
  def pivotWide(
      df: DataFrame,
      keys: Seq[String],
      pivotCol: String,
      valueCol: Column,
      values: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).pivot(pivotCol, values).agg(valueCol)

  /** Forward-fill nulls within `w` (ordered). O(n) single window pass. */
  def ffill(c: Column, w: WindowSpec): Column =
    last(c, ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** Backward-fill nulls within `w` (ordered). */
  def bfill(c: Column, w: WindowSpec): Column =
    first(c, ignoreNulls = true)
      .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))

  /** Keep exactly one row per key, deterministically: first row by
    * `order`. Distributed (hash-partitioned by key) — never a global
    * sort or driver collect, unlike a naive `dropDuplicates` whose
    * surviving row is partition-order-dependent. */
  def dedupKeepFirst(
      df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Schema-evolving vertical concat: union by name, missing columns
    * null-filled — the Spark form of the reference's concat-replace
    * fallback. */
  def unionEvolve(old: DataFrame, fresh: DataFrame): DataFrame =
    old.unionByName(fresh, allowMissingColumns = true)

  /** J6 — horizontal concat on an index column (`pd.concat(axis=1)`,
    * reference: windmodel.py:97, entsoe_crawler.py:354-371): aligns a
    * list of per-series frames by full-outer joining on the index. */
  def concatOnIndex(dfs: Seq[DataFrame], indexCol: String): DataFrame =
    dfs.reduce((l, r) => l.join(r, Seq(indexCol), "full_outer"))

  /** A12 — schema-introspected column-pair arithmetic (reference:
    * entsoe_crawler.py:80-117 net generation = `X_actual_aggregated −
    * X_actual_consumption` per technology, with null→0 fallback and
    * agg-only passthrough). For every base name with an `aggSuffix`
    * column, emits `net_<base>`; a missing consumption side counts
    * as 0. */
  def pairDiff(df: DataFrame, keys: Seq[String],
      aggSuffix: String, consSuffix: String): DataFrame = {
    val bases = df.columns.filter(_.endsWith(aggSuffix))
      .map(_.stripSuffix(aggSuffix))
    val nets = bases.map { b =>
      val agg = coalesce(col(b + aggSuffix), lit(0.0))
      val cons =
        if (df.columns.contains(b + consSuffix))
          coalesce(col(b + consSuffix), lit(0.0))
        else lit(0.0)
      (agg - cons).as(s"net_$b")
    }
    df.select(keys.map(col) ++ nets: _*)
  }
}
