package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Z-order (Morton) interleaving of two 16-bit dimensions into one
  * 32-bit clustering key. Sorting/range-partitioning a table by the
  * interleaved key co-locates rows that are close in BOTH dimensions,
  * so min/max parquet footer stats prune 2-D predicates (the layout
  * trick behind multi-dimensional data skipping) — apply via
  * `IngestDataset`'s `clusterBy` on the computed column.
  *
  * Pure integer arithmetic (`DIV`/`%`/`*` of non-negative longs), so
  * the key is bit-exact across engines; [[sqlText]] emits the SAME
  * term sequence for the DuckDB oracle — both strings come from one
  * generator, so they cannot drift.
  */
object ZOrder {

  private val Bits = 16

  /** One term list, shared by both renderers: bit i of x lands at
    * position 2i, bit i of y at 2i+1. `d` is the integer-division
    * operator spelling (`DIV` in Spark SQL, `//` in DuckDB). */
  private def terms(x: String, y: String, d: String): Seq[String] =
    (0 until Bits).flatMap { i =>
      Seq(
        s"(($x $d ${1L << i}) % 2) * ${1L << (2 * i)}",
        s"(($y $d ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
    }

  /** Spark column: interleave the low 16 bits of two non-negative
    * long expressions (given as SQL text referring to columns in
    * scope). */
  def interleave16(x: String, y: String): Column =
    expr(terms(x, y, "DIV").mkString("CAST(", " + ", " AS BIGINT)"))

  /** The DuckDB-dialect text of the same computation. */
  def sqlText(x: String, y: String): String =
    terms(x, y, "//").mkString("CAST(", " + ", " AS BIGINT)")
}
