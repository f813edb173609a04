package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic aggregation over double columns.
  *
  * Summing IEEE doubles is order-dependent; Spark's partition order is
  * nondeterministic, and the DuckDB oracle accumulates in yet another
  * order. The testdata carries at most 2 decimal digits (money/quantity
  * semantics, like every measurement table in the reference — see
  * SURVEY.md §1.2: all measurements are `double precision` with fixed
  * scales at the source). Casting to DECIMAL before the sum makes the
  * aggregate exact and associative, so Spark and the oracle agree
  * bit-for-bit; the final cast back to DOUBLE keeps the output schema
  * engine-neutral.
  */
object ExactAgg {
  /** Exact sum of a fixed-scale double column; result as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast(DoubleType)

  /** Exact mean: decimal sum divided by count, evaluated in double.
    * Both engines perform one double division on identical operands. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast(DoubleType) /
      count(c).cast(DoubleType)

  /** SQL fragment equivalents for the DuckDB oracle side. */
  def sqlSum(expr: String, scale: Int = 2): String =
    s"CAST(sum(CAST($expr AS DECIMAL(28,$scale))) AS DOUBLE)"
  def sqlAvg(expr: String, scale: Int = 2): String =
    s"CAST(sum(CAST($expr AS DECIMAL(28,$scale))) AS DOUBLE) / CAST(count($expr) AS DOUBLE)"

  // ---- the round-11/12 float-path contract -----------------------------
  // These four encode the repo's cross-engine hash rules for DERIVED
  // doubles (logs, products, ratios — not fixed-scale source columns):
  // natural logs quantized to DECIMAL(18,6) because libm ln differs in
  // the last ulp across engines, and unordered double sums routed
  // through DECIMAL(38,12) partials. ONE definition — TrainOps,
  // CurateOps and WebOps all delegate here, so a precision tweak can
  // never desynchronize the Spark side from its oracle mirror.

  /** ln quantized so both engines agree bit-for-bit (the q85 rule). */
  def lnq(c: Column): Column =
    log(c).cast(DecimalType(18, 6)).cast(DoubleType)

  /** Mirrors [[lnq]] in DuckDB. */
  def sqlLnq(e: String): String =
    s"CAST(CAST(ln($e) AS DECIMAL(18,6)) AS DOUBLE)"

  /** Order-free exact sum of per-row double contributions whose
    * magnitude is not fixed-scale (the q134 rule). */
  def dsum12(c: Column): Column =
    sum(c.cast(DecimalType(38, 12))).cast(DoubleType)

  /** Mirrors [[dsum12]] in DuckDB. */
  def sqlSum12(e: String): String =
    s"CAST(sum(CAST($e AS DECIMAL(38,12))) AS DOUBLE)"
}
