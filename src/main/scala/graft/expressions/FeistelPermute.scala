package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Format-preserving Feistel permutation of the dense index domain
  * [0, n) — the keyed upgrade behind [[graft.operators.EpochShuffle]]
  * (r17 verdict #7).
  *
  * The affine map `(a·idx + b) mod n` is an exact bijection but has
  * constant-stride structure: batch composition correlates with
  * doc_id arithmetic, which a sampling-sensitive ablation can see.
  * The standard fix (format-preserving encryption, e.g. the FFX
  * family) is a balanced Feistel network over the smallest even-bit
  * binary domain 2^(2h) ≥ n with CYCLE-WALKING: out-of-range outputs
  * are re-permuted until they land below n — still a bijection of
  * [0, n) (the walk follows the permutation's cycle, which must
  * return into [0, n)), still pure row-local arithmetic, ZERO
  * shuffle. Three rounds of a multiply-shift round function — loader-
  * grade decorrelation, NOT cryptographic (three rounds of a weak F
  * is spec-distinguishable from random; the contract here is "no
  * arithmetic structure a training ablation trips over", not
  * secrecy).
  *
  * Every operation is chosen to be exactly replayable in ANSI-ish
  * SQL on signed 64-bit integers (the DuckDB oracle replays the walk
  * as a recursive CTE): operands stay nonnegative and below 2^63 —
  * half ≤ 31 bits, so (r + k) · 2654435761 < 2^62.4 — so arithmetic
  * shift, unsigned shift and BIGINT multiply all agree.
  *
  * Walk termination: for x < 2^(2h) the walk length is bounded by
  * the number of out-of-range values on x's cycle, < 2^(2h) − n ≤
  * 3n; expected length is 2^(2h)/n ≤ 4. Inputs outside [0, 2^(2h))
  * would walk an unrelated orbit (possibly forever) — rejected per
  * row instead of looping.
  */
// keys is Seq[Long], NOT Array[Long]: an array field makes case-class
// equality reference-based, silently defeating semanticEquals /
// subexpression reuse between independently built instances (the
// SearchSortedCount caveat class); a 3-element Seq compares by value
case class FeistelPermute(child: Expression, n: Long, half: Int,
    keys: Seq[Long]) extends UnaryExpression {

  require(n > 0, s"domain size must be positive: $n")
  require(half >= 1 && half <= 31, s"half-width out of range: $half")
  require((1L << (2 * half)) >= n,
    s"domain 2^${2 * half} does not cover n=$n")
  require(keys.length == 3, s"three round keys required: ${keys.length}")
  require(keys.forall(k => k >= 0 && k <= 0xFFFFL),
    "round keys must be 16-bit (overflow-safe multiply contract)")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"feistel_permute requires a BIGINT index, got ${t.simpleString(10)}")
    }

  private val mask = (1L << half) - 1
  private val domain = 1L << (2 * half)

  private def permuteOnce(x: Long): Long = {
    var l = x >>> half
    var r = x & mask
    var i = 0
    while (i < 3) {
      val f = (((r + keys(i)) * 2654435761L) >>> 13) & mask
      val t = r; r = l ^ f; l = t
      i += 1
    }
    (l << half) | r
  }

  override def nullSafeEval(input: Any): Any = {
    val x0 = input.asInstanceOf[Long]
    if (x0 < 0 || x0 >= domain)
      throw new IllegalArgumentException(
        s"feistel_permute input $x0 outside the dense domain [0, $domain)" +
          " — derive a dense index first (PrefixSum.globalRank)")
    var y = permuteOnce(x0)
    while (y >= n) y = permuteOnce(y)
    y
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val y = ctx.freshName("y")
      val l = ctx.freshName("l")
      val r = ctx.freshName("r")
      val t = ctx.freshName("t")
      // rounds unrolled with the keys as literals: this is the hot
      // row-local path — no per-row array allocation, no loop
      val rounds = keys.map { k =>
        s"""$t = $r;
           $r = $l ^ (((($r + ${k}L) * 2654435761L) >>> 13) & ${mask}L);
           $l = $t;"""
      }.mkString("\n")
      s"""
        if ($x < 0L || $x >= ${domain}L) {
          throw new IllegalArgumentException("feistel_permute input " + $x +
            " outside the dense domain [0, ${domain})");
        }
        long $y = $x;
        long $l; long $r; long $t;
        do {
          $l = $y >>> $half;
          $r = $y & ${mask}L;
          $rounds
          $y = ($l << $half) | $r;
        } while ($y >= ${n}L);
        ${ev.value} = $y;
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): FeistelPermute = copy(child = newChild)
}

object FeistelPermute {
  /** Column-level API: the [0, n)-preserving permutation of `idx`. */
  def permute(idx: Column, n: Long, half: Int, keys: Seq[Long]): Column =
    ColumnBridge.column(
      FeistelPermute(ColumnBridge.expression(idx), n, half, keys))
}
