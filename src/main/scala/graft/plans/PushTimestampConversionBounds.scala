package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: derive raw-column bounds from time predicates on a
  * CONVERTED timestamp, so they reach the parquet scan.
  *
  * The `events` table stores TIMESTAMP(NANOS), which `Tables.load`
  * reads as a raw nanosecond long and converts with
  * `timestamp_micros(ts div 1000)`. A filter on the converted column —
  * the natural thing every query writes — cannot push past the
  * conversion expression, so the scan reads the full archive (the
  * PLANS.md pushdown barrier). Catalyst can't know the conversion is
  * monotone; this rule encodes that domain fact: for any predicate
  * `timestamp_micros(x div 1000) ⋈ TIMESTAMP_LITERAL` it conjoins an
  * IMPLIED bound on `x` itself (widened by 999 ns so it is sound for
  * both floor and truncating division, i.e. also for pre-epoch
  * values). The original predicate is kept — results are bit-identical
  * — but the new raw-long conjunct is scan-translatable and lands in
  * `PushedFilters`, turning a full-archive scan into row-group-pruned
  * reads at 100 TB.
  *
  * Installed per-session via [[graft.GraftExtensions.register]] (which
  * appends it to `spark.experimental.extraOptimizations`; by that
  * phase predicate pushdown has already substituted the Project alias,
  * so the conversion expression sits inline in a Filter directly above
  * the relation — exactly where physical planning collects scan
  * filters) or via `spark.sql.extensions=graft.GraftExtensions`.
  */
object PushTimestampConversionBounds extends Rule[LogicalPlan]
    with PredicateHelper {

  /** Matches `timestamp_micros(raw div 1000)` → raw. */
  private def asConv(e: Expression): Option[Expression] = e match {
    case m: MicrosToTimestamp => m.child match {
      case d: IntegralDivide if d.left.dataType == LongType &&
          d.left.deterministic =>
        d.right match {
          case Literal(v: Long, _) if v == 1000L => Some(d.left)
          case Literal(v: Int, _) if v == 1000 => Some(d.left)
          case _ => None
        }
      case _ => None
    }
    case _ => None
  }

  private def safe(t: Long): Boolean =
    // Long.MinValue first: math.abs(Long.MinValue) is negative and
    // would sneak past the magnitude check into an overflowing t*1000
    t != Long.MinValue && math.abs(t) < (Long.MaxValue - 1000L) / 1000L

  /** Sound (floor- AND truncation-division) raw bounds implied by a
    * comparison of the converted value against micros literal `t`. */
  private def derived(cmp: Expression): Seq[Expression] = cmp match {
    case GreaterThanOrEqual(c, Literal(t: Long, TimestampType)) if safe(t) =>
      asConv(c).map(raw =>
        GreaterThanOrEqual(raw, Literal(t * 1000L - 999L))).toSeq
    case GreaterThan(c, Literal(t: Long, TimestampType)) if safe(t) =>
      asConv(c).map(raw =>
        GreaterThanOrEqual(raw, Literal(t * 1000L + 1L))).toSeq
    case LessThanOrEqual(c, Literal(t: Long, TimestampType)) if safe(t) =>
      asConv(c).map(raw =>
        LessThanOrEqual(raw, Literal(t * 1000L + 999L))).toSeq
    case LessThan(c, Literal(t: Long, TimestampType)) if safe(t) =>
      asConv(c).map(raw =>
        LessThanOrEqual(raw, Literal(t * 1000L - 1L))).toSeq
    case EqualTo(c, Literal(t: Long, TimestampType)) if safe(t) =>
      asConv(c).toSeq.flatMap(raw => Seq(
        GreaterThanOrEqual(raw, Literal(t * 1000L - 999L)),
        LessThanOrEqual(raw, Literal(t * 1000L + 999L))))
    // literal-on-the-left orientations; the non-literal guard on the
    // other side prevents literal⋈literal predicates from bouncing
    // between the mirrored cases forever
    case LessThanOrEqual(l @ Literal(_: Long, TimestampType), c)
        if !c.isInstanceOf[Literal] =>
      derived(GreaterThanOrEqual(c, l))
    case LessThan(l @ Literal(_: Long, TimestampType), c)
        if !c.isInstanceOf[Literal] =>
      derived(GreaterThan(c, l))
    case GreaterThanOrEqual(l @ Literal(_: Long, TimestampType), c)
        if !c.isInstanceOf[Literal] =>
      derived(LessThanOrEqual(c, l))
    case GreaterThan(l @ Literal(_: Long, TimestampType), c)
        if !c.isInstanceOf[Literal] =>
      derived(LessThan(c, l))
    case EqualTo(l @ Literal(_: Long, TimestampType), c)
        if !c.isInstanceOf[Literal] =>
      derived(EqualTo(c, l))
    case _ => Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val existing = splitConjunctivePredicates(cond)
      val extra = existing.flatMap(derived)
        .filterNot(n => existing.exists(_.semanticEquals(n)))
        .distinct
      if (extra.isEmpty) f
      else Filter(And(cond, extra.reduce(And)), child)
  }
}
