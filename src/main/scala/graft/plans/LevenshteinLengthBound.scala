package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: conjoin the length-difference lower bound wherever a
  * bounded Levenshtein predicate appears.
  *
  * `levenshtein(a, b) ≤ k` implies `abs(length(a) − length(b)) ≤ k`
  * (every insertion/deletion changes the length by one, substitutions
  * not at all). The distance itself is O(|a|·|b|) per candidate pair
  * and cannot prune anything until fully evaluated; the implied length
  * bound is O(1) (string lengths are already materialized) and is
  * conjoined FIRST, so predicate evaluation short-circuits before the
  * quadratic kernel on every length-mismatched candidate. In the
  * blocked fuzzy join (q113) this runs inside the join condition on
  * each bucket-mate pair — at corpus scale the cheap guard is the
  * difference between a distance evaluation per candidate and one per
  * plausible candidate. Results are bit-identical: the bound is
  * implied, never replaces the original predicate.
  *
  * Installed alongside [[PushTimestampConversionBounds]] via
  * [[graft.GraftExtensions]]; idempotent (skips conjuncts already
  * present), applies to Filter predicates and Join conditions.
  */
object LevenshteinLengthBound extends Rule[LogicalPlan]
    with PredicateHelper {

  private def lengthBound(a: Expression, b: Expression,
      k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)

  /** The implied bound for one conjunct, when it is a bounded distance
    * over deterministic operands. Covers both literal orientations and
    * both ≤/<. The three-argument (threshold) form is left alone — its
    * semantics (−1 past the threshold) make the comparison shapes
    * below unidiomatic, and Spark already early-exits it internally. */
  private def derived(cmp: Expression): Seq[Expression] = cmp match {
    case LessThanOrEqual(lev: Levenshtein, k @ Literal(_, IntegerType))
        if lev.threshold.isEmpty && lev.deterministic =>
      Seq(lengthBound(lev.left, lev.right, k))
    case LessThan(lev: Levenshtein, k @ Literal(_, IntegerType))
        if lev.threshold.isEmpty && lev.deterministic =>
      Seq(lengthBound(lev.left, lev.right, k))
    case GreaterThanOrEqual(k @ Literal(_, IntegerType), lev: Levenshtein)
        if lev.threshold.isEmpty && lev.deterministic =>
      Seq(lengthBound(lev.left, lev.right, k))
    case GreaterThan(k @ Literal(_, IntegerType), lev: Levenshtein)
        if lev.threshold.isEmpty && lev.deterministic =>
      Seq(lengthBound(lev.left, lev.right, k))
    case _ => Nil
  }

  /** Conjoins missing implied bounds BEFORE the original condition so
    * the cheap guard evaluates (and short-circuits) first. */
  private def augment(cond: Expression): Option[Expression] = {
    val existing = splitConjunctivePredicates(cond)
    val extra = existing.flatMap(derived)
      .filterNot(n => existing.exists(_.semanticEquals(n)))
      .distinct
    if (extra.isEmpty) None else Some(And(extra.reduce(And), cond))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      augment(cond).map(Filter(_, child)).getOrElse(f)
    case j: Join if j.condition.isDefined =>
      augment(j.condition.get)
        .map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}
