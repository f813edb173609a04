package graft

import scala.collection.mutable

import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Physical-plan audit over the executed plan TREE, not EXPLAIN text.
  *
  * The text-grep predecessor over-reported cached subtrees — EXPLAIN
  * prints an `InMemoryRelation`'s child plan at every scan site, so
  * q306's one BNLJ kernel printed 23 times (PLANS.md r13) and a real
  * stray BNLJ could hide inside the reprint noise. Here each physical
  * node is visited exactly once: children always, a cached relation's
  * plan once per DISTINCT relation (scans of the same cache are reuse,
  * not plan weight), an AQE wrapper's current plan, subquery plans, and
  * never through a ReusedExchange (its child IS another node of the
  * same tree).
  */
object PlanAudit {

  final case class Counts(hashExchanges: Int, bnlj: Int, cartesian: Int,
    /** Node count of the largest canonically-identical subtree that
      * appears at 2+ distinct positions without a cache in between —
      * an unpersisted diamond: the same work computed twice. 0 = none.
      * Leaf-scan duplicates are real but cheap (two prunes of one
      * file); callers threshold on size. */
    largestDupSubtree: Int)

  private def subtreeSize(p: SparkPlan): Int =
    1 + p.children.map(subtreeSize).sum

  def audit(root: SparkPlan): Counts = {
    var hashEx = 0; var bnlj = 0; var cart = 0
    val seenRelations = mutable.Set.empty[Int] // identity of cached relations
    val canonCounts = mutable.HashMap.empty[SparkPlan, (Int, Int)] // canon -> (occurrences, size)

    def walk(p: SparkPlan): Unit = {
      p match {
        case _: BroadcastNestedLoopJoinExec => bnlj += 1
        case _: CartesianProductExec => cart += 1
        case e: ShuffleExchangeExec =>
          if (e.outputPartitioning.isInstanceOf[HashPartitioning]) hashEx += 1
        case _ => ()
      }
      p match {
        case _: InMemoryTableScanExec | _: ReusedExchangeExec |
          _: AdaptiveSparkPlanExec |
          _: org.apache.spark.sql.execution.adaptive.QueryStageExec => ()
        case _ =>
          // diamond census: every non-cache, non-reuse node's canonical
          // form; a subtree appearing twice makes all its nodes appear
          // twice, so max-size-over-duplicates IS the maximal diamond
          val canon = p.canonicalized
          val (n, sz) = canonCounts.getOrElse(canon, (0, subtreeSize(canon)))
          canonCounts(canon) = (n + 1, sz)
      }
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          // AQE wraps executed sub-plans in LEAF stage nodes (incl.
          // Spark 4's ResultQueryStageExec around a whole finished
          // plan) — their content is in `plan`, not `children`; a
          // reused stage's plan object appears at several positions
          // and counts once
          if (seenRelations.add(System.identityHashCode(q.plan)))
            walk(q.plan)
        case im: InMemoryTableScanExec =>
          // a cache is the FIX for a diamond: descend its plan once so
          // joins inside it are counted, but N scans of one cache add
          // no plan weight and no duplication. Key on the CACHED PLAN
          // object, not the relation: the cache manager re-wraps one
          // cache entry in a fresh InMemoryRelation per use site
          // (q306's kernel sat under 5 distinct relation objects all
          // sharing one cachedPlan object)
          val id = System.identityHashCode(im.relation.cachedPlan)
          if (seenRelations.add(id)) walk(im.relation.cachedPlan)
        case _: ReusedExchangeExec => () // child is another tree node
        case _ =>
          p.children.foreach(walk)
          p.subqueries.foreach(walk)
      }
    }
    walk(root)
    val dup = canonCounts.valuesIterator
      .collect { case (n, sz) if n >= 2 => sz }
      .foldLeft(0)(math.max)
    Counts(hashEx, bnlj, cart, dup)
  }

  def audit(df: org.apache.spark.sql.DataFrame): Counts =
    audit(df.queryExecution.executedPlan)
}
