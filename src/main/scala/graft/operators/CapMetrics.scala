package graft.operators

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Skew/cap telemetry for the LSH-family hot-key guards.
  *
  * The bucket-width and doc-frequency caps ([[Dedup]]) are what keep
  * the candidate joins sub-quadratic at 100 TB — but a cap that
  * silently drops data is an operability hazard: a user needs to SEE
  * that 0.3% of band buckets were over-width and what share of rows
  * that cost. This wires the standard Spark mechanism for exactly
  * that need — `Dataset.observe` (CollectMetrics): the metrics ride
  * the SAME pass that computes the width column (zero extra jobs,
  * zero extra shuffles — an accumulator-backed aggregate per task),
  * and surface on the driver through a [[QueryExecutionListener]]
  * after each action.
  *
  * Metrics per cap site (named `graft.cap.<tag>.<n>`):
  *  - `input_rows`   rows entering the cap
  *  - `dropped_rows` rows in over-cap key groups (removed)
  *  - `capped_groups` number of distinct over-cap key groups — exact:
  *    each dropped row contributes 1/width, so each group sums to 1
  *  - `max_width`    widest key group observed
  */
object CapMetrics {

  /** observe() names must be unique per query; a monotone suffix
    * keeps two DIFFERENT cap sites in one plan distinct while a
    * self-joined reuse of the SAME capped subplan stays identical
    * (which CollectMetrics permits). */
  private val seq = new AtomicLong()

  private val lastSeen = new ConcurrentHashMap[String, Row]()
  /** Cumulative per-TAG totals (sequence suffix stripped), summed over
    * every observation delivered since JVM start: input_rows,
    * dropped_rows, capped_groups. Monotone counters — a caller (the
    * bench harness) samples before/after a query and takes the delta,
    * which is robust to the listener bus's async delivery in a way a
    * reset/snapshot window is not (a late event after a reset would
    * double-count into the next window; a late event after a delta
    * sample merely attributes to the neighbor, the same documented
    * caveat as the shuffle counters). max_width is deliberately
    * absent: a max cannot be delta'd. */
  private val cumTotals =
    new ConcurrentHashMap[String, Array[java.util.concurrent.atomic.LongAdder]]()

  private def tagOf(name: String): String =
    name.stripPrefix("graft.cap.").replaceAll("\\.\\d+$", "")
  /** Metric names are sequence-numbered, so retention would otherwise
    * grow monotonically over a long-lived session — bounded for the
    * same reason the rest of this module exists. */
  private val MaxRetained = 512
  /** Sessions with the listener attached. Weak keys (identity —
    * SparkSession does not override equals) so entries die with
    * their session instead of accumulating, and no derived key like
    * an identity hash whose collision/reuse could silently skip
    * registration for a new session. */
  private val installedSessions =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Attach the cap metrics to `df` (which must already carry the
    * `widthCol` group-width column). Pure plan decoration — no job
    * runs until the caller's action. */
  def observeCap(df: DataFrame, widthCol: String, cap: Int,
      tag: String): DataFrame = {
    install(df.sparkSession)
    val w = col(widthCol)
    df.observe(s"graft.cap.$tag.${seq.incrementAndGet()}",
      count(lit(1)).as("input_rows"),
      count(when(w > cap, 1)).as("dropped_rows"),
      coalesce(round(sum(when(w > cap, lit(1.0) / w))), lit(0L))
        .cast("long").as("capped_groups"),
      coalesce(max(w), lit(0L)).as("max_width"))
  }

  /** Truncation-cap variant: the guard KEEPS `cap` rows per over-cap
    * group (bottom-k truncation) instead of dropping the whole group,
    * so `dropped_rows` counts only the EXCESS — each row of an
    * over-cap group of width w contributes (w-cap)/w, so the group
    * sums to exactly w-cap. `capped_groups` counts groups that were
    * truncated; same listener, log surface and retention as
    * [[observeCap]]. */
  def observeTrunc(df: DataFrame, widthCol: String, cap: Int,
      tag: String): DataFrame = {
    install(df.sparkSession)
    val w = col(widthCol)
    df.observe(s"graft.cap.$tag.${seq.incrementAndGet()}",
      count(lit(1)).as("input_rows"),
      coalesce(round(sum(when(w > cap, (w - cap.toDouble) / w))), lit(0L))
        .cast("long").as("dropped_rows"),
      coalesce(round(sum(when(w > cap, lit(1.0) / w))), lit(0L))
        .cast("long").as("capped_groups"),
      coalesce(max(w), lit(0L)).as("max_width"))
  }

  /** Collect CollectMetricsExec rows from an EXECUTED plan,
    * descending into AQE's materialized query stages — the stock
    * `qe.observedMetrics` traversal does not reach a CollectMetrics
    * node once adaptive execution has wrapped its subtree in a
    * QueryStageExec (leaf from the tree's point of view), which is
    * exactly where a cap under a shuffle join lands. */
  private def collectAll(p: org.apache.spark.sql.execution.SparkPlan,
      out: scala.collection.mutable.Map[String, Row]): Unit = {
    import org.apache.spark.sql.execution.CollectMetricsExec
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    p match {
      case c: CollectMetricsExec => out(c.name) = c.collectedMetrics
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan, out)
      case q: QueryStageExec => collectAll(q.plan, out)
      case i: InMemoryTableScanExec =>
        collectAll(i.relation.cachedPlan, out)
      case _ => ()
    }
    p.children.foreach(collectAll(_, out))
    p.subqueries.foreach(collectAll(_, out))
  }

  /** Register the listener that logs every `graft.cap.*` observation
    * and retains the latest row per name for inspection. Idempotent
    * PER SESSION (a JVM-global flag would leave every session after
    * the first without telemetry); called lazily by [[observeCap]]. */
  def install(spark: SparkSession): Unit =
    if (installedSessions.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        private def harvest(
            qe: org.apache.spark.sql.execution.QueryExecution): Unit = {
          val found = scala.collection.mutable.Map[String, Row]()
          try collectAll(qe.executedPlan, found)
          catch { case _: Throwable => () }
          (qe.observedMetrics ++ found).foreach { case (name, row) =>
            if (name.startsWith("graft.cap.")) {
              if (lastSeen.size >= MaxRetained) lastSeen.clear()
              lastSeen.put(name, row)
              val adders = cumTotals.computeIfAbsent(tagOf(name), _ =>
                Array.fill(3)(new java.util.concurrent.atomic.LongAdder))
              adders(0).add(row.getAs[Long]("input_rows"))
              adders(1).add(row.getAs[Long]("dropped_rows"))
              adders(2).add(row.getAs[Long]("capped_groups"))
              val dropped = row.getAs[Long]("dropped_rows")
              if (dropped > 0)
                // log-style surface: at cluster scale this is the
                // line an operator greps to see what the cap cost
                System.err.println(s"[graft-metrics] $name " +
                  s"input_rows=${row.getAs[Long]("input_rows")} " +
                  s"dropped_rows=$dropped " +
                  s"capped_groups=${row.getAs[Long]("capped_groups")} " +
                  s"max_width=${row.getAs[Long]("max_width")}")
            }
          }
        }
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = harvest(qe)
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = harvest(qe)
      })
    }

  /** Latest observation per metric name (listener delivery is async —
    * poll with a deadline when asserting in tests). */
  def snapshot(): Map[String, Row] = {
    import scala.jdk.CollectionConverters._
    lastSeen.asScala.toMap
  }

  /** Cumulative (input_rows, dropped_rows, capped_groups) per cap
    * tag since JVM start — monotone; sample before/after a query and
    * diff (see [[cumTotals]] scaladoc for why deltas, not resets). */
  def cumulativeTotals(): Map[String, (Long, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    cumTotals.asScala.map { case (tag, a) =>
      tag -> (a(0).sum(), a(1).sum(), a(2).sum())
    }.toMap
  }

  /** Drop retained observations (test isolation). */
  def reset(): Unit = lastSeen.clear()
}
