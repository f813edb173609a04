package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge to the spark-private listener bus drain.
  *
  * Per-query telemetry (cap observations, task metrics) is delivered
  * on the ASYNC listener bus: a delta sampled right after an action
  * can miss events still in flight, attributing them to the NEXT
  * query (the bench harness's documented caveat — observed at full-
  * run magnitude in r18: one of q332's two cap observations landed on
  * q333's window). `LiveListenerBus.waitUntilEmpty` makes the sample
  * point deterministic; it is `private[spark]`, so the bench needs
  * this in-package shim (same pattern as sql.graft.ColumnBridge). */
object ListenerBridge {
  /** Block until every queued listener event is dispatched, or the
    * timeout passes — telemetry sampled after a successful drain is
    * attribution-exact. Returns false on timeout/error (callers keep
    * the old best-effort behavior). */
  def drain(sc: SparkContext, timeoutMs: Long): Boolean =
    try {
      sc.listenerBus.waitUntilEmpty(timeoutMs)
      true
    } catch {
      // NOT a blanket Throwable: an OOM or linkage error must
      // propagate, and a swallowed interrupt would lose the thread's
      // interrupt status — re-set it so the caller's next blocking
      // call still sees the cancellation
      case _: InterruptedException =>
        Thread.currentThread().interrupt(); false
      case scala.util.control.NonFatal(_) => false
    }
}
