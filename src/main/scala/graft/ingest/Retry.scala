package graft.ingest

/** I6 — driver-side fetch resilience (reference: 10-try/30 s loop
  * `entsog.py:61-93`, exponential backoff `opec.py:56-69`, ≤30 req/s
  * self-cap `gie_crawler.py:67-72`). Pure-Scala adapter utilities — the
  * engine itself never retries; these wrap the extract step of a
  * crawler work-list.
  */
object Retry {

  /** Retry `body` up to `attempts` times with exponential backoff.
    * `retryOn` filters which failures are retryable (a 404 terminating
    * a backfill walk must NOT retry — reference I3 semantics). */
  def withBackoff[A](
      attempts: Int,
      initialDelayMs: Long,
      backoffFactor: Double = 2.0,
      retryOn: Throwable => Boolean = _ => true,
      sleep: Long => Unit = Thread.sleep)(body: => A): A = {
    var delay = initialDelayMs
    var lastErr: Throwable = null
    var i = 0
    while (i < attempts) {
      try return body
      catch {
        case t: Throwable if retryOn(t) && i < attempts - 1 =>
          lastErr = t
          sleep(delay)
          delay = (delay * backoffFactor).toLong
        case t: Throwable => throw t
      }
      i += 1
    }
    throw lastErr
  }

  /** Token-bucket rate limiter: at most `maxPerSecond` `acquire()`s per
    * wall-clock second (burst up to the same amount). */
  final class RateLimiter(
      maxPerSecond: Int,
      now: () => Long = () => System.nanoTime(),
      sleep: Long => Unit = Thread.sleep) {
    private var tokens: Double = maxPerSecond.toDouble
    private var last: Long = now()

    def acquire(): Unit = synchronized {
      refill()
      while (tokens < 1.0) {
        sleep(math.max(1L, ((1.0 - tokens) * 1000 / maxPerSecond).toLong))
        refill()
      }
      tokens -= 1.0
    }

    private def refill(): Unit = {
      val t = now()
      tokens = math.min(maxPerSecond.toDouble,
        tokens + (t - last) / 1e9 * maxPerSecond)
      last = t
    }
  }
}
