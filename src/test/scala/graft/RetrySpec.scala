package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Retry

class RetrySpec extends AnyFunSuite {

  test("withBackoff retries with exponential delays, then succeeds") {
    var calls = 0
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    val r = Retry.withBackoff(attempts = 5, initialDelayMs = 10,
      sleep = delays.append(_)) {
      calls += 1
      if (calls < 3) sys.error("flaky")
      "ok"
    }
    assert(r == "ok" && calls == 3)
    assert(delays.toSeq == Seq(10L, 20L))
  }

  test("withBackoff rethrows after exhausting attempts") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withBackoff(attempts = 3, initialDelayMs = 1,
        sleep = _ => ()) { calls += 1; sys.error("down") }
    }
    assert(e.getMessage == "down" && calls == 3)
  }

  test("withBackoff does not retry non-retryable failures (404 walk)") {
    var calls = 0
    intercept[IllegalStateException] {
      Retry.withBackoff(attempts = 5, initialDelayMs = 1,
        retryOn = !_.isInstanceOf[IllegalStateException],
        sleep = _ => ()) {
        calls += 1
        throw new IllegalStateException("404")
      }
    }
    assert(calls == 1)
  }

  test("RateLimiter allows burst then blocks until tokens refill") {
    var clock = 0L
    var slept = 0L
    val rl = new Retry.RateLimiter(10,
      now = () => clock,
      sleep = ms => { slept += ms; clock += ms * 1000000L })
    (1 to 10).foreach(_ => rl.acquire()) // burst through
    assert(slept == 0)
    rl.acquire() // 11th must wait for refill
    assert(slept > 0)
  }
}

class MetadataExtentSpec extends SparkSpec {
  import spark.implicits._

  test("describeExtent returns temporal bounds and hull in one scan") {
    val wh = java.nio.file.Files.createTempDirectory("extent").toString
    val ds = new graft.ingest.IngestDataset(spark, wh, "demo")
    val cat = new graft.ingest.MetadataCatalog(spark, wh)
    val df = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), 1.0, 1.0),
      (Timestamp.valueOf("2024-03-01 00:00:00"), 5.0, 1.0),
      (Timestamp.valueOf("2024-02-01 00:00:00"), 3.0, 4.0))
      .toDF("ts", "lon", "lat")
    ds.append("t", df, Some("ts"))
    val (t0, t1, hull) = cat.describeExtent(ds, "t", "ts",
      Some("lon"), Some("lat"))
    assert(t0.contains(Timestamp.valueOf("2024-01-01 00:00:00")))
    assert(t1.contains(Timestamp.valueOf("2024-03-01 00:00:00")))
    assert(hull.exists(_.startsWith("POLYGON")))
  }
}
