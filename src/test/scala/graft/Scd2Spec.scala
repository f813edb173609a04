package graft

import java.sql.Timestamp

import graft.ingest.Scd2

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("historyFromLog collapses runs and marks the last row current") {
    val log = Seq(
      (1L, "a", ts("2024-01-01 00:00:00"), 1L),
      (1L, "a", ts("2024-01-02 00:00:00"), 2L), // same run
      (1L, "b", ts("2024-01-03 00:00:00"), 3L),
      (2L, "x", ts("2024-01-01 12:00:00"), 4L))
      .toDF("user_id", "state", "ts", "event_id")
    val h = Scd2.historyFromLog(log, "user_id", "state", "ts", "event_id")
      .orderBy("user_id", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4)))
    assert(h.toSeq == Seq(
      (1L, "a", ts("2024-01-01 00:00:00"),
        Some(ts("2024-01-03 00:00:00")), false),
      (1L, "b", ts("2024-01-03 00:00:00"), None, true),
      (2L, "x", ts("2024-01-01 12:00:00"), None, true)))
  }

  test("merge: close-and-open, no-op, and unseen-key insert") {
    val hist = Seq(
      (1L, "a", ts("2024-01-01 00:00:00"),
        Some(ts("2024-01-03 00:00:00")), false),
      (1L, "b", ts("2024-01-03 00:00:00"), None, true),
      (2L, "x", ts("2024-01-01 12:00:00"), None, true))
      .toDF("user_id", "state", "valid_from", "valid_to", "is_current")
    val updates = Seq(
      (1L, "c", ts("2024-02-01 00:00:00")), // change → close + open
      (2L, "x", ts("2024-02-01 00:00:00")), // same state → no-op
      (3L, "z", ts("2024-02-01 00:00:00"))) // unseen key → insert
      .toDF("user_id", "u_state", "u_ts")
    val m = Scd2.merge(hist, updates, "user_id")
      .orderBy("user_id", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4)))
    assert(m.toSeq == Seq(
      (1L, "a", ts("2024-01-01 00:00:00"),
        Some(ts("2024-01-03 00:00:00")), false),
      (1L, "b", ts("2024-01-03 00:00:00"),
        Some(ts("2024-02-01 00:00:00")), false),
      (1L, "c", ts("2024-02-01 00:00:00"), None, true),
      (2L, "x", ts("2024-01-01 12:00:00"), None, true),
      (3L, "z", ts("2024-02-01 00:00:00"), None, true)))
  }

  test("merge is idempotent when re-applied with the same batch") {
    val hist = Seq(
      (1L, "b", ts("2024-01-03 00:00:00"),
        None: Option[Timestamp], true))
      .toDF("user_id", "state", "valid_from", "valid_to", "is_current")
    val updates = Seq((1L, "c", ts("2024-02-01 00:00:00")))
      .toDF("user_id", "u_state", "u_ts")
    val once = Scd2.merge(hist, updates, "user_id")
    val twice = Scd2.merge(once, updates, "user_id")
    assert(once.orderBy("user_id", "valid_from").collect().toSeq ==
      twice.orderBy("user_id", "valid_from").collect().toSeq)
  }
}
