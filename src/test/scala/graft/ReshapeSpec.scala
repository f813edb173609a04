package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Reshape

class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  test("melt produces one row per (id, valueVar) with cast values") {
    val df = Seq((1L, 10, 2.5), (2L, 20, 5.0)).toDF("id", "a", "b")
    val m = Reshape.melt(df, Seq("id"), Seq("a", "b"))
      .orderBy("id", "variable")
    assert(m.columns.toSeq == Seq("id", "variable", "value"))
    assert(m.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSeq == Seq((1L, "a", 10.0), (1L, "b", 2.5),
        (2L, "a", 20.0), (2L, "b", 5.0)))
  }

  test("melt handles nulls (kept as null values)") {
    val df = Seq((1L, Some(1.0), None: Option[Double])).toDF("id", "a", "b")
    val m = Reshape.melt(df, Seq("id"), Seq("a", "b"))
    assert(m.filter($"variable" === "b").head().isNullAt(2))
  }

  test("pivotWide is the inverse of melt for complete data") {
    val df = Seq((1L, "x", 1.0), (1L, "y", 2.0), (2L, "x", 3.0))
      .toDF("id", "k", "v")
    val w = Reshape.pivotWide(df, Seq("id"), "k", first($"v"), Seq("x", "y"))
      .orderBy("id")
    val rows = w.collect()
    assert(rows(0).getDouble(1) == 1.0 && rows(0).getDouble(2) == 2.0)
    assert(rows(1).getDouble(1) == 3.0 && rows(1).isNullAt(2))
  }

  test("ffill/bfill fill within group in order") {
    val df = Seq(
      ("a", 1, Some(1.0)), ("a", 2, None), ("a", 3, Some(3.0)),
      ("b", 1, None), ("b", 2, Some(9.0)))
      .toDF("k", "t", "v")
    val w = Window.partitionBy("k").orderBy("t")
    val out = df
      .withColumn("ff", Reshape.ffill($"v", w))
      .withColumn("bf", Reshape.bfill($"v", w))
      .orderBy("k", "t").collect()
    assert(out.map(r => Option(r.get(3))).toSeq ==
      Seq(Some(1.0), Some(1.0), Some(3.0), None, Some(9.0)))
    assert(out.map(r => Option(r.get(4))).toSeq ==
      Seq(Some(1.0), Some(3.0), Some(3.0), Some(9.0), Some(9.0)))
  }

  test("dedupKeepFirst keeps exactly the first row by order per key") {
    val df = Seq((1L, 10, "old"), (1L, 20, "new"), (2L, 5, "only"))
      .toDF("k", "t", "tag")
    val d = Reshape.dedupKeepFirst(df, Seq("k"), Seq($"t".desc))
    assert(d.count() == 2)
    assert(d.filter($"k" === 1).head().getString(2) == "new")
  }

  test("asOfTolerance nulls matches older than the horizon, keeps fresh ones") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")), // right 1 h earlier: fresh
      (2L, 100L, ts("2024-01-01 23:00:00")), // latest right 14 h old: stale
      (3L, 200L, ts("2024-01-01 05:00:00"))) // no right at all
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, ts("2024-01-01 09:00:00"), 7.0))
      .toDF("user_id", "ts", "value")
    val out = graft.operators.AsOfJoin.asOfTolerance(
        left, right, Seq("user_id"), "ts", "ts", Seq("value"),
        toleranceSec = 7200L)
      .collect().map(r => r.getLong(0) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out == Map(1L -> Some(7.0), 2L -> None, 3L -> None))
  }

  test("unionEvolve null-fills missing columns on either side") {
    val old = Seq((1L, 1.0)).toDF("id", "x")
    val fresh = Seq((2L, 2.0, "p")).toDF("id", "x", "prio")
    val u = Reshape.unionEvolve(old, fresh).orderBy("id")
    assert(u.columns.toSeq == Seq("id", "x", "prio"))
    val rows = u.collect()
    assert(rows(0).isNullAt(2) && rows(1).getString(2) == "p")
  }
}
