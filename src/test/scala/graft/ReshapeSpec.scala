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

  test("unionEvolve null-fills missing columns on either side") {
    val old = Seq((1L, 1.0)).toDF("id", "x")
    val fresh = Seq((2L, 2.0, "p")).toDF("id", "x", "prio")
    val u = Reshape.unionEvolve(old, fresh).orderBy("id")
    assert(u.columns.toSeq == Seq("id", "x", "prio"))
    val rows = u.collect()
    assert(rows(0).isNullAt(2) && rows(1).getString(2) == "p")
  }
}
