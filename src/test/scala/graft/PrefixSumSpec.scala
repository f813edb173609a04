package graft

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.PrefixSum

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("matches the single-partition global window on sparse keys") {
    val rnd = new Random(7)
    // sparse, shuffled order keys → empty buckets, bucket boundaries
    // inside and between partitions
    val rows = rnd.shuffle((0L until 400L).map(_ * 3 + 1))
      .map(k => (k, rnd.nextInt(50).toLong))
    val df = rows.toDF("k", "v").repartition(7)
    val got = PrefixSum.exclusiveCumsum(df, col("k"), col("v"), "c",
        bucketSize = 37L)
      .orderBy("k").select("k", "c").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = df.withColumn("c",
        coalesce(sum(col("v")).over(Window.orderBy("k")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy("k").select("k", "c").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == naive.toSeq)
  }

  test("first row gets zero and totals telescope") {
    val df = Seq((0L, 5L), (1L, 7L), (2L, 11L)).toDF("k", "v")
    val got = PrefixSum.exclusiveCumsum(df, col("k"), col("v"), "c", 2L)
      .orderBy("k").select("c").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(0L, 5L, 12L))
  }

  test("globalRank matches the single-partition global row_number on " +
      "random composite keys, at several partition counts") {
    val rnd = new Random(11)
    // composite (string, long) keys, shuffled arrival, duplicates in
    // the first component so ranking spans range-boundary ties
    val rows = rnd.shuffle((0L until 500L).map { i =>
      (s"s${rnd.nextInt(7)}", i, rnd.nextInt(100))
    })
    val df = rows.toDF("grp", "id", "x").repartition(9)
    val naive = df.withColumn("r",
        row_number().over(Window.orderBy("grp", "id")) - 1)
      .orderBy("grp", "id").select("grp", "id", "r")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2).toLong))
    for (parts <- Seq(1, 4, 64)) { // fewer, comparable, more than keys/rows
      val got = PrefixSum.globalRank(df, Seq(col("grp"), col("id")),
          "r", partitions = parts)
        .orderBy("grp", "id").select("grp", "id", "r")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq == naive.toSeq, s"partitions=$parts diverged")
    }
  }

  test("globalRank: null order keys rank first (orderBy semantics), " +
      "through null-valued splitter comparisons") {
    // nulls in the first order component: the splitter comparison
    // struct >= struct is NULL for these rows, so they all land in
    // bucket 0 — which is exactly where nulls-first ordering puts
    // them; a sampled splitter can itself carry the null
    val rows = (0L until 200L).map { i =>
      (if (i % 5 == 0) null else s"g${i % 11}", i)
    }
    val df = rows.toDF("grp", "id").repartition(5)
    val got = PrefixSum.globalRank(df, Seq(col("grp"), col("id")),
        "r", partitions = 8)
      .orderBy("r").select("grp", "id")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)))
    val want = df.withColumn("r",
        row_number().over(Window.orderBy("grp", "id")) - 1)
      .orderBy("r").select("grp", "id")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)))
    assert(got.toSeq == want.toSeq)
    // nulls occupy the first ranks
    assert(got.take(40).forall(_._1.isEmpty))
  }
}
