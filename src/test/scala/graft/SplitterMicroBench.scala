package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Per-row bucketing cost: the legacy foldLeft-of-`when(key >=
  * splitter)` chain vs the binary-search expression
  * ([[graft.expressions.SearchSortedCount]]) that replaced it (r17
  * verdict #1), at the splitter counts where the difference matters —
  * 256 (the old design regime), 2048, 16384 (the ~10⁵-task-bucket
  * direction a 100 TB corpus needs).
  *
  * `sbt "Test/runMain graft.SplitterMicroBench"` — one MICRO line per
  * (variant, splitters); results tabulated in PLANS.md r18.
  */
object SplitterMicroBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(4000000L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // shuffled-but-deterministic long keys; the key is wrapped in a
    // struct exactly as orderBuckets wraps its order columns
    val df = spark.range(rows)
      .select(((col("id") * 2654435761L) % 100000007L).as("k"))
    val key = struct(col("k"))
    val keyType =
      df.select(key.as("_k")).schema.head.dataType.asInstanceOf[StructType]

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    def bench(tag: String, n: Int, bucket: org.apache.spark.sql.Column)
        : Unit = {
      val runs = (0 until 3).map { _ =>
        time(df.select(bucket.as("b")).write
          .format("noop").mode("overwrite").save())
      }
      println(f"MICRO variant=$tag splitters=$n sec=${runs.min}%.2f " +
        s"runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }

    df.write.format("noop").mode("overwrite").save() // warm input

    for (n <- Seq(256, 2048, 16384)) {
      val step = 100000007L / (n + 1)
      val vals = (1 to n).map(i => i * step)
      // legacy chain, verbatim shape from pre-r18 orderBuckets
      val chain = vals.foldLeft(lit(0)) { (acc, v) =>
        acc + when(key >= struct(lit(v).cast("long")), 1).otherwise(0)
      }
      val internal = vals.map { v =>
        org.apache.spark.sql.catalyst.InternalRow(v)
      }.toArray
      val search =
        graft.expressions.SearchSortedCount.bucketOf(key, internal, keyType)
      bench("search", n, search)
      // the chain DIES above ~1k splitters: a 2048-branch `when` tree
      // overflows the analyzer/codegen stack before a single row runs
      // — record that outcome instead of crashing the harness
      try {
        // correctness cross-check before timing: identical bucket sums
        val a = df.select(sum(search.cast("long"))).head().getLong(0)
        val b = df.select(sum(chain.cast("long"))).head().getLong(0)
        require(a == b, s"chain/search diverge at n=$n: $a vs $b")
        bench("chain", n, chain)
      } catch { case e: Throwable =>
        println(s"MICRO variant=chain splitters=$n sec=FAILED " +
          s"error=${e.getClass.getSimpleName}")
      }
    }

    // the END-TO-END layout pass at high fan-in: globalRank (splitter
    // sample + binary-search buckets + per-bucket windows + broadcast
    // offsets) must not degrade as the bucket count climbs toward the
    // task-sized-bucket regime of a 100 TB corpus
    for (parts <- Seq(32, 2048, 16384)) {
      val runs = (0 until 3).map { _ =>
        time(graft.operators.PrefixSum
          .globalRank(df, Seq(col("k")), "r", partitions = parts)
          .write.format("noop").mode("overwrite").save())
      }
      println(f"MICRO variant=globalRank partitions=$parts " +
        f"sec=${runs.min}%.2f runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
