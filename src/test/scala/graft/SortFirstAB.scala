package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Same-JVM A/B of the round-19 sort-first rewrite on the q273 and
  * q289 expression shapes: (a) spread + project + orderBy (the §1
  * repair), (b) orderBy first + project after (§3). Alternating runs,
  * medians. */
object SortFirstAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)

    val docs = Tables.load(spark, dir, "documents")
    val ws = split(col("text"), " ")
    val n = size(ws)
    val wins = when(n >= 25,
      transform(sequence(lit(1), n - lit(24)),
        i => size(array_distinct(slice(ws, i, lit(25))))
          .cast(DoubleType) / lit(25.0)))
      .otherwise(array(size(array_distinct(ws)).cast(DoubleType) /
        n.cast(DoubleType)))
    def mean(arr: org.apache.spark.sql.Column) =
      aggregate(arr,
        lit(java.math.BigDecimal.ZERO).cast(DecimalType(28, 12)),
        (acc, v) => (acc + v.cast(DecimalType(18, 12)))
          .cast(DecimalType(28, 12)))
        .cast(DoubleType) / size(arr).cast(DoubleType)

    val a = graft.sources.ScanSpread.spread(docs)
      .select(col("doc_id"), wins.as("wins"))
      .select(col("doc_id"),
        size(col("wins")).cast(LongType).as("n_windows"),
        mean(col("wins")).as("mattr"))
      .orderBy("doc_id")
    val b = graft.sources.ScanSpread
      .sortedSpread(docs, col("doc_id"))
      .select(col("doc_id"), wins.as("wins"))
      .select(col("doc_id"),
        size(col("wins")).cast(LongType).as("n_windows"),
        mean(col("wins")).as("mattr"))

    def once(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once(a); once(b) // warm
    val as = scala.collection.mutable.ArrayBuffer[Double]()
    val bs = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to 4) { as += once(a); bs += once(b) }
    def med(x: Seq[Double]) = x.sorted.apply(x.size / 2)
    println(f"AB q273-shape spread=${med(as.toSeq)}%6.3f " +
      f"sortfirst=${med(bs.toSeq)}%6.3f " +
      f"(spread: ${as.map(x => f"$x%.2f").mkString(",")} | " +
      f"sortfirst: ${bs.map(x => f"$x%.2f").mkString(",")})")
    println(s"rows equal: ${a.collect().map(_.toString)
      .sameElements(b.collect().map(_.toString))}")
    spark.stop()
  }
}
