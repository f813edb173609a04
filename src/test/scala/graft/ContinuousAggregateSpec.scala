package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ingest.{ContinuousAggregate, IngestDataset}

class ContinuousAggregateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def freshDs() =
    new IngestDataset(spark,
      Files.createTempDirectory("ca-spec").toString, "caschema")

  private def ca(ds: IngestDataset) =
    new ContinuousAggregate(ds, "raw", "rollup", "t", "hour",
      Seq("k"), Seq(count(lit(1)).as("n"), sum(col("v")).as("total")))

  private def rows(k: String, day: Int, hours: Seq[Int], v: Long) =
    hours.map(h => (k, ts(f"2024-01-$day%02d $h%02d:15:00"), v))

  private def expected(ds: IngestDataset) = ds.read("raw")
    .groupBy(col("k"), date_trunc("hour", col("t")).as("bucket"))
    .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
    .orderBy("k", "bucket")
    .collect().toSeq

  private def actual(c: ContinuousAggregate) = c.read()
    .select("k", "bucket", "n", "total").orderBy("k", "bucket")
    .collect().toSeq

  test("incremental refresh equals full recompute, incl. late data") {
    val ds = freshDs()
    val c = ca(ds)
    ds.append("raw",
      (rows("a", 5, Seq(1, 2, 3), 10) ++ rows("b", 6, Seq(4), 20))
        .toDF("k", "t", "v"), partitionTs = Some("t"))
    c.refresh(ts("2024-01-05 00:00:00"), ts("2024-01-07 00:00:00"))
    assert(actual(c) == expected(ds))
    // day-7 batch plus a LATE row landing inside day 5 hour 2
    ds.append("raw",
      (rows("a", 7, Seq(8, 9), 30) ++ rows("a", 5, Seq(2), 99))
        .toDF("k", "t", "v"), partitionTs = Some("t"))
    // refresh the new day and, separately, just the late bucket
    c.refresh(ts("2024-01-07 00:00:00"), ts("2024-01-08 00:00:00"))
    c.refresh(ts("2024-01-05 02:30:00"), ts("2024-01-05 02:45:00"))
    assert(actual(c) == expected(ds))
  }

  test("mid-bucket windows widen to full buckets (no partial bucket)") {
    val ds = freshDs()
    val c = ca(ds)
    ds.append("raw", rows("a", 5, Seq(2), 10).toDF("k", "t", "v"),
      partitionTs = Some("t"))
    // the raw row sits at 02:15; a window starting 02:30 must still
    // recompute the whole 02:00 bucket and pick it up
    c.refresh(ts("2024-01-05 02:30:00"), ts("2024-01-05 03:00:00"))
    assert(actual(c) == expected(ds))
  }

  test("untouched date partitions keep their physical files") {
    val ds = freshDs()
    val c = ca(ds)
    ds.append("raw",
      (rows("a", 5, Seq(1, 2), 10) ++ rows("a", 9, Seq(3), 20))
        .toDF("k", "t", "v"), partitionTs = Some("t"))
    c.refresh(ts("2024-01-05 00:00:00"), ts("2024-01-10 00:00:00"))
    def files(date: String): Set[String] = {
      val dir = new java.io.File(ds.tablePath("rollup"), s"date=$date")
      Option(dir.list()).map(_.toSet).getOrElse(Set.empty)
    }
    val day5Before = files("2024-01-05")
    assert(day5Before.nonEmpty)
    ds.append("raw", rows("a", 9, Seq(7), 30).toDF("k", "t", "v"),
      partitionTs = Some("t"))
    c.refresh(ts("2024-01-09 00:00:00"), ts("2024-01-10 00:00:00"))
    assert(files("2024-01-05") == day5Before,
      "refreshing day 9 must not rewrite day 5's files")
    assert(actual(c) == expected(ds))
  }

  test("streamingSink rollup is chunking-invariant incl. shared buckets") {
    val landing = Files.createTempDirectory("ca-stream").toFile
    // three single-file chunks; chunks 1 and 2 both write into day-5
    // hour 2, so that bucket is refreshed twice across micro-batches
    val chunks = Seq(
      rows("a", 5, Seq(1, 2), 10),
      rows("a", 5, Seq(2, 3), 20) ++ rows("b", 6, Seq(4), 40),
      rows("a", 7, Seq(8), 30))
    chunks.zipWithIndex.foreach { case (ch, i) =>
      val stage = Files.createTempDirectory("ca-stage").toFile
      ch.toDF("k", "t", "v").coalesce(1)
        .write.mode("overwrite").parquet(stage.toString)
      val part = stage.listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val target = new java.io.File(landing, f"chunk-$i%05d.parquet")
      java.nio.file.Files.move(part.toPath, target.toPath)
      target.setLastModified(1700000000000L + i * 60000L)
    }
    val ds = freshDs()
    val c = ca(ds)
    val stream = spark.readStream
      .schema(chunks.head.toDF("k", "t", "v").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landing.toString)
    c.streamingSink(stream,
      Files.createTempDirectory("ca-ckpt").toString)
    assert(actual(c) == expected(ds))
  }
}
