package graft

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.ingest.{IngestDataset, MetadataCatalog, MetadataRow, Watermark}

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def freshDs(schema: String = "testschema") =
    new IngestDataset(spark,
      Files.createTempDirectory("ingest-spec").toString, schema)

  private def ts(s: String) = Timestamp.valueOf(s)

  test("append + read round-trips; pk dedups the batch") {
    val ds = freshDs()
    val df = Seq((1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (2L, ts("2024-01-02 00:00:00"), 2.0)).toDF("id", "t", "v")
    ds.append("t1", df, partitionTs = Some("t"), pk = Seq("id", "t"))
    assert(ds.read("t1").count() == 2)
  }

  test("antiJoinExisting keeps first-written rows (keep-first dedup)") {
    val ds = freshDs()
    val b1 = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("id", "t", "v")
    val b2 = Seq((1L, ts("2024-01-01 00:00:00"), 99.0),
      (2L, ts("2024-01-02 00:00:00"), 2.0)).toDF("id", "t", "v")
    ds.append("t1", b1, Some("t"), pk = Seq("id", "t"))
    ds.append("t1", b2, Some("t"), pk = Seq("id", "t"),
      antiJoinExisting = true)
    val rows = ds.read("t1").orderBy("id").collect()
    assert(rows.length == 2 && rows(0).getAs[Double]("v") == 1.0)
  }

  test("overwrite replaces content including when source is the table") {
    val ds = freshDs()
    ds.overwrite("dim", Seq((1, "a")).toDF("k", "x"))
    ds.overwrite("dim", Seq((2, "b"), (3, "c")).toDF("k", "x"))
    assert(ds.read("dim").count() == 2)
    // rewrite reading from itself (the concat-replace shape)
    val evolved = ds.read("dim").withColumn("y", lit(1))
    ds.overwrite("dim", evolved)
    assert(ds.read("dim").columns.toSet == Set("k", "x", "y"))
  }

  test("appendEvolve widens schema with null-fill both directions") {
    val ds = freshDs()
    ds.appendEvolve("t", Seq((1L, 1.0)).toDF("id", "a"))
    ds.appendEvolve("t", Seq((2L, "x")).toDF("id", "b"))
    val out = ds.read("t").orderBy("id").collect()
    assert(ds.read("t").columns.toSet == Set("id", "a", "b"))
    assert(out(0).isNullAt(2) && out(1).isNullAt(1))
  }

  test("replaceWindow swaps exactly the window, preserves the rest") {
    val ds = freshDs()
    val init = Seq(
      (1L, ts("2024-01-01 06:00:00"), 1.0),
      (2L, ts("2024-01-02 06:00:00"), -99.0), // to be revised
      (3L, ts("2024-01-02 18:00:00"), -99.0), // to be revised
      (4L, ts("2024-01-03 06:00:00"), 4.0)).toDF("id", "t", "v")
    ds.append("t", init, Some("t"))
    val revised = Seq(
      (2L, ts("2024-01-02 06:00:00"), 2.0),
      (3L, ts("2024-01-02 18:00:00"), 3.0)).toDF("id", "t", "v")
    ds.replaceWindow("t", revised, "t",
      ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00"))
    val out = ds.read("t").orderBy("id").select("v").as[Double]
      .collect().toSeq
    assert(out == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("replaceWindow deletes partitions whose rows all vanish upstream") {
    val ds = freshDs()
    val init = Seq(
      (1L, ts("2024-01-01 06:00:00"), 1.0),
      (2L, ts("2024-01-02 06:00:00"), -99.0), // upstream deleted this day
      (3L, ts("2024-01-03 06:00:00"), 3.0)).toDF("id", "t", "v")
    ds.append("t", init, Some("t"))
    // re-crawl of Jan-02..Jan-03 returns nothing for Jan-02
    val revised = spark.emptyDataset[(Long, Timestamp, Double)]
      .toDF("id", "t", "v")
    ds.replaceWindow("t", revised, "t",
      ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00"))
    val out = ds.read("t").orderBy("id").select("id").as[Long]
      .collect().toSeq
    assert(out == Seq(1L, 3L), "stale Jan-02 partition must be deleted")
  }

  test("compact merges fragmented partitions, leaves healthy ones untouched") {
    val ds = freshDs()
    // 6 chunked appends -> ≥6 files in the hot date partition
    (0 until 6).foreach { i =>
      val b = Seq((i.toLong, ts("2024-01-01 00:00:00"), i.toDouble))
        .toDF("id", "t", "v")
      ds.append("t1", b, partitionTs = Some("t"))
    }
    // one small append to a second date -> healthy partition
    ds.append("t1",
      Seq((100L, ts("2024-01-02 00:00:00"), 1.0)).toDF("id", "t", "v"),
      partitionTs = Some("t"))
    val before = ds.read("t1").orderBy("id").collect()
    def files(date: String) = new java.io.File(
      ds.tablePath("t1"), s"date=$date").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files("2024-01-01").length >= 6)
    val healthyBefore = files("2024-01-02").map(_.getName).toSet
    val rewritten = ds.compact("t1", maxFilesPerPartition = 3)
    assert(rewritten == 1)
    assert(files("2024-01-01").length <= 3,
      s"expected compaction, got ${files("2024-01-01").length} files")
    // healthy partition's files keep their identity
    assert(files("2024-01-02").map(_.getName).toSet == healthyBefore)
    // rows byte-identical
    assert(ds.read("t1").orderBy("id").collect().toSeq == before.toSeq)
    // idempotent: nothing left to compact
    assert(ds.compact("t1", maxFilesPerPartition = 3) == 0)
  }

  test("dropChunks deletes only strictly-older partitions, keeps file identity") {
    val ds = freshDs()
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03")
    days.zipWithIndex.foreach { case (d, i) =>
      ds.append("t1",
        Seq((i.toLong, ts(s"$d 12:00:00"), 1.0)).toDF("id", "t", "v"),
        partitionTs = Some("t"))
    }
    def files(date: String): Option[Set[String]] = {
      val dir = new java.io.File(ds.tablePath("t1"), s"date=$date")
      if (dir.exists()) Some(dir.listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet)
      else None
    }
    val survivors = days.drop(1).map(d => d -> files(d).get)
    // strictly-older: the cutoff day itself survives
    assert(ds.dropChunks("t1", java.time.LocalDate.parse("2024-01-02")) == 1)
    assert(files("2024-01-01").isEmpty)
    survivors.foreach { case (d, f) => assert(files(d).contains(f)) }
    assert(ds.read("t1").count() == 2)
    // idempotent: second run drops nothing
    assert(ds.dropChunks("t1", java.time.LocalDate.parse("2024-01-02")) == 0)
  }

  test("compact on an unpartitioned fragmented table stage-swaps once") {
    val ds = freshDs()
    (0 until 10).foreach { i =>
      ds.append("u1", Seq((i.toLong, i.toDouble)).toDF("id", "v"),
        partitionTs = None)
    }
    val before = ds.read("u1").orderBy("id").collect()
    assert(ds.compact("u1", maxFilesPerPartition = 4) == 1)
    val files = new java.io.File(ds.tablePath("u1")).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length <= 4)
    assert(ds.read("u1").orderBy("id").collect().toSeq == before.toSeq)
  }

  test("watermark: None on missing table, max after append, per-key") {
    val ds = freshDs()
    assert(Watermark.maxTs(ds, "t", "t").isEmpty)
    val df = Seq(("a", ts("2024-01-01 00:00:00")),
      ("a", ts("2024-01-05 00:00:00")),
      ("b", ts("2024-01-03 00:00:00"))).toDF("k", "t")
    ds.append("t", df, Some("t"))
    assert(Watermark.maxTs(ds, "t", "t").contains(ts("2024-01-05 00:00:00")))
    val perKey = Watermark.maxTsPerKey(ds, "t", "t", Seq("k"))
    assert(perKey(Seq("a")) == ts("2024-01-05 00:00:00"))
    assert(perKey(Seq("b")) == ts("2024-01-03 00:00:00"))
  }

  test("forward/backward chunk work-lists cover the range exactly") {
    val day = 86400000L
    val fwd = Watermark.forwardChunks(
      ts("2024-01-01 00:00:00"), ts("2024-01-03 12:00:00"), day)
    assert(fwd.length == 3)
    assert(fwd.head._1 == ts("2024-01-01 00:00:00"))
    assert(fwd.last._2 == ts("2024-01-03 12:00:00"))
    val back = Watermark.backwardChunks(
      ts("2024-01-03 00:00:00"), ts("2024-01-01 00:00:00"), day)
    assert(back.length == 2 && back.head._2 == ts("2024-01-03 00:00:00"))
  }

  test("date-partitioned reads prune to the requested partitions") {
    val ds = freshDs()
    val df = (1 to 10).map(d =>
      (d.toLong, ts(f"2024-01-$d%02d 06:00:00"), d.toDouble))
      .toDF("id", "t", "v")
    ds.append("t", df, Some("t"))
    val oneDay = ds.read("t").filter(col("date") === "2024-01-03")
    assert(oneDay.count() == 1)
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("2024-01-03"),
      s"expected partition pruning in plan:\n$plan")
  }

  test("metadata upsert is keyed MERGE; stats count tables") {
    val wh = Files.createTempDirectory("ingest-spec").toString
    val cat = new MetadataCatalog(spark, wh)
    val ds = new IngestDataset(spark, wh, "demo")
    ds.append("t1", Seq((1, 2)).toDF("a", "b"))
    val (nt, sz) = cat.stats("demo")
    assert(nt == 1 && sz > 0)
    val row = MetadataRow("demo", Date.valueOf("2026-08-12"),
      Date.valueOf("2026-08-12"), "src", "MIT", "d", "c", nt, sz)
    cat.upsert(row)
    cat.upsert(row.copy(tables = 5))
    val out = cat.read().collect()
    assert(out.length == 1 && out(0).getAs[Int]("tables") == 5)
  }
}
