package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.AdaptiveRead

/** Schema-drift tolerance of the table loader: the same logical
  * instants, written under every physical layout a producer might pick,
  * must normalize to identical `TimestampType` micros-UTC values. This
  * is the regression suite for the round-8 outage (corpus regenerated
  * `events.ts` NANOS→timestamp_ntz and the hard-coded loader died). */
class AdaptiveReadSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp = Files.createTempDirectory("adaptive_read").toString

  // three instants incl. a pre-epoch one (truncating-division trap) and
  // a sub-millisecond component (resolution loss visible where expected)
  private val micros = Seq(-10500L, 0L, 1704067200123456L)
  private val expectMicros = micros

  private def writeLong(name: String, vals: Seq[Long]): String = {
    val p = s"$tmp/$name.parquet"
    vals.toDF("ts").write.mode("overwrite").parquet(p)
    p
  }

  private def readNormalizedMicros(path: String): Seq[Long] = {
    val df = AdaptiveRead.readTable(spark, path, Seq("ts"))
    assert(df.schema("ts").dataType == TimestampType,
      s"contract column must normalize to TimestampType, got ${df.schema("ts").dataType}")
    df.select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq
  }

  test("raw int64 epochs classify by magnitude: seconds/millis/micros/nanos") {
    assert(AdaptiveRead.classifyMagnitude(1704067200L) == AdaptiveRead.Seconds)
    assert(AdaptiveRead.classifyMagnitude(1704067200123L) == AdaptiveRead.Millis)
    assert(AdaptiveRead.classifyMagnitude(1704067200123456L) == AdaptiveRead.Micros)
    assert(AdaptiveRead.classifyMagnitude(1704067200123456789L) == AdaptiveRead.Nanos)
    // magnitude of the MAX classifies the column even when small values
    // (near-epoch) are present alongside
    assert(AdaptiveRead.classifyMagnitude(0L) == AdaptiveRead.Seconds)
  }

  test("binary-encoded text columns normalize to string (documents drift)") {
    // a regen writing text as un-annotated BYTE_ARRAY arrives as
    // BinaryType, on which regex/split/shingle expressions fail at
    // analysis time — the round-8 outage class on the LLM-pipeline
    // tables. Same UTF-8 bytes must come back as the same strings.
    val p = s"$tmp/docs_binary.parquet"
    Seq(("the quick brown fox", "en"), ("der schnelle braune Fuchs", "de"))
      .toDF("text", "lang")
      .select(col("text").cast(BinaryType).as("text"), col("lang"))
      .write.mode("overwrite").parquet(p)
    assert(spark.read.parquet(p).schema("text").dataType == BinaryType)
    val df = AdaptiveRead.readTable(spark, p, Nil,
      stringCols = Seq("text", "lang"))
    assert(df.schema("text").dataType == StringType)
    assert(df.schema("lang").dataType == StringType)
    val got = df.select("text").as[String].collect().sorted
    assert(got.toSeq ==
      Seq("der schnelle braune Fuchs", "the quick brown fox"))
    // an actually-unreadable layout still fails loudly
    val pBad = s"$tmp/docs_badtext.parquet"
    Seq(1L, 2L).toDF("text").write.mode("overwrite").parquet(pBad)
    intercept[IllegalStateException](
      AdaptiveRead.readTable(spark, pBad, Nil, stringCols = Seq("text")))
  }

  test("float64/int vector columns normalize to array<float> (embeddings drift)") {
    // numpy float64 leaking into the embedding export must narrow to
    // the contract's float32 — not fail the typed cosine/top-k kernels
    // at analysis time; int arrays (quantized exports) widen lossless
    val vals = Seq(Seq(0.25, -1.5, 3.0), Seq(1.0, 2.0, -0.125))
    val pD = s"$tmp/emb_double.parquet"
    vals.toDF("embedding").write.mode("overwrite").parquet(pD)
    val d = AdaptiveRead.readTable(spark, pD, Nil,
      floatArrayCols = Seq("embedding"))
    assert(d.schema("embedding").dataType ==
      ArrayType(FloatType, containsNull = true))
    assert(d.select("embedding").as[Seq[Float]].collect().toSet ==
      vals.map(_.map(_.toFloat)).toSet)
    val pI = s"$tmp/emb_int.parquet"
    Seq(Seq(1, -2, 3)).toDF("embedding")
      .write.mode("overwrite").parquet(pI)
    val i = AdaptiveRead.readTable(spark, pI, Nil,
      floatArrayCols = Seq("embedding"))
    assert(i.schema("embedding").dataType ==
      ArrayType(FloatType, containsNull = true))
    assert(i.select("embedding").as[Seq[Float]].collect().head ==
      Seq(1f, -2f, 3f))
    // a float32 file passes through untouched (current corpus layout)
    val pF = s"$tmp/emb_float.parquet"
    Seq(Seq(1.5f, 2.5f)).toDF("embedding")
      .write.mode("overwrite").parquet(pF)
    val f = AdaptiveRead.readTable(spark, pF, Nil,
      floatArrayCols = Seq("embedding"))
    assert(f.select("embedding").as[Seq[Float]].collect().head ==
      Seq(1.5f, 2.5f))
    // scalar (non-array) layout fails loudly
    val pBad = s"$tmp/emb_scalar.parquet"
    Seq(1.0).toDF("embedding").write.mode("overwrite").parquet(pBad)
    intercept[IllegalStateException](AdaptiveRead.readTable(
      spark, pBad, Nil, floatArrayCols = Seq("embedding")))
  }

  test("unclassifiable raw-long column fails loudly, never guesses") {
    // an all-null int64 column carries neither a timestamp annotation
    // nor usable min/max statistics — guessing micros here could be a
    // silent 6-order-of-magnitude misconversion, so the loader must
    // refuse (the AdaptiveRead analog of Verify's loud-failure rule)
    val p = s"$tmp/ev_allnull.parquet"
    Seq[Option[Long]](None, None, None).toDF("ts")
      .write.mode("overwrite").parquet(p)
    val e = intercept[IllegalStateException](
      AdaptiveRead.readTable(spark, p, Seq("ts")))
    assert(e.getMessage.contains("cannot classify"),
      s"unexpected message: ${e.getMessage}")
  }

  test("micros-long layout normalizes exactly") {
    val p = writeLong("ev_micros", micros)
    assert(readNormalizedMicros(p) == expectMicros.sorted)
  }

  test("nanos-long layout normalizes with truncating-division semantics") {
    // overflow-safe for these values; includes pre-epoch -10500000 ns
    val p = writeLong("ev_nanos", micros.map(_ * 1000L))
    // -10500000 ns div 1000 = -10500 us (truncation toward zero matches
    // exact division here); sub-us precision is genuinely lost at nanos
    assert(readNormalizedMicros(p) == expectMicros.sorted)
  }

  test("millis-long layout normalizes (ms-resolution values)") {
    val ms = Seq(-10L, 0L, 1704067200123L)
    val p = writeLong("ev_millis", ms)
    assert(readNormalizedMicros(p) == ms.map(_ * 1000L).sorted)
  }

  test("seconds-long layout normalizes (s-resolution values)") {
    val s = Seq(-10L, 0L, 1704067200L)
    val p = writeLong("ev_seconds", s)
    assert(readNormalizedMicros(p) == s.map(_ * 1000000L).sorted)
  }

  test("timestamp_ntz[us] layout (the round-8 corpus regen) normalizes") {
    val p = s"$tmp/ev_ntz.parquet"
    micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(p)
    assert(readNormalizedMicros(p) == expectMicros.sorted)
  }

  test("native instant timestamp layout passes through") {
    val p = s"$tmp/ev_tz.parquet"
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try micros.toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(p)
    finally prev.foreach(
      spark.conf.set("spark.sql.parquet.outputTimestampType", _))
    assert(readNormalizedMicros(p) == expectMicros.sorted)
  }

  test("non-contract columns and tables without contracts are untouched") {
    val p = s"$tmp/plain.parquet"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("overwrite").parquet(p)
    val df = AdaptiveRead.readTable(spark, p, Nil)
    assert(df.schema("id").dataType == LongType)
    assert(df.count() == 2)
  }

  test("the driver's current events table loads with ts as TimestampType") {
    val df = Tables.load(spark, sf, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() > 0)
  }

  test("NTZ-contract columns normalize from ntz/instant/date/long layouts") {
    import graft.sources.AdaptiveRead.normalizeTimestampNtz
    val us = 1704067200123456L
    def readNtz(path: String): (DataType, Seq[Long]) = {
      val df0 = spark.read.parquet(path)
      val df = normalizeTimestampNtz(spark, path, df0, "d")
      (df.schema("d").dataType,
        df.select(unix_micros(col("d").cast(TimestampType)))
          .as[Long].collect().sorted.toSeq)
    }
    // native ntz — passthrough
    val pNtz = s"$tmp/ntz_d.parquet"
    Seq(us).toDF("us").select(timestamp_micros(col("us"))
      .cast(TimestampNTZType).as("d")).write.mode("overwrite").parquet(pNtz)
    assert(readNtz(pNtz) == (TimestampNTZType, Seq(us)))
    // instant timestamp — relabeled (UTC: same micros)
    val pTz = s"$tmp/tz_d.parquet"
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try Seq(us).toDF("us").select(timestamp_micros(col("us")).as("d"))
      .write.mode("overwrite").parquet(pTz)
    finally prev.foreach(
      spark.conf.set("spark.sql.parquet.outputTimestampType", _))
    assert(readNtz(pTz) == (TimestampNTZType, Seq(us)))
    // DATE — midnight ntz
    val pDate = s"$tmp/date_d.parquet"
    Seq("2024-01-01").toDF("s").select(to_date(col("s")).as("d"))
      .write.mode("overwrite").parquet(pDate)
    assert(readNtz(pDate) == (TimestampNTZType, Seq(1704067200000000L)))
    // raw epoch-millis long — unit-detected then relabeled
    val pLong = s"$tmp/long_d.parquet"
    Seq(us / 1000L).toDF("d").write.mode("overwrite").parquet(pLong)
    assert(readNtz(pLong) == (TimestampNTZType, Seq(us / 1000L * 1000L)))
  }

  test("double-contract columns normalize from float/decimal/int/string") {
    import graft.sources.AdaptiveRead.normalizeDouble
    def check(df: org.apache.spark.sql.DataFrame, expect: Seq[Double]): Unit = {
      val n = normalizeDouble(df, "v")
      assert(n.schema("v").dataType == DoubleType)
      assert(n.select("v").as[Double].collect().sorted.toSeq == expect.sorted)
    }
    check(Seq(1.5, -2.25).toDF("v"), Seq(1.5, -2.25))                    // passthrough
    check(Seq(1.5f, -2.25f).toDF("v"), Seq(1.5, -2.25))                  // float32
    check(Seq(3, -4).toDF("v"), Seq(3.0, -4.0))                          // int
    check(Seq("1.5", "-2.25").toDF("v"), Seq(1.5, -2.25))                // text
    check(Seq(BigDecimal("1.50"), BigDecimal("-2.25")).toDF("v"),
      Seq(1.5, -2.25))                                                   // decimal
  }

  test("string-timestamp layouts normalize under both contracts") {
    import graft.sources.AdaptiveRead.{normalizeTimestamp, normalizeTimestampNtz}
    val p = s"$tmp/str_ts.parquet"
    Seq("2024-01-01 00:00:00.123456").toDF("ts")
      .write.mode("overwrite").parquet(p)
    val inst = normalizeTimestamp(spark, p, spark.read.parquet(p), "ts")
    assert(inst.schema("ts").dataType == TimestampType)
    assert(inst.select(unix_micros(col("ts"))).as[Long].head()
      == 1704067200123456L)
    val ntz = normalizeTimestampNtz(spark, p, spark.read.parquet(p), "ts")
    assert(ntz.schema("ts").dataType == TimestampNTZType)
  }

  test("orders/lineitem date columns load under the NTZ contract") {
    assert(Tables.load(spark, sf, "orders").schema("o_orderdate")
      .dataType == TimestampNTZType)
    assert(Tables.load(spark, sf, "lineitem").schema("l_shipdate")
      .dataType == TimestampNTZType)
  }

  test("loadEventsSince pushes the bound to the scan in BOTH layouts") {
    // synthetic events dir in the LEGACY raw-long layout (nano-scale
    // magnitudes): the widened raw bound must reach PushedFilters and
    // the exact converted-predicate re-filter must keep results right
    val dir = s"$tmp/legacy_sf"
    val base = 1704067200000000L // 2024-01-01T00:00:00Z in micros
    val rows = (0 until 100).map(i => (base + i * 3600000000L) * 1000L)
    rows.toDF("ts").write.mode("overwrite").parquet(s"$dir/events.parquet")
    val since = base + 50 * 3600000000L
    val legacy = Tables.loadEventsSince(spark, dir, since)
    val legacyPlan = legacy.queryExecution.executedPlan.toString
    assert(legacyPlan.contains(
      "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"),
      s"raw-long bound not pushed in legacy layout:\n$legacyPlan")
    assert(legacy.count() == 50)
    assert(legacy.schema("ts").dataType == TimestampType)
    // the CURRENT driver layout (timestamp_ntz[us]) goes through the
    // native-predicate branch — same PushedFilters contract
    val current = Tables.loadEventsSince(spark, sf,
      java.time.Instant.parse("2024-01-10T00:00:00Z").getEpochSecond * 1000000L)
    val curPlan = current.queryExecution.executedPlan.toString
    assert(curPlan.contains(
      "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"),
      s"bound not pushed in current layout:\n$curPlan")
    assert(current.count() > 0 &&
      current.count() < Tables.load(spark, sf, "events").count())
  }

  test("rawLowerBound is sound: never drops a qualifying row") {
    val since = 1704067200000000L
    for (unit <- Seq[AdaptiveRead.EpochUnit](AdaptiveRead.Nanos,
        AdaptiveRead.Micros, AdaptiveRead.Millis, AdaptiveRead.Seconds)) {
      val bound = unit.rawLowerBound(since)
      // any raw value whose converted micros >= since must satisfy
      // raw >= bound; probe the boundary neighborhood exhaustively
      val factor = unit match {
        case AdaptiveRead.Nanos => 0.001
        case AdaptiveRead.Micros => 1.0
        case AdaptiveRead.Millis => 1000.0
        case AdaptiveRead.Seconds => 1000000.0
      }
      for (delta <- -3L to 3L) {
        val raw = math.ceil(since / factor).toLong + delta
        val convMicros = (raw * factor).toLong
        if (convMicros >= since)
          assert(raw >= bound,
            s"$unit: raw=$raw converts to $convMicros >= $since but bound $bound drops it")
      }
    }
  }
}
