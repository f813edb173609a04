package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-adaptive parquet reads: observe the PHYSICAL type a column
  * arrives with and normalize it to the engine's logical contract
  * (event-time instants as `TimestampType`, micros, session-UTC).
  *
  * Why this exists: upstream producers change physical layouts without
  * notice. The reference engine re-infers its schema on every read
  * (`entsoe_crawler.py:196-209` falls back to concat-and-infer when the
  * stored and incoming frames disagree), so a producer switching its
  * timestamp encoding is absorbed silently. A loader that hard-codes one
  * physical layout instead fails at analysis time on the first upstream
  * change — which is exactly what happened when the test corpus
  * regenerated `events.ts` from parquet TIMESTAMP(NANOS) to plain
  * `timestamp[us]`. This helper is the engine-side analog of that
  * read-side inference, done from parquet FOOTER metadata only (one
  * bounded metadata read per load — never a data scan, so it costs the
  * same at 100 TB as at 100 MB).
  *
  * Supported physical layouts for a contract-timestamp column:
  *   - `TimestampType` (annotated micros/millis, isAdjustedToUTC=true)
  *   - `TimestampNTZType` (annotated, isAdjustedToUTC=false)
  *   - `LongType` from TIMESTAMP(NANOS) read under
  *     `spark.sql.legacy.parquet.nanosAsLong` (annotation says NANOS)
  *   - raw un-annotated int64 epochs — unit classified from the footer's
  *     row-group statistics by magnitude (seconds/millis/micros/nanos
  *     are ~3 decimal orders apart; any plausible modern epoch
  *     classifies unambiguously)
  */
object AdaptiveRead {

  /** Epoch resolution of a raw long column, with the conversion to the
    * micros-UTC contract and the sound raw-long lower bound implied by a
    * micros lower bound (for scan pushdown — widened so truncating
    * division semantics can never drop a qualifying row). */
  sealed abstract class EpochUnit(val name: String) {
    def toTimestamp(colName: String): Column
    def rawLowerBound(sinceMicros: Long): Long
  }
  case object Nanos extends EpochUnit("nanos") {
    // integer `div` — a double division would lose precision on
    // ~1.7e18 nanosecond values (53-bit mantissa)
    def toTimestamp(colName: String): Column =
      expr(s"timestamp_micros(`$colName` div 1000)")
    // widened 999 ns so it is sound for truncating division on
    // pre-epoch values too (`-10500 div 1000` is -10)
    def rawLowerBound(sinceMicros: Long): Long = sinceMicros * 1000L - 999L
  }
  case object Micros extends EpochUnit("micros") {
    def toTimestamp(colName: String): Column = timestamp_micros(col(colName))
    def rawLowerBound(sinceMicros: Long): Long = sinceMicros
  }
  case object Millis extends EpochUnit("millis") {
    def toTimestamp(colName: String): Column = timestamp_millis(col(colName))
    def rawLowerBound(sinceMicros: Long): Long = Math.floorDiv(sinceMicros, 1000L)
  }
  case object Seconds extends EpochUnit("seconds") {
    def toTimestamp(colName: String): Column = timestamp_seconds(col(colName))
    def rawLowerBound(sinceMicros: Long): Long = Math.floorDiv(sinceMicros, 1000000L)
  }

  /** Parquet part-files under `path` (which may itself be a file),
    * capped: footer reads are metadata-only but still one RPC each, so
    * a million-file table samples a handful — magnitude classification
    * only needs ONE file that contains a representative value. */
  private def parquetFiles(spark: SparkSession, path: String,
      cap: Int = 8): Seq[Path] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Nil
    else if (fs.getFileStatus(p).isFile) Seq(p)
    else fs.listStatus(p).iterator
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).toSeq.sortBy(_.toString).take(cap)
  }

  /** Classify a raw int64 column's epoch unit from footer metadata:
    * the logical-type annotation when present (the TIMESTAMP(NANOS)
    * case), else the row-group max statistic by magnitude. Thresholds
    * sit at the geometric midpoints between adjacent units' modern
    * ranges (~2e9 s / ~2e12 ms / ~2e15 us / ~2e18 ns), so every epoch
    * from 1973 through 5000 CE classifies correctly. */
  def detectEpochUnit(spark: SparkSession, path: String,
      colName: String): EpochUnit = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    var annotated: Option[EpochUnit] = None
    // largest |min|/|max| row-group statistic seen across sampled
    // footers: one representative (modern-epoch) value anywhere in the
    // sample pins the unit, even if other files hold only near-epoch
    // values whose magnitude is ambiguous
    var maxMagnitude: Option[Long] = None
    val files = parquetFiles(spark, path).iterator
    while (annotated.isEmpty && files.hasNext) {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(files.next(), conf))
      try {
        val footer = reader.getFooter
        val schema = footer.getFileMetaData.getSchema
        if (schema.containsField(colName)) {
          schema.getType(Seq(colName): _*).getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              annotated = t.getUnit match {
                case TimeUnit.NANOS => Some(Nanos)
                case TimeUnit.MICROS => Some(Micros)
                case TimeUnit.MILLIS => Some(Millis)
              }
            case _ =>
          }
        }
        if (annotated.isEmpty) {
          footer.getBlocks.asScala.foreach { b =>
            b.getColumns.asScala
              .filter(_.getPath.toDotString == colName)
              .foreach { cc =>
                val st = cc.getStatistics
                // hasNonNullValue: an all-null chunk's stats object is
                // non-empty (it records numNulls) but its min/max are
                // uninitialized garbage — never classify from those
                if (st != null && !st.isEmpty && st.hasNonNullValue) {
                  Seq(st.genericGetMin, st.genericGetMax).foreach {
                    case l: java.lang.Long =>
                      val m = math.abs(l.longValue())
                      if (maxMagnitude.forall(_ < m)) maxMagnitude = Some(m)
                    case _ =>
                  }
                }
              }
          }
        }
      } finally reader.close()
    }
    // No annotation AND no usable int64 statistics (stats disabled,
    // all-null column, or every representative file outside the sample
    // cap): refuse loudly. Guessing a unit here risks a silent 6+
    // order-of-magnitude misconversion — the exact class of quiet
    // corruption the loud-failure contract (Verify._errors.json)
    // exists to prevent.
    annotated.orElse(maxMagnitude.map(classifyMagnitude)).getOrElse(
      throw new IllegalStateException(
        s"$path:$colName is int64 with no timestamp annotation and no " +
          "usable row-group statistics in the sampled footers — cannot " +
          "classify its epoch unit; refusing to guess"))
  }

  private[graft] def classifyMagnitude(v: Long): EpochUnit = {
    val m = math.abs(v)
    if (m < 100000000000L) Seconds            // < 1e11 (~5138 CE in s)
    else if (m < 100000000000000L) Millis     // < 1e14 (~5138 CE in ms)
    else if (m < 100000000000000000L) Micros  // < 1e17 (~5138 CE in us)
    else Nanos
  }

  /** Normalize one contract-timestamp column to `TimestampType`
    * (micros, session-UTC), whatever physical layout it arrived in.
    * `path` is only consulted for the raw-long case. */
  def normalizeTimestamp(spark: SparkSession, path: String,
      df: DataFrame, colName: String): DataFrame =
    df.schema(colName).dataType match {
      case TimestampType => df
      // session TZ is UTC throughout the engine, so the cast relabels
      // the same micros value; kept as a cast (not passthrough) so
      // downstream arithmetic sees the instant type the contract names
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case LongType =>
        val unit = detectEpochUnit(spark, path, colName)
        df.withColumn(colName, unit.toTimestamp(colName))
      case DateType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case StringType => // ISO-formatted text timestamps
        df.withColumn(colName, col(colName).cast(TimestampType))
      case other => throw new IllegalStateException(
        s"$path:$colName arrived as $other — not a recognized timestamp layout")
    }

  /** Normalize one contract column to `TimestampNTZType` — for columns
    * whose consumers were written against naive timestamps (the DuckDB
    * oracle's native reading of `timestamp[us]`). Same layout
    * tolerance as [[normalizeTimestamp]]; under the engine's UTC
    * session the two contracts carry identical micros values. */
  def normalizeTimestampNtz(spark: SparkSession, path: String,
      df: DataFrame, colName: String): DataFrame =
    df.schema(colName).dataType match {
      case TimestampNTZType => df
      case TimestampType | DateType =>
        df.withColumn(colName, col(colName).cast(TimestampNTZType))
      case LongType =>
        val unit = detectEpochUnit(spark, path, colName)
        df.withColumn(colName,
          unit.toTimestamp(colName).cast(TimestampNTZType))
      case StringType => // ISO-formatted text timestamps
        df.withColumn(colName, col(colName).cast(TimestampNTZType))
      case other => throw new IllegalStateException(
        s"$path:$colName arrived as $other — not a recognized timestamp layout")
    }

  /** Normalize one contract measure column to `DoubleType`. The
    * producers' numeric layouts drift too (float32 to save space,
    * DECIMAL from a warehouse export, ints for integer-valued
    * measures) — and a drifted input type silently changes
    * decimal-exact aggregation downstream (float→decimal and
    * double→decimal round differently), so the contract pins the
    * arithmetic input type, not just readability. */
  def normalizeDouble(df: DataFrame, colName: String): DataFrame =
    df.schema(colName).dataType match {
      case DoubleType => df
      case FloatType | IntegerType | LongType | ShortType | ByteType |
          _: DecimalType | StringType =>
        df.withColumn(colName, col(colName).cast(DoubleType))
      case other => throw new IllegalStateException(
        s"$colName arrived as $other — not a recognized numeric layout")
    }

  /** Normalize one contract text column to `StringType`. A producer
    * writing text as un-annotated BYTE_ARRAY (no UTF8 logical type —
    * pandas does this for `bytes` columns, and some Arrow writers for
    * large_string round-trips) arrives as `BinaryType`, on which every
    * regex/split/length expression fails at ANALYSIS time — the same
    * whole-table outage class as round 8, but on the LLM-pipeline half
    * of the registry. The bytes are the same UTF-8 either way; only
    * the logical label drifts, so the cast is lossless. */
  def normalizeString(df: DataFrame, colName: String): DataFrame =
    df.schema(colName).dataType match {
      case StringType => df
      case BinaryType =>
        df.withColumn(colName, col(colName).cast(StringType))
      case other => throw new IllegalStateException(
        s"$colName arrived as $other — not a recognized text layout")
    }

  /** Normalize one contract vector column to `array<float>` — the type
    * the native kernels (cosine/dot/top-k) and `Array[Float]` encoders
    * are written against. Embedding producers drift between float32
    * (the storage norm) and float64 (a numpy default leaking through);
    * a double-shipping regen would otherwise kill every similarity
    * query at analysis time. Int arrays (quantized exports) widen
    * losslessly; doubles narrow to the contract's float32 precision —
    * the documented resolution of the column, not a silent change. */
  def normalizeFloatArray(df: DataFrame, colName: String): DataFrame =
    df.schema(colName).dataType match {
      case ArrayType(FloatType, _) => df
      case ArrayType(DoubleType | IntegerType | LongType | ShortType, _) =>
        df.withColumn(colName, col(colName).cast(ArrayType(FloatType)))
      case other => throw new IllegalStateException(
        s"$colName arrived as $other — not a recognized vector layout")
    }

  /** Read a parquet table and normalize the listed contract-timestamp
    * columns (`timestampCols` → instant `TimestampType`, `ntzCols` →
    * naive `TimestampNTZType`). Tolerates TIMESTAMP(NANOS) files by
    * reading them as raw longs (`nanosAsLong`) and converting —
    * Spark's vectorized reader rejects NANOS natively. */
  def readTable(spark: SparkSession, path: String,
      timestampCols: Seq[String], ntzCols: Seq[String] = Nil,
      doubleCols: Seq[String] = Nil, stringCols: Seq[String] = Nil,
      floatArrayCols: Seq[String] = Nil): DataFrame = {
    if (timestampCols.nonEmpty || ntzCols.nonEmpty)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path)
    val instant = timestampCols.foldLeft(df)(
      (d, c) => normalizeTimestamp(spark, path, d, c))
    val ntz = ntzCols.foldLeft(instant)(
      (d, c) => normalizeTimestampNtz(spark, path, d, c))
    val dbl = doubleCols.foldLeft(ntz)((d, c) => normalizeDouble(d, c))
    val str = stringCols.foldLeft(dbl)((d, c) => normalizeString(d, c))
    floatArrayCols.foldLeft(str)((d, c) => normalizeFloatArray(d, c))
  }
}
