package graft.ingest

import java.sql.{Date, Timestamp}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** The `public.metadata` catalog (reference `init.sql:10-23`,
  * `common/base_crawler.py:25-64`): one row per dataset schema, upserted
  * after every crawl with crawl date, temporal extent, table count and
  * size. Upsert is a keyed MERGE implemented as
  * read → anti-filter → union → staged rewrite (the table is tiny —
  * one row per dataset — so a full rewrite is the right plan even at
  * warehouse scale).
  */
final class MetadataCatalog(spark: SparkSession, warehouse: String) {

  private val path = s"$warehouse/public/metadata"

  val schema: StructType = StructType(Seq(
    StructField("schema_name", StringType, nullable = false),
    StructField("crawl_date", DateType),
    StructField("data_date", DateType),
    StructField("data_source", StringType),
    StructField("license", StringType),
    StructField("description", StringType),
    StructField("contact", StringType),
    StructField("tables", IntegerType),
    StructField("size", LongType),
    StructField("temporal_start", TimestampType),
    StructField("temporal_end", TimestampType),
    StructField("concave_hull_geometry", StringType)))

  def exists: Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  def read(): DataFrame =
    if (exists) spark.read.parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)

  /** K6 — ON CONFLICT (schema_name) DO UPDATE. */
  def upsert(row: MetadataRow): Unit = {
    val newRow = spark.createDataFrame(
      java.util.List.of(Row(
        row.schemaName, row.crawlDate, row.dataDate, row.dataSource,
        row.license, row.description, row.contact, row.tables, row.size,
        row.temporalStart.orNull, row.temporalEnd.orNull,
        row.concaveHullWkt.orNull)),
      schema)
    val merged = read()
      .filter(org.apache.spark.sql.functions
        .col("schema_name") =!= row.schemaName)
      .unionByName(newRow)
    val staging = new Path(path + "-staging-" + java.util.UUID.randomUUID())
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    merged.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staging.toString)
    fs.delete(p, true)
    fs.rename(staging, p)
  }

  /** Temporal + spatial extent of a fact table for the catalog row
    * (reference `base_crawler.py` records temporal_start/temporal_end;
    * `metadata_sql_helpers.sql:84-98` the bounding hull). One scan:
    * min/max timestamps and the bounded-state hull aggregate together. */
  def describeExtent(ds: IngestDataset, table: String, tsCol: String,
      lonCol: Option[String] = None, latCol: Option[String] = None)
      : (Option[Timestamp], Option[Timestamp], Option[String]) = {
    import org.apache.spark.sql.functions.{col, max, min}
    val df = ds.read(table)
    val aggs =
      Seq(min(col(tsCol)).as("t0"), max(col(tsCol)).as("t1")) ++
        (for { lon <- lonCol; lat <- latCol } yield
          graft.expressions.HullAggregate
            .hullWkt(col(lon), col(lat)).as("hull"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    (Option(row.getTimestamp(0)), Option(row.getTimestamp(1)),
      if (row.length > 2) Option(row.getString(2)) else None)
  }

  /** K11 — stats refresh: table count + byte size of a dataset dir
    * (reference reads pg_class; here the filesystem is the catalog). */
  def stats(schemaName: String): (Int, Long) = {
    val dir = new Path(s"$warehouse/$schemaName")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) (0, 0L)
    else {
      val tables = fs.listStatus(dir).filter(_.isDirectory)
        .filterNot(_.getPath.getName.startsWith("."))
      (tables.length,
        tables.map(t => fs.getContentSummary(t.getPath).getLength).sum)
    }
  }
}

final case class MetadataRow(
    schemaName: String,
    crawlDate: Date,
    dataDate: Date,
    dataSource: String,
    license: String,
    description: String,
    contact: String,
    tables: Int,
    size: Long,
    temporalStart: Option[Timestamp] = None,
    temporalEnd: Option[Timestamp] = None,
    concaveHullWkt: Option[String] = None)
