package graft.ingest

import java.sql.Timestamp
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TimescaleDB continuous-aggregate analog. The reference provisions
  * TimescaleDB-HA (`compose.yml:8`) and its dashboards read bucketed
  * rollups of hypertable data; a continuous aggregate is the Timescale
  * feature that keeps such a rollup fresh incrementally instead of
  * recomputing it from raw on every refresh.
  *
  * Here the rollup is a date-partitioned parquet table maintained by
  * [[refresh]]: the requested window is WIDENED to full bucket
  * boundaries (a partial bucket can never be written), only that
  * window's buckets are recomputed from raw, and the touched date
  * partitions are swapped in via [[IngestDataset.replaceWindow]] —
  * every other partition keeps its physical files. Correctness rests
  * on per-bucket aggregation states being independent across buckets
  * (each bucket's rows live entirely inside the refresh window once
  * widened); q151 hash-proves the mergeable-partials invariant the
  * daily cascade adds on top, and ContinuousAggregateSpec proves
  * refresh == full recompute under late data while untouched
  * partitions keep their exact files.
  *
  * 100 TB posture: a refresh reads one window of raw (partition-pruned
  * by the date layout) and writes |touched buckets| rows — the steady
  * state cost is the day's partition, never the table.
  */
final class ContinuousAggregate(
    ingest: IngestDataset,
    rawTable: String,
    aggTable: String,
    tsCol: String,
    bucketUnit: String,
    keys: Seq[String],
    aggs: Seq[Column]) {

  private val unit: ChronoUnit = bucketUnit match {
    case "hour" => ChronoUnit.HOURS
    case "day" => ChronoUnit.DAYS
    case u => throw new IllegalArgumentException(
      s"unsupported bucket unit: $u (hour/day)")
  }

  private def floorTo(t: Timestamp): Timestamp =
    Timestamp.from(t.toInstant.truncatedTo(unit))

  private def ceilTo(t: Timestamp): Timestamp = {
    val f = t.toInstant.truncatedTo(unit)
    Timestamp.from(if (f == t.toInstant) f else f.plus(1, unit))
  }

  private def partials(raw: DataFrame): DataFrame =
    raw.groupBy(
        keys.map(col) :+ date_trunc(bucketUnit, col(tsCol)).as("bucket"): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Recompute the rollup for [from, until), widened outward to bucket
    * boundaries, from the CURRENT raw table (so late-arriving rows in
    * an old bucket are picked up by refreshing that bucket's window).
    * First call builds the table; later calls replace exactly the
    * touched window. */
  def refresh(from: Timestamp, until: Timestamp): Unit = {
    val f = floorTo(from)
    val u = ceilTo(until)
    require(f.before(u), s"empty refresh window [$f, $u)")
    val win = ingest.read(rawTable)
      .filter(col(tsCol) >= lit(f) && col(tsCol) < lit(u))
    if (!ingest.tableExists(aggTable))
      ingest.append(aggTable, partials(win), partitionTs = Some("bucket"))
    else
      ingest.replaceWindow(aggTable, partials(win), "bucket", f, u)
  }

  def read(): DataFrame = ingest.read(aggTable)

  /** Real-time continuous aggregate (the Timescale `real_time`
    * materialization mode): every micro-batch appends to raw and then
    * refreshes the rollup for exactly the batch's event-time span —
    * so the rollup is correct the moment the batch commits, and a
    * bucket receiving rows from several batches is simply refreshed
    * again by the last one (each refresh recomputes from the full raw
    * table, so refresh order across overlapping windows cannot
    * matter). Fresh-checkpoint drains are the contract here; a
    * replayed batch would re-append raw rows — for replay-safe ingest
    * put a pk on the append (q121 discipline). */
  def streamingSink(stream: DataFrame, checkpointDir: String): Unit = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist()
        try {
          val r = b.agg(min(col(tsCol)).as("lo"), max(col(tsCol)).as("hi"))
            .collect()(0)
          if (!r.isNullAt(0)) {
            ingest.append(rawTable, b, partitionTs = Some(tsCol))
            refresh(r.getTimestamp(0),
              new Timestamp(r.getTimestamp(1).getTime + 1L))
          }
        } finally b.unpersist()
        ()
      }
    graft.streaming.StreamOps.timedDrain(q.start())
    ()
  }
}
