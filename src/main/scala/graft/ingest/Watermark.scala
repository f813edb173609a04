package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Incremental-ingest primitives (SURVEY.md §2.9): watermark =
  * MAX(time) of the target table, resume from there; deterministic
  * chunked work-lists for forward fill and backward backfill.
  *
  * The max-scan reads only parquet footer statistics (min/max per
  * row group) after Catalyst prunes columns — no data pages, so the
  * resume read stays cheap even on a 100 TB table.
  */
object Watermark {

  /** I1 — `select max(tsCol) from table`, None when the table doesn't
    * exist yet (first run, reference falls back to a default start). */
  def maxTs(ds: IngestDataset, table: String, tsCol: String)
      : Option[Timestamp] =
    if (!ds.tableExists(table)) None
    else Option(ds.read(table).agg(max(col(tsCol))).head().getTimestamp(0))

  /** I1 variant — per-entity watermarks (e2watch.py:166-179 reads the
    * latest timestamp per building before requesting deltas). */
  def maxTsPerKey(ds: IngestDataset, table: String, tsCol: String,
      keys: Seq[String]): Map[Seq[Any], Timestamp] =
    if (!ds.tableExists(table)) Map.empty
    else ds.read(table).groupBy(keys.map(col): _*)
      .agg(max(col(tsCol)).as("_wm"))
      .collect()
      .map(r => keys.indices.map(r.get) -> r.getAs[Timestamp]("_wm"))
      .toMap

  /** I4 — forward work-list: [from, to) in fixed steps (entsog 1-day
    * chunks, ecmwf 8-day chunks). */
  def forwardChunks(from: Timestamp, to: Timestamp, stepMillis: Long)
      : Seq[(Timestamp, Timestamp)] = {
    val out = Seq.newBuilder[(Timestamp, Timestamp)]
    var t = from.getTime
    while (t < to.getTime) {
      val end = math.min(t + stepMillis, to.getTime)
      out += ((new Timestamp(t), new Timestamp(end)))
      t = end
    }
    out.result()
  }

  /** I3 — backward backfill work-list down to a floor date
    * (regelleistung.py:645-700 walks day-by-day until the source 404s
    * or EARLIEST_DATE_TO_WRITE). */
  def backwardChunks(from: Timestamp, floor: Timestamp, stepMillis: Long)
      : Seq[(Timestamp, Timestamp)] = {
    val out = Seq.newBuilder[(Timestamp, Timestamp)]
    var end = from.getTime
    while (end > floor.getTime) {
      val start = math.max(end - stepMillis, floor.getTime)
      out += ((new Timestamp(start), new Timestamp(end)))
      end = start
    }
    out.result()
  }
}
