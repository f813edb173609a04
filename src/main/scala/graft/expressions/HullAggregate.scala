package graft.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A11 — bounding-geometry aggregate for the metadata catalog
  * (reference: `metadata_sql_helpers.sql:84-98` builds
  * `ST_ConcaveHull(ST_Collect(ST_MakePoint(lon,lat)), 0.5)` per dataset;
  * the hull is a coverage summary, so the convex hull is used here —
  * same role, no concavity parameter, and it admits a bounded-state
  * distributed aggregate).
  *
  * State is the running hull itself, not the point set: merging two
  * hulls and re-hulling is exact (hull(A ∪ B) = hull(hull(A) ∪ hull(B))),
  * so the buffer stays O(hull size) while streaming arbitrarily many
  * points — safe at 100 TB, where collecting points to one buffer would
  * not be. Partial aggregation happens map-side like any Aggregator.
  */
object HullAggregate {

  type Pt = (Double, Double)

  /** Andrew's monotone chain; returns hull in counter-clockwise order
    * (collinear points dropped). Handles degenerate 1-2 point inputs. */
  def convexHull(points: Seq[Pt]): Seq[Pt] = {
    val sorted = points.distinct.sorted
    if (sorted.length <= 2) return sorted
    def cross(o: Pt, a: Pt, b: Pt): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def half(pts: Seq[Pt]): ArrayBuffer[Pt] = {
      val h = ArrayBuffer.empty[Pt]
      pts.foreach { p =>
        while (h.length >= 2 && cross(h(h.length - 2), h.last, p) <= 0)
          h.remove(h.length - 1)
        h += p
      }
      h
    }
    val lower = half(sorted)
    val upper = half(sorted.reverse)
    (lower.dropRight(1) ++ upper.dropRight(1)).toSeq
  }

  def toWkt(hull: Seq[Pt]): String = hull match {
    case Seq() => "POLYGON EMPTY"
    case Seq((x, y)) => s"POINT ($x $y)"
    case Seq(a, b) => s"LINESTRING (${a._1} ${a._2}, ${b._1} ${b._2})"
    case ring =>
      val pts = (ring :+ ring.head)
        .map { case (x, y) => s"$x $y" }.mkString(", ")
      s"POLYGON (($pts))"
  }

  private val CompressAt = 64

  val agg: Aggregator[Pt, ArrayBuffer[Pt], String] =
    new Aggregator[Pt, ArrayBuffer[Pt], String] {
      def zero: ArrayBuffer[Pt] = ArrayBuffer.empty
      def reduce(b: ArrayBuffer[Pt], p: Pt): ArrayBuffer[Pt] = {
        b += p
        if (b.length > CompressAt) {
          val h = convexHull(b.toSeq); b.clear(); b ++= h
        }
        b
      }
      def merge(a: ArrayBuffer[Pt], b: ArrayBuffer[Pt]): ArrayBuffer[Pt] = {
        a ++= b
        val h = convexHull(a.toSeq); a.clear(); a ++= h
        a
      }
      def finish(b: ArrayBuffer[Pt]): String = toWkt(convexHull(b.toSeq))
      def bufferEncoder: Encoder[ArrayBuffer[Pt]] =
        Encoders.kryo[ArrayBuffer[Pt]]
      def outputEncoder: Encoder[String] = Encoders.STRING
    }

  /** Column API: `st_hull_wkt(lon, lat)` as an aggregate column. */
  def hullWkt(lon: Column, lat: Column): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(agg, Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
      .apply(lon, lat)
  }
}
