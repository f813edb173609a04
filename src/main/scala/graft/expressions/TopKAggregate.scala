package graft.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state top-k aggregate: keeps the k largest (value, id)
  * pairs, ordered by (value, id) descending.
  *
  * Exists because the two stock ways to get "top k per group" both
  * misbehave at 100 TB: a window `row_number` sorts EVERY row of every
  * group (a per-partition sort of the whole fact table just to keep
  * 3 rows), and `slice(sort_array(collect_list(...)))` buffers the
  * whole group in one aggregation state before truncating. This
  * Aggregator's state never exceeds `CompressFactor × k` entries, it
  * partial-aggregates map-side like any hash aggregate, and merges are
  * associative and commutative (truncation at k commutes with merge
  * because the discarded tail can never re-enter a top-k) — so the
  * result is deterministic under any partitioning, which is what makes
  * it oracle-checkable against the window formulation.
  */
object TopKAggregate {

  private val CompressFactor = 4

  /** The k largest (default) or k smallest (value, id) pairs under
    * (value, id) lexicographic order, as an Aggregator over
    * (value, id) tuples. */
  def topKAgg(k: Int, largest: Boolean = true): Aggregator[(Double, Long),
      ArrayBuffer[(Double, Long)], Seq[(Double, Long)]] = {
    require(k >= 1)
    val asc =
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
    val ord = if (largest) asc.reverse else asc
    new Aggregator[(Double, Long), ArrayBuffer[(Double, Long)],
        Seq[(Double, Long)]] {
      private def compress(b: ArrayBuffer[(Double, Long)])
          : ArrayBuffer[(Double, Long)] = {
        val kept = b.sorted(ord).take(k)
        b.clear(); b ++= kept
        b
      }
      def zero: ArrayBuffer[(Double, Long)] = ArrayBuffer.empty
      def reduce(b: ArrayBuffer[(Double, Long)], r: (Double, Long))
          : ArrayBuffer[(Double, Long)] = {
        b += r
        if (b.length > CompressFactor * k) compress(b) else b
      }
      def merge(a: ArrayBuffer[(Double, Long)],
          b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] =
        compress(a ++= b)
      def finish(b: ArrayBuffer[(Double, Long)]): Seq[(Double, Long)] =
        b.sorted(ord).take(k).toSeq
      def bufferEncoder: Encoder[ArrayBuffer[(Double, Long)]] =
        Encoders.kryo[ArrayBuffer[(Double, Long)]]
      def outputEncoder: Encoder[Seq[(Double, Long)]] =
        ExpressionEncoder[Seq[(Double, Long)]]()
    }
  }

  /** Column API: `top_k(value, id, k)` → array<struct<_1 value,
    * _2 id>> in descending (value, id) order. */
  def topK(value: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(topKAgg(k),
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
      .apply(value, id)
  }

  /** The k SMALLEST, ascending — bounded-state replacement for
    * `slice(sort_array(collect_list(...)), 1, k)`, which buffers the
    * whole group before truncating (a stopword's postings list at
    * corpus scale). */
  def bottomK(value: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(topKAgg(k, largest = false),
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
      .apply(value, id)
  }
}
