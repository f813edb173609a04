package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** `searchsorted` over a broadcast array of sorted splitter keys: the
  * number of splitters ≤ the row's key under the struct ordering —
  * i.e. the row's range-bucket id.
  *
  * This is the O(log n)-per-row form of the explicit order-consistent
  * bucketing behind [[graft.operators.PrefixSum.orderBuckets]]. The
  * previous formulation — a foldLeft of `when(key >= splitterLit, 1)`
  * branches — is semantically identical but costs O(splitters) struct
  * comparisons per corpus row AND grows the generated code linearly
  * with the splitter count: fine at the hundreds-of-buckets regime it
  * was built for, a real cost at the ~10⁵ task-sized buckets a 100 TB
  * corpus needs (r17 verdict #1). Here the splitters ride the plan
  * once as a referenced object (serialized with the expression, like
  * a broadcast hash-join's relation rides its plan), and each row
  * pays one binary search — 17 comparisons at 10⁵ splitters instead
  * of 10⁵ — inside whole-stage codegen.
  *
  * Order-consistency contract (same as the chain it replaces): the
  * comparison is Spark's own interpreted struct ordering — fields
  * left-to-right, nulls FIRST — so equal keys always get equal bucket
  * ids (ties never split across buckets) and a null-bearing key or
  * splitter degrades to a coarser bucket instead of erroring. The
  * splitter array MUST be sorted by that same ordering and
  * deduplicated; [[graft.operators.PrefixSum.orderBuckets]] sorts and
  * dedupes on the driver before constructing this.
  *
  * Equality is CONTENT-based (r18 verdict watch #3): the generated
  * case-class equals would compare the `splitters` array by
  * reference, so two independently-built instances over the same data
  * would never compare equal — silently defeating semanticEquals and
  * subexpression elimination for any caller that doesn't reuse the
  * one Column object. equals/hashCode below compare the splitter rows
  * elementwise under the key ordering instead, so equal splitter
  * content IS expression equality whatever object built it.
  */
case class SearchSortedCount(child: Expression,
    splitters: Array[InternalRow], keyType: StructType)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(keyType)

  private def search(key: InternalRow): Int = {
    var lo = 0
    var hi = splitters.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ordering.compare(splitters(mid), key) <= 0) lo = mid + 1
      else hi = mid
    }
    lo
  }

  override def nullSafeEval(key: Any): Any =
    search(key.asInstanceOf[InternalRow])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // java-source array syntax — classOf[Array[_]].getName would give
    // the JVM binary form "[L...;", which janino cannot parse
    val arr = ctx.addReferenceObj("splitters", splitters,
      "org.apache.spark.sql.catalyst.InternalRow[]")
    val ord = ctx.addReferenceObj("ordering", ordering,
      classOf[Ordering[Any]].getName)
    nullSafeCodeGen(ctx, ev, key => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
        int $lo = 0;
        int $hi = $arr.length;
        while ($lo < $hi) {
          int $mid = ($lo + $hi) >>> 1;
          if ($ord.compare($arr[$mid], $key) <= 0) $lo = $mid + 1;
          else $hi = $mid;
        }
        ${ev.value} = $lo;
      """
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): SearchSortedCount = copy(child = newChild)

  // content-based equality (see class scaladoc): elementwise splitter
  // comparison under the key ordering — the ordering the search
  // itself uses, so "equal" means "same bucket function"
  override def equals(other: Any): Boolean = other match {
    case s: SearchSortedCount =>
      child == s.child && keyType == s.keyType &&
        splitters.length == s.splitters.length && {
          var i = 0
          var same = true
          while (same && i < splitters.length) {
            same = ordering.compare(splitters(i), s.splitters(i)) == 0
            i += 1
          }
          same
        }
    case _ => false
  }

  // equal objects must hash equal: hash the identity-independent
  // fields only (hashing rows via the ordering isn't available; a
  // length+type+child hash is legal and collision-cheap — equality
  // does the elementwise work)
  override def hashCode(): Int =
    java.util.Objects.hash(classOf[SearchSortedCount], child, keyType,
      Integer.valueOf(splitters.length))
}

object SearchSortedCount {
  /** Column-level API: bucket id of `key` (a struct column) against
    * `splitters`, which must be sorted ascending by the struct
    * ordering of `keyType` and deduplicated. */
  def bucketOf(key: Column, splitters: Array[InternalRow],
      keyType: StructType): Column =
    ColumnBridge.column(
      SearchSortedCount(ColumnBridge.expression(key), splitters, keyType))
}
