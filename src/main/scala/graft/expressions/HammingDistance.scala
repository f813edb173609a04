package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Hamming distance over two string fingerprints.
  *
  * The verification kernel of every banded-LSH near-dup path that
  * carries its signature as a bit STRING (dHash, SimHash string form):
  * after candidate generation, each surviving pair pays one
  * per-position compare, so at corpus scale this is the pairing hot
  * loop. The previous SQL idiom —
  * `size(filter(sequence(1, len), j -> substring(a,j,1) = …))` —
  * materializes an integer array and two substring allocations per
  * position under interpreted higher-order functions; this expression
  * is a fused byte loop inside whole-stage codegen.
  *
  * Semantics: byte-wise mismatch count over the common prefix plus the
  * length difference (so unequal-length inputs are "everything after
  * the shorter string differs" — the natural extension, though the
  * dedup callers always compare equal-length signatures because the
  * length rides in the band key). Byte-wise equals char-wise on the
  * ASCII '0'/'1' alphabet the fingerprints use.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hamming_distance requires two string arguments, got " +
          s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    val nx = x.numBytes(); val ny = y.numBytes()
    val n = math.min(nx, ny)
    var d = math.abs(nx - ny).toLong
    var i = 0
    while (i < n) {
      if (x.getByte(i) != y.getByte(i)) d += 1L
      i += 1
    }
    d
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
        int $n = java.lang.Math.min($a.numBytes(), $b.numBytes());
        long $d = java.lang.Math.abs($a.numBytes() - $b.numBytes());
        for (int $i = 0; $i < $n; $i++) {
          if ($a.getByte($i) != $b.getByte($i)) $d++;
        }
        ${ev.value} = $d;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  /** Column-level API. */
  def hamming(a: Column, b: Column): Column =
    ColumnBridge.column(
      HammingDistance(ColumnBridge.expression(a),
        ColumnBridge.expression(b)))
}
