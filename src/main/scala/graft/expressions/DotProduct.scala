package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product of an `array<float>` vector with an
  * `array<double>` weight vector (typically a plan-time literal — the
  * LSH hyperplane weights).
  *
  * Exists because the expression-tree alternative
  * (`Σ element_at(vec, i+1) * lit(w_i)` over dim terms) materializes
  * dim×nBits Catalyst nodes — at 64 dims × 16 hyperplanes that is a
  * ~16k-node Project whose generated code blows past JIT-friendly
  * method sizes. This kernel is one node per hyperplane and runs as a
  * primitive loop inside whole-stage codegen.
  *
  * Accumulation is a left-to-right double sum starting at 0.0 —
  * bit-identical to the left-associated infix sum the DuckDB oracle
  * parses (`(((t0+t1)+t2)+…)`; the leading `0.0 + t0 = t0` is exact),
  * so LSH sign bits derived from it remain oracle-exact.
  *
  * A length mismatch between the vector and the weights throws (a
  * wrong `dim` argument must fail, not silently truncate the dot
  * product). Null ELEMENTS inside either array are not checked in the
  * hot loop — same contract as [[CosineSimilarity]]: embedding vectors
  * are dense; a null slot reads an undefined value.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // left reads 4-byte float slots, right 8-byte double slots; reject
  // any other element types at analysis time (a silent mismatch would
  // read garbage bytes).
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vector_dot requires (array<float>, array<double>), got " +
          s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) throw DotProduct.lengthMismatch(n, y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          throw graft.expressions.DotProduct.lengthMismatch($n, $b.numElements());
        }
        double $dot = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $dot += (double) $a.getFloat($i) * $b.getDouble($i);
        }
        ${ev.value} = $dot;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Shared by interpreted eval and generated code (must be public and
    * return the exception so codegen can `throw` it in one statement). */
  def lengthMismatch(nVec: Int, nWeights: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"vector_dot length mismatch: vector has $nVec elements, " +
        s"weights has $nWeights")

  /** Column-level API. */
  def dot(vec: Column, weights: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(vec),
        ColumnBridge.expression(weights)))
}
