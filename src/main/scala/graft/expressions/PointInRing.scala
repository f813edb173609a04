package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType}

/** Native ray-casting point-in-polygon test over pre-parsed ring
  * coordinates (`xs`, `ys` as `array<double>` columns).
  *
  * Multi-ring geometry (interior rings / MULTIPOLYGON parts — real NUTS
  * regions, `nuts_mapper.py:29-47`) is encoded as ONE flat coordinate
  * array per axis with a `NaN` sentinel between rings (no real
  * coordinate is NaN). Containment is even-odd across rings: each
  * ring's ray-cast XORs into the result, so a hole ring flips a point
  * back to outside and disjoint parts compose. A plain single-ring
  * array (no NaN) behaves exactly as before.
  *
  * The spatial-join hot path (SURVEY.md J4) evaluates this once per
  * (point × bbox-surviving polygon); parsing WKT per evaluation would
  * dominate, so the polygon dimension is pre-parsed once at broadcast
  * time and this expression runs a pure primitive loop inside
  * whole-stage codegen — the (b)-tier custom-Expression design over
  * the v0 string-parsing UDF.
  */
case class PointInRing(
    xs: Expression, ys: Expression, px: Expression, py: Expression)
    extends QuaternaryExpression {

  // getDouble over the ring arrays requires 8-byte slots; checking the
  // types makes a float-array or mistyped literal fail analysis instead
  // of reading garbage.
  override def checkInputDataTypes(): TypeCheckResult =
    (xs.dataType, ys.dataType, px.dataType, py.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _),
          DoubleType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"point_in_ring requires (array<double>, array<double>, double, " +
          s"double), got $other")
    }

  override def first: Expression = xs
  override def second: Expression = ys
  override def third: Expression = px
  override def fourth: Expression = py

  override def dataType: DataType = BooleanType

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any = {
    val rx = a.asInstanceOf[ArrayData]
    val ry = b.asInstanceOf[ArrayData]
    val x = c.asInstanceOf[Double]
    val y = d.asInstanceOf[Double]
    val n = math.min(rx.numElements(), ry.numElements())
    var inside = false
    var s = 0
    while (s < n) {
      var e = s
      while (e < n && !java.lang.Double.isNaN(rx.getDouble(e))) e += 1
      // ring is [s, e); e == n or points at a NaN separator
      var i = s
      var j = e - 1
      while (i < e) {
        val xi = rx.getDouble(i); val yi = ry.getDouble(i)
        val xj = rx.getDouble(j); val yj = ry.getDouble(j)
        if ((yi > y) != (yj > y) &&
            x < (xj - xi) * (y - yi) / (yj - yi) + xi) inside = !inside
        j = i
        i += 1
      }
      s = e + 1
    }
    inside
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (rx, ry, x, y) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val e = ctx.freshName("e")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val xj = ctx.freshName("xj"); val yj = ctx.freshName("yj")
      val inside = ctx.freshName("inside")
      s"""
        int $n = java.lang.Math.min($rx.numElements(), $ry.numElements());
        boolean $inside = false;
        int $s = 0;
        while ($s < $n) {
          int $e = $s;
          while ($e < $n && !java.lang.Double.isNaN($rx.getDouble($e))) $e++;
          int $j = $e - 1;
          for (int $i = $s; $i < $e; $i++) {
            double $xi = $rx.getDouble($i); double $yi = $ry.getDouble($i);
            double $xj = $rx.getDouble($j); double $yj = $ry.getDouble($j);
            if ((($yi > $y) != ($yj > $y)) &&
                $x < ($xj - $xi) * ($y - $yi) / ($yj - $yi) + $xi) {
              $inside = !$inside;
            }
            $j = $i;
          }
          $s = $e + 1;
        }
        ${ev.value} = $inside;
      """
    })

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression)
      : PointInRing = copy(xs = a, ys = b, px = c, py = d)
}

object PointInRing {
  def pointInRing(xs: Column, ys: Column, px: Column, py: Column): Column =
    ColumnBridge.column(PointInRing(
      ColumnBridge.expression(xs), ColumnBridge.expression(ys),
      ColumnBridge.expression(px), ColumnBridge.expression(py)))
}
