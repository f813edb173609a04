package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization (canonical composition).
  *
  * The corpus-hygiene primitive behind byte-identical dedup and stable
  * tokenizer vocabularies: the same visible text arrives from the web
  * both precomposed ("é" U+00E9) and decomposed ("e"+U+0301), and a
  * hash-dedup or BPE vocabulary that does not normalize first treats
  * them as distinct. The reference-side ecosystem normalizes in
  * pandas/Python (`unicodedata.normalize`); this puts the same
  * operation inside whole-stage codegen so a 100 TB normalization
  * pass is one projection over the scan, not a UDF round-trip.
  *
  * Semantics: `java.text.Normalizer.normalize(s, NFC)` — the Unicode
  * 15 canonical composition, byte-identical to DuckDB's
  * utf8proc-backed `nfc_normalize` (both implement UAX #15; the q321
  * oracle pins the agreement). Already-normalized strings (the common
  * case on clean corpora) return the INPUT object unchanged via the
  * `isNormalized` quick-check — no allocation on the hot path.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize requires a string argument, got ${t.simpleString(10)}")
    }

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  /** Static kernel shared by eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
