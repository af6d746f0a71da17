package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the text-
  * canonicalization pass a training pipeline runs before dedup/hashing:
  * visually-identical strings with different code-point sequences
  * (composed é vs e + U+0301) must hash, join, and dedup identically, or
  * near-duplicate detection silently fragments on encoding provenance.
  *
  * Spark ships no normalization function, and a Scala UDF here would
  * put a ser/de bridge on the hottest corpus-wide path. This stays
  * inside whole-stage codegen via one static call; the common case
  * (already-normalized text — all ASCII is) is a verification pass with
  * ZERO allocation beyond the toString bridge, returning the original
  * UTF8String untouched.
  *
  * Cross-engine contract: JDK `java.text.Normalizer` and DuckDB's
  * `nfc_normalize` (utf8proc) both implement Unicode canonical
  * composition; ExpressionsSpec pins composed/decomposed/non-BMP cases
  * and interpreted ≡ codegen equality.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry shared by interpreted eval and generated code. */
  def nfc(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
