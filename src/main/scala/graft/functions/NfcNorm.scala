package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) — the text-hygiene
  * step every web-scale corpus runs before fingerprinting: visually
  * identical strings with decomposed combining marks (`e` + U+0301 vs
  * U+00E9) hash apart and defeat exact dedup unless canonicalized first.
  * Backed by `java.text.Normalizer` (the JDK's ICU-derived tables); the
  * fast path skips allocation entirely when the input is already NFC —
  * the overwhelmingly common case for real corpora, checked without
  * materializing a new string.
  */
object NfcNorm {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Registered as `graft_nfc(str)` by [[graft.GraftExtensions]] — a native
  * codegen Expression (the [[StudentTPValue]] pattern), so normalization
  * stays inside whole-stage codegen next to the fingerprint/shingle
  * expressions it feeds.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(s: Any): Any =
    NfcNorm.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNorm.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
