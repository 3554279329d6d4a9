package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static shingling kernel: distinct word n-grams of a pre-normalized
  * (lowercased, punctuation-collapsed, trimmed) string, first-occurrence
  * order. Plain JVM string ops — called from codegen, so the per-element
  * cost is a method call, not an interpreted Catalyst lambda (the
  * higher-order-function formulation measured ~2× slower at sf0.1).
  */
object Shingler {
  def distinctShingles(s: UTF8String, n: Int): ArrayData = {
    val words0 = s.toString.split(" ")
    var nonEmpty = 0
    var i = 0
    while (i < words0.length) { if (words0(i).nonEmpty) nonEmpty += 1; i += 1 }
    val words =
      if (nonEmpty == words0.length) words0
      else words0.filter(_.nonEmpty)
    val out = new java.util.LinkedHashSet[UTF8String]
    i = 0
    val last = words.length - n
    while (i <= last) {
      val sb = new java.lang.StringBuilder(words(i))
      var k = 1
      while (k < n) { sb.append(' ').append(words(i + k)); k += 1 }
      out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size)))
  }
}

/** `graft_shingles(normalized_text, n)` as a native codegen Expression —
  * the row-local heart of the n-gram dedup tier (SURVEY §2 dedup; reference
  * semantics = distinct 3-gram shingles per document). Row-local by
  * construction: a document's shingle set never leaves its input partition
  * until a caller joins on it, unlike a posexplode + lead-window
  * formulation whose token stream shuffles for the per-doc sort.
  *
  * `n` is fixed at plan time (a foldable argument in SQL, a Scala Int from
  * the API) — it parameterizes generated code, it is not data.
  */
case class DistinctShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, n >= 1), got (${child.dataType}, $n)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(s: Any): Any =
    Shingler.distinctShingles(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingler.distinctShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): DistinctShingles =
    copy(child = newChild)
}
