package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static winnowing kernel (Schleimer–Wilkerson–Aiken, SIGMOD'03): hash
  * every character k-gram of a pre-normalized string, slide a window of w
  * consecutive hashes, select each window's minimum (rightmost occurrence
  * on ties), and return the DISTINCT (pos, fp) selections in window order.
  * One O(n) pass via the classic ascending-minima deque — equal hashes pop
  * their predecessors, so the deque front is always the window's RIGHTMOST
  * minimum, exactly the paper's tie rule.
  *
  * The fingerprint MUST stay value-identical to the DuckDB replay
  * (`('0x' || substr(md5(gram), 1, 15))::BIGINT`): the first 15 hex chars
  * of the md5 digest = the digest's first 60 bits big-endian, assembled
  * here directly from the raw bytes (7 bytes + the 8th byte's high
  * nibble) without materializing hex strings.
  *
  * A nested higher-order-function formulation (transform over windows,
  * aggregate over offsets) computed the same selection but ran
  * INTERPRETED per window — 31.7 s at sf0.1 vs sub-second here; lambdas
  * never enter whole-stage codegen, static kernels called FROM codegen do
  * (the Shingler lesson, measured again).
  */
object Winnow {
  private val structFields = Array(
    StructField("pos", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = false))
  val elementType: StructType = StructType(structFields)

  def select(s: UTF8String, k: Int, w: Int): ArrayData = {
    val text = s.toString
    val m = text.length - k + 1
    if (m < w) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = new Array[Long](m)
    var i = 0
    while (i < m) {
      val d = md.digest(text.substring(i, i + k)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      h(i) = (v << 4) | ((d(7) & 0xf0L) >>> 4)
      i += 1
    }
    // ascending-minima deque of indices; popping `>=` on push makes the
    // front the rightmost minimal index of the current window
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.LinkedHashSet[Integer]
    i = 0
    while (i < m) {
      while (tail > head && h(dq(tail - 1)) >= h(i)) tail -= 1
      dq(tail) = i; tail += 1
      val j = i - w + 1 // window start now complete
      if (j >= 0) {
        while (dq(head) < j) head += 1
        seen.add(dq(head))
      }
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) {
      val p = it.next().intValue()
      out(i) = new GenericInternalRow(Array[Any](p + 1, h(p))) // 1-based pos
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_winnow(normalized_text, k, w)` as a native codegen Expression —
  * the row-local heart of the d15/d16 fingerprinting tier. k and w are
  * fixed at plan time (foldable arguments), parameterizing the generated
  * call, not data.
  */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1 && w >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, k >= 1, w >= 1), got (${child.dataType}, $k, $w)")

  override def dataType: DataType =
    ArrayType(Winnow.elementType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(s: Any): Any =
    Winnow.select(s.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Winnow.select($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}
