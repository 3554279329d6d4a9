package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity — the other half of the fuzzy-matching toolkit
  * next to Spark's built-in `levenshtein` (edit distance weights all
  * positions equally; entity names mistype mid-string far more than at the
  * start, which is exactly the prefix emphasis Winkler adds). Classic
  * definition: Jaro from matches inside the ⌊max(|a|,|b|)/2⌋−1 window and
  * half-transpositions, then the prefix boost `j + ℓ·0.1·(1−j)` with
  * ℓ = common prefix capped at 4, applied only when j > 0.7 — the same
  * semantics DuckDB's `jaro_winkler_similarity` implements, which is what
  * makes c18's oracle a cross-engine check of this expression.
  */
object JaroWinklerFns {

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val j = jaro(s, t)
    if (j <= 0.7) j
    else {
      var l = 0
      val cap = math.min(4, math.min(s.length, t.length))
      while (l < cap && s.charAt(l) == t.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    }
  }

  private def jaro(s: String, t: String): Double = {
    val ls = s.length
    val lt = t.length
    // both-empty yields 0 (the DuckDB/RapidFuzz convention, verified
    // exhaustively against jaro_winkler_similarity — see JaroWinklerSpec)
    if (ls == 0 || lt == 0) return 0.0
    val window = math.max(0, math.max(ls, lt) / 2 - 1)
    val sM = new Array[Boolean](ls)
    val tM = new Array[Boolean](lt)
    var m = 0
    var i = 0
    while (i < ls) {
      val lo = math.max(0, i - window)
      val hi = math.min(lt - 1, i + window)
      var k = lo
      var found = false
      while (k <= hi && !found) {
        if (!tM(k) && t.charAt(k) == s.charAt(i)) {
          sM(i) = true; tM(k) = true; m += 1; found = true
        }
        k += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // half-transpositions: matched chars compared in order
    var trans = 0
    var k = 0
    i = 0
    while (i < ls) {
      if (sM(i)) {
        while (!tM(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    // integer halving of transpositions (strcmp95/DuckDB convention)
    (md / ls + md / lt + (md - trans / 2) / md) / 3.0
  }
}

/** Registered as `graft_jaro_winkler(a, b)` by [[graft.GraftExtensions]] —
  * codegen delegates to the static kernel so the refine stage of a blocked
  * fuzzy join stays inside whole-stage codegen.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerFns.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinklerFns.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}
