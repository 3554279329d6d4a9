package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Array dot product as a tight primitive loop. The composable spelling —
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — is semantically right but
  * Spark's higher-order functions are CodegenFallback: every row pays
  * interpreted lambda dispatch and a materialized intermediate array.
  * This expression keeps the SAME left-fold arithmetic (acc += a_i·b_i in
  * element order, so results are bit-identical to the composed form and
  * the existing DuckDB oracles) but runs as one codegen'd loop with no
  * allocation. `graft_dot(v, v)` is the squared norm — the two calls every
  * cosine needs. Length mismatch or a null element yields NaN, which the
  * callers' `nrm > 0` guards already route to the sentinel cosine.
  */
object VecDot {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n) return Double.NaN
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** Nearest-center assignment fused into one loop: 1-based index of the
  * centroid (first argument, an `array<array<double>>` — in practice a
  * foldable codebook literal) with the smallest squared distance to the
  * vector. Replaces the composed
  * `array_position(darr, array_min(darr))` over
  * `transform(centers, c => aggregate(zip_with(c, v, (a,b) => (a-b)²), 0.0, _+_))`
  * — same fold order per center, same first-minimum tie rule, so the
  * assignment is bit-identical — without materializing the distance array
  * or paying interpreted lambda dispatch per element. A malformed center
  * (length mismatch / null element) gets distance NaN and is never
  * selected; if every center is malformed the result is 0 (no cell).
  */
object VecNearest {
  def nearest(centers: ArrayData, v: ArrayData): Int = {
    val n = v.numElements()
    var best = Double.PositiveInfinity
    var bestIdx = 0
    var c = 0
    val nc = centers.numElements()
    while (c < nc) {
      if (!centers.isNullAt(c)) {
        val ctr = centers.getArray(c)
        if (ctr.numElements() == n) {
          var acc = 0.0
          var i = 0
          var ok = true
          while (ok && i < n) {
            if (ctr.isNullAt(i) || v.isNullAt(i)) ok = false
            else {
              val d = ctr.getDouble(i) - v.getDouble(i)
              acc += d * d
              i += 1
            }
          }
          if (ok && acc < best) { best = acc; bestIdx = c + 1 }
        }
      }
      c += 1
    }
    bestIdx
  }
}

/** Registered as `graft_nearest(centers, v)` by [[graft.GraftExtensions]]. */
case class VecNearestCenter(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okC(t: DataType) = t match {
    case ArrayType(ArrayType(DoubleType, _), _) => true
    case _ => false
  }
  private def okV(t: DataType) = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okC(left.dataType) && okV(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<array<double>>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_nearest"

  override protected def nullSafeEval(c: Any, v: Any): Any =
    VecNearest.nearest(c.asInstanceOf[ArrayData], v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, v) => s"graft.functions.VecNearest.nearest($c, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecNearestCenter =
    copy(left = newLeft, right = newRight)
}

/** Registered as `graft_dot(a, b)` by [[graft.GraftExtensions]]. */
case class VecDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType) = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotProduct =
    copy(left = newLeft, right = newRight)
}
