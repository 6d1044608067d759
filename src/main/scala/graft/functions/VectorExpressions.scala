package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native float-vector kernels. The higher-order-function forms
  * (`aggregate(zip_with(...))`) are interpreted with per-element boxing —
  * fine for correctness, ~100× too slow for 10^7+ pair scoring. These
  * expressions run the same left-to-right double-precision folds as the
  * HOF forms (and as the DuckDB oracle's `list_reduce`), so results are
  * bit-identical, but as tight primitive loops inside whole-stage
  * codegen.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dot_f requires two array<float> arguments, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(DotProductF.dot(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotProductF.dot($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "dot_f"
}

object DotProductF {
  /** Left-to-right double fold — identical to
    * `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, _+_)`.
    *
    * Reads the Tungsten array in place (`getFloat` is a raw offset
    * load): the earlier `toFloatArray()` form copied BOTH sides on
    * EVERY evaluation — ~2 heap allocations per scored pair, which at
    * 50M pairs (dd_embed_cosine, sf0.1) was tens of GB of young-gen
    * churn whose GC tail also landed on whatever query ran next.
    */
  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

case class L2NormF(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"l2norm_f requires an array<float> argument, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    java.lang.Double.valueOf(L2NormF.norm(a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.L2NormF.norm($a);")

  override protected def withNewChildInternal(c: Expression): L2NormF = copy(c)
  override def prettyName: String = "l2norm_f"
}

object L2NormF {
  /** In-place fold over the Tungsten array — no per-row copy. */
  def norm(x: ArrayData): Double = {
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = x.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }
}

object VectorExpressions {
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductF(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def l2NormF(c: Column): Column =
    ColumnBridge.column(L2NormF(ColumnBridge.expression(c)))
}
