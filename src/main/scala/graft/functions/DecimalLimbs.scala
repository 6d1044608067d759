package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Recombine three 24-bit limb sums of unscaled decimal values into the
  * exact double they represent — the per-GROUP tail of the limb-sum
  * aggregation in [[graft.functions.dsum]]/`dsumProd`.
  *
  * Why it exists: summing DecimalType directly runs per-ROW BigDecimal
  * arithmetic once the sum type exceeds Spark's 18-digit compact range
  * (measured: TPC-H Q1 spent 15.9 of 15.9s in decimal casts/adds at 6M
  * rows). The limb form sums plain longs per row; this expression does
  * ONE BigDecimal recombination per group. It cannot go through Spark's
  * decimal arithmetic: `decimal(38,0) / 10^12` re-adjusts precision and
  * rounds the quotient to scale 6, destroying the 12-scale exactness.
  * `java.math.BigDecimal.doubleValue` is correctly rounded (it falls
  * back to `Double.parseDouble(toString)` for hard cases) — the same
  * semantics as Spark's `Decimal.toDouble` and DuckDB's
  * VARCHAR-round-trip cast, so results stay bit-identical to the
  * direct decimal-sum formulation.
  */
case class LimbsToDouble(hi: Expression, mid: Expression, lo: Expression,
    scale: Int) extends TernaryExpression {

  override def first: Expression = hi
  override def second: Expression = mid
  override def third: Expression = lo
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (hi.dataType, mid.dataType, lo.dataType) match {
      case (LongType, LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"limbs_to_double requires three bigint arguments, got $other")
    }

  override def nullSafeEval(h: Any, m: Any, l: Any): Any =
    java.lang.Double.valueOf(LimbsToDouble.combine(
      h.asInstanceOf[Long], m.asInstanceOf[Long], l.asInstanceOf[Long], scale))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, m, l) =>
      s"${ev.value} = graft.functions.LimbsToDouble.combine($h, $m, $l, $scale);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LimbsToDouble =
    copy(hi = f, mid = s, lo = t)
  override def prettyName: String = "limbs_to_double"
}

object LimbsToDouble {
  private val W24 = java.math.BigDecimal.valueOf(1L << 24)
  private val W48 = java.math.BigDecimal.valueOf(1L << 48)

  /** Exact `(hi·2^48 + mid·2^24 + lo) · 10^-scale` as the nearest
    * double. Runs once per group, not per row.
    */
  def combine(hi: Long, mid: Long, lo: Long, scale: Int): Double =
    java.math.BigDecimal.valueOf(hi).multiply(W48)
      .add(java.math.BigDecimal.valueOf(mid).multiply(W24))
      .add(java.math.BigDecimal.valueOf(lo))
      .movePointLeft(scale)
      .doubleValue()

  def limbsToDouble(hi: Column, mid: Column, lo: Column, scale: Int): Column =
    ColumnBridge.column(LimbsToDouble(
      ColumnBridge.expression(hi), ColumnBridge.expression(mid),
      ColumnBridge.expression(lo), scale))
}
