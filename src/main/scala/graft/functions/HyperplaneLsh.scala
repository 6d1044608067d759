package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Random-hyperplane LSH buckets of a float vector: element `t` is the
  * sign-bit bucket of the vector in hash table `t` (bit `p` set iff
  * `dot(vec, plane[t*P+p]) >= 0`).
  *
  * The HOF formulation (one `aggregate(zip_with(vec, lit(plane), ...))`
  * per plane) evaluates 48 interpreted, boxed 64-element folds per row —
  * the dominant cost of `sim_ann_lsh` at sf0.1. This expression runs the
  * identical arithmetic (per-plane left-to-right double fold, `>= 0`
  * sign test, bit-OR of `1 << p`) as one primitive loop inside
  * whole-stage codegen, so buckets are bit-identical to the HOF form and
  * to the DuckDB oracle's `list_reduce` fold.
  */
case class HyperplaneBuckets(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets requires array<float>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      HyperplaneBuckets.buckets(input.asInstanceOf[ArrayData].toFloatArray()))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.HyperplaneBuckets.buckets($c.toFloatArray()));""".stripMargin)

  override protected def withNewChildInternal(c: Expression): HyperplaneBuckets =
    copy(child = c)
  override def prettyName: String = "hyperplane_buckets"
}

object HyperplaneBuckets {
  val NumTables = 8
  val PlanesPerTable = 6 // 64 buckets per table
  val Dim = 64

  /** Fixed pseudo-random hyperplanes (deterministic seed) — a tiny
    * constant embedded in the operator, also emitted as literals into
    * the DuckDB oracle SQL. Never a data-dependent collect.
    */
  val hyperplanes: Array[Array[Double]] = {
    val rng = new java.util.Random(42)
    Array.fill(NumTables * PlanesPerTable, Dim)(rng.nextDouble() * 2 - 1)
  }

  /** Shared by interpreted eval and generated code. Fold order matches
    * `aggregate(zip_with(vec, plane, _*_), 0.0, _+_)`: index order,
    * double accumulation, length = min(|vec|, |plane|).
    */
  def buckets(v: Array[Float]): Array[Int] = {
    val out = new Array[Int](NumTables)
    var t = 0
    while (t < NumTables) {
      var b = 0
      var p = 0
      while (p < PlanesPerTable) {
        val plane = hyperplanes(t * PlanesPerTable + p)
        val n = math.min(v.length, plane.length)
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += v(i).toDouble * plane(i)
          i += 1
        }
        if (acc >= 0) b |= 1 << p
        p += 1
      }
      out(t) = b
      t += 1
    }
    out
  }

  def hyperplaneBuckets(c: Column): Column =
    ColumnBridge.column(HyperplaneBuckets(ColumnBridge.expression(c)))
}
