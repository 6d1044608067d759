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
  * `dot(vec, plane[t*P+p]) >= 0`), truncated to `bits` planes.
  *
  * The HOF formulation (one `aggregate(zip_with(vec, lit(plane), ...))`
  * per plane) evaluates 48 interpreted, boxed 64-element folds per row —
  * the dominant cost of `sim_ann_lsh` at sf0.1. This expression runs the
  * identical arithmetic (per-plane left-to-right double fold, `>= 0`
  * sign test, bit-OR of `1 << p`) as one primitive loop inside
  * whole-stage codegen, so buckets are bit-identical to the HOF form and
  * to the DuckDB oracle's `list_reduce` fold.
  *
  * `bits` is the RESOLUTION (see [[HyperplaneBuckets.resolutionBits]]):
  * bucket `b` at `bits` planes equals the full-width bucket masked to
  * its low `bits` bits, so two vectors colliding at a finer resolution
  * also collide at every coarser one.
  */
case class HyperplaneBuckets(child: Expression,
    bits: Int = HyperplaneBuckets.MaxPlanesPerTable)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets requires array<float>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(HyperplaneBuckets.buckets(
      input.asInstanceOf[ArrayData].toFloatArray(), bits))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.HyperplaneBuckets.buckets($c.toFloatArray(), $bits));""".stripMargin)

  override protected def withNewChildInternal(c: Expression): HyperplaneBuckets =
    copy(child = c)
  override def prettyName: String = "hyperplane_buckets"
}

object HyperplaneBuckets {
  val NumTables = 8
  val PlanesPerTable = 6 // base resolution: 64 buckets per table
  val ExtPlanesPerTable = 10 // extension planes, engaged as the corpus grows
  val MaxPlanesPerTable: Int = PlanesPerTable + ExtPlanesPerTable // 65536 buckets
  val Dim = 64

  /** Corpus size at which the base 6-bit resolution is calibrated
    * (~31 vectors per table bucket). Each doubling beyond it engages
    * one extension plane, keeping the expected bucket population in a
    * bounded [~31, 62) band — see [[resolutionBits]].
    */
  val BaseCorpus = 2000L

  /** Fixed pseudo-random hyperplanes (deterministic seed) — a tiny
    * constant embedded in the operator, also emitted as literals into
    * the DuckDB oracle SQL. Never a data-dependent collect.
    */
  val hyperplanes: Array[Array[Double]] = {
    val rng = new java.util.Random(42)
    Array.fill(NumTables * PlanesPerTable, Dim)(rng.nextDouble() * 2 - 1)
  }

  /** The EXTENSION planes (bits 6..15 per table), drawn from a separate
    * deterministic seed so the base planes — and hence every bucket at
    * resolutions ≤ 6 — are bit-identical to the pre-extension operator.
    */
  val hyperplanesExt: Array[Array[Double]] = {
    val rng = new java.util.Random(43)
    Array.fill(NumTables * ExtPlanesPerTable, Dim)(rng.nextDouble() * 2 - 1)
  }

  /** LSH resolution for a corpus of `n` vectors: the base 6 planes plus
    * one per doubling of the corpus beyond [[BaseCorpus]], capped at
    * [[MaxPlanesPerTable]]. This is the fixed-bucket-count failure law
    * made explicit: at a FIXED resolution, expected candidates grow as
    * n²/2^bits — the 100× probe corpus (200k vectors at 64 buckets per
    * table) produced a disk-filling multi-billion-row candidate join.
    * Scaling bits with log₂(n) pins the expected bucket population to
    * a constant band, so candidates grow O(n). The rule is INTEGER
    * arithmetic (a count of threshold crossings, no floating log), so
    * the DuckDB oracle's `pbits` CTE computes the identical value and
    * the masked buckets agree bit-for-bit at every corpus size. At all
    * driver gate scales (n ≤ 2000) this returns 6 — the pre-extension
    * resolution, every gate hash unchanged.
    */
  def resolutionBits(n: Long): Int =
    PlanesPerTable +
      (1 to ExtPlanesPerTable).count(k => n >= BaseCorpus * (1L << k))

  /** Shared by interpreted eval and generated code. Fold order matches
    * `aggregate(zip_with(vec, plane, _*_), 0.0, _+_)`: index order,
    * double accumulation, length = min(|vec|, |plane|). Only the first
    * `bits` planes are evaluated; higher resolutions APPEND bits, so
    * `buckets(v, b)(t) == buckets(v, B)(t) & ((1 << b) - 1)` for b ≤ B.
    */
  def buckets(v: Array[Float], bits: Int = MaxPlanesPerTable): Array[Int] = {
    val out = new Array[Int](NumTables)
    var t = 0
    while (t < NumTables) {
      var b = 0
      var p = 0
      while (p < bits) {
        val plane =
          if (p < PlanesPerTable) hyperplanes(t * PlanesPerTable + p)
          else hyperplanesExt(t * ExtPlanesPerTable + (p - PlanesPerTable))
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

  def hyperplaneBuckets(c: Column,
      bits: Int = MaxPlanesPerTable): Column =
    ColumnBridge.column(HyperplaneBuckets(ColumnBridge.expression(c), bits))
}
