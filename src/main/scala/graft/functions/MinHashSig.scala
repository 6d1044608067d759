package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a shingle set: k affine permutations
  * `(a_i * h + b_i) mod p` over an md5-derived base hash of each
  * shingle (cross-engine computable — see [[MinHashSig.baseHash]]),
  * column-wise minimum.
  *
  * The pure-HOF formulation (nested `transform`/`array_min` over a
  * 64-coefficient literal array) is interpreted per element — O(k·n)
  * boxed ops per row, recomputed at every plan reference; it measured
  * 126 s on 500 docs. This expression runs the same math as one tight
  * primitive loop inside codegen: microseconds per row.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashSig.signature(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.MinHashSig.signature($c));""".stripMargin)

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  val NumHashes = 64
  val MersennePrime = 2147483647L // 2^31 - 1

  // Deterministic affine family (odd multipliers, fixed constants).
  val coefA: Array[Long] =
    Array.tabulate(NumHashes)(i => ((i * 2654435761L + 1013904223L) % MersennePrime) | 1L)
  val coefB: Array[Long] =
    Array.tabulate(NumHashes)(i => (i * 1103515245L + 12345L) % MersennePrime)

  /** Base hash of a shingle: md5-derived 64 bits folded into [0, p) with
    * an UNSIGNED mod — DuckDB computes the identical value as
    * `('0x' || substr(md5(s),1,16))::UBIGINT % 2147483647`, which is what
    * makes the whole minhash signature (and therefore dd_minhash_lsh's
    * oracle) SQL-expressible.
    */
  def baseHash(s: UTF8String): Long =
    java.lang.Long.remainderUnsigned(
      SimHash.md5Hash64(s.getBytes), MersennePrime)

  /** Shared by interpreted eval and generated code. */
  def signature(shingles: ArrayData): Array[Long] = {
    val n = shingles.numElements()
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = baseHash(shingles.getUTF8String(j))
      var i = 0
      while (i < NumHashes) {
        val v = (coefA(i) * h + coefB(i)) % MersennePrime
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    mins
  }

  def minhashSig(c: Column): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c)))

  def sigOverlap(a: Column, b: Column): Column =
    ColumnBridge.column(SigOverlap(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Count of equal components between two minhash signatures — the
  * Jaccard estimator numerator. Native loop instead of an interpreted
  * `aggregate(zip_with(...))` over every candidate pair.
  */
case class SigOverlap(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sig_overlap requires two array<long> arguments, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    Integer.valueOf(SigOverlap.overlap(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SigOverlap.overlap($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "sig_overlap"
}

object SigOverlap {
  def overlap(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }
}
