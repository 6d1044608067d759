package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over whitespace tokens: FNV-1a-64 per token, per-bit
  * ±1 majority vote, sign bit → signature bit. Near-duplicate documents
  * get signatures within a small Hamming distance, so candidate pairs
  * can be bucketed on 16-bit signature chunks (any pair within Hamming
  * distance 3 shares at least one of four chunks) instead of compared
  * all-pairs — the scalable near-dup path alongside MinHash LSH.
  *
  * Implemented as a native Catalyst Expression with codegen: the whole
  * tokenize→hash→vote loop runs inside the generated stage.
  */
case class SimHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash requires a string argument, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash.compute(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash.compute($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)

  override def prettyName: String = "simhash"
}

object SimHash {
  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  def fnv1a64(s: String): Long = {
    var h = FnvOffset
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** Shared by interpreted eval and generated code. */
  def compute(text: String): Long = {
    val counts = new Array[Int](64)
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      val atEnd = i == n
      if (atEnd || Character.isWhitespace(text.charAt(i))) {
        if (i > start) {
          val th = fnv1a64(text.substring(start, i))
          var b = 0
          while (b < 64) {
            counts(b) += (if (((th >>> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def simhash(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(SimHash(ColumnBridge.expression(c)))
  }
}
