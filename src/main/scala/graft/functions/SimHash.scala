package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over whitespace tokens: md5-derived 64-bit hash per
  * token, per-bit ±1 majority vote, sign bit → signature bit.
  * Near-duplicate documents get signatures within a small Hamming
  * distance, so candidate pairs can be bucketed on 16-bit signature
  * chunks (any pair within Hamming distance 3 shares at least one of
  * four chunks) instead of compared all-pairs — the scalable near-dup
  * path alongside MinHash LSH.
  *
  * The token hash is the first 8 bytes of md5 (big-endian), NOT a
  * bespoke hash: md5 is computable in DuckDB
  * (`('0x' || substr(md5(t),1,16))::UBIGINT`), which makes the whole
  * simhash pipeline SQL-expressible and lets the driver hash-check
  * dd_simhash against a real oracle instead of a rows-only count.
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

  private val md5TL: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 8 bytes of md5 over UTF-8 bytes, big-endian — the same 64-bit
    * value DuckDB computes as `('0x' || substr(md5(s),1,16))::UBIGINT`
    * (Java's long carries the identical bit pattern, signed).
    */
  def md5Hash64(bytes: Array[Byte]): Long = {
    val md = md5TL.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
      ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
      ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
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
          val th = md5Hash64(
            text.substring(start, i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
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
