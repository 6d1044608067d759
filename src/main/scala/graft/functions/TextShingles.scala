package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles straight from text: whitespace-tokenize and emit
  * the space-joined n-token windows, one native loop per row.
  *
  * The HOF formulation (`transform(sequence(...), i => concat_ws(" ",
  * element_at(tokens, i+1), ...))`) re-evaluates the token-array
  * subexpression on EVERY `element_at` call inside the lambda — O(n²)
  * splits per document, which measured 22 s just to shingle 5000 docs.
  * Same output strings as `tokens[i] || ' ' || ... (ASCII whitespace)`,
  * so the DuckDB shingle oracle is unchanged.
  */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string argument, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(WordShinglesExpr.shingles(
      input.asInstanceOf[UTF8String].toString, n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.WordShinglesExpr.shingles($c.toString(), $n));""".stripMargin)

  override protected def withNewChildInternal(c: Expression): WordShinglesExpr =
    copy(child = c)
  override def prettyName: String = "word_shingles"
}

object WordShinglesExpr {

  /** Whitespace-run tokenization + n-gram join, matching the
    * `split("\\s+") → drop empties → concat_ws(" ")` semantics of the
    * declarative form (ASCII whitespace on this corpus).
    */
  def shingles(text: String, n: Int): Array[UTF8String] = {
    val toks = new scala.collection.mutable.ArrayBuffer[String](64)
    var start = -1
    var i = 0
    val len = text.length
    while (i <= len) {
      val ws = i == len || Character.isWhitespace(text.charAt(i))
      if (ws) {
        if (start >= 0) { toks += text.substring(start, i); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    val m = toks.length - n + 1
    if (m <= 0) Array.empty
    else Array.tabulate(m) { j =>
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(j + k))
        k += 1
      }
      UTF8String.fromString(sb.toString)
    }
  }

  def wordShinglesNative(c: Column, n: Int): Column =
    ColumnBridge.column(WordShinglesExpr(ColumnBridge.expression(c), n))
}

/** md5-derived 64-bit hashes of a text's word n-gram shingles, one
  * native loop per row — the join-key form of [[WordShinglesExpr]].
  *
  * A shingle self-join on the raw strings shuffles ~25-byte keys and
  * compares them byte-wise; hashing each shingle to the first 8 md5
  * bytes (exactly [[SimHash.md5Hash64]], which DuckDB reproduces as
  * `('0x' || substr(md5(s),1,16))::UBIGINT`) gives a fixed-width 8-byte
  * key instead. Because BOTH engines derive the key with the same md5,
  * results are identical even in the astronomically-unlikely collision
  * case — a collision produces the same extra pair on both sides.
  */
case class WordShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hashes requires a string argument, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(WordShingleHashesExpr.shingleHashes(
      input.asInstanceOf[UTF8String].toString, n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.WordShingleHashesExpr.shingleHashes($c.toString(), $n));""".stripMargin)

  override protected def withNewChildInternal(c: Expression): WordShingleHashesExpr =
    copy(child = c)
  override def prettyName: String = "word_shingle_hashes"
}

object WordShingleHashesExpr {

  /** Hash of each shingle [[WordShinglesExpr.shingles]] would emit, in
    * the same order.
    */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    val sh = WordShinglesExpr.shingles(text, n)
    val out = new Array[Long](sh.length)
    var i = 0
    while (i < sh.length) {
      out(i) = SimHash.md5Hash64(sh(i).getBytes)
      i += 1
    }
    out
  }

  def wordShingleHashesNative(c: Column, n: Int): Column =
    ColumnBridge.column(WordShingleHashesExpr(ColumnBridge.expression(c), n))
}
