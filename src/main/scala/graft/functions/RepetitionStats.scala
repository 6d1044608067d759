package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document repetition statistics in ONE native pass: word count,
  * distinct-word count, 2-gram count, and the highest 2-gram frequency.
  *
  * These statistics are doc-local, so no cross-row aggregation is needed
  * at all: the explode → groupBy(doc_id, term) formulation shuffles
  * every token of the corpus twice to compute what a per-row hash map
  * sees in one scan (measured 5.5 s vs 0.6 s on 50k docs). The shuffled
  * form remains the right shape for CROSS-document term statistics;
  * within-document stats never need it.
  *
  * Tokenization matches [[WordShinglesExpr.shingles]] (whitespace runs
  * via `Character.isWhitespace`, empties dropped) — equivalent to the
  * oracle's `split('\s+')` on ASCII-whitespace corpora like this one,
  * but a SUPERSET on exotic whitespace: `\s` is ASCII-only in both
  * Java regex and DuckDB's RE2, while `Character.isWhitespace` also
  * splits on e.g. U+2003. Same caveat as [[WordShinglesExpr]].
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStatsExpr.schema
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires a string argument, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    RepetitionStatsExpr.stats(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionStatsExpr.stats($c.toString());")

  override protected def withNewChildInternal(c: Expression): RepetitionStatsExpr =
    copy(child = c)
  override def prettyName: String = "repetition_stats"
}

object RepetitionStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct_words", LongType, nullable = false),
    StructField("n_grams", LongType, nullable = false),
    StructField("top_gram_n", LongType, nullable = false)))

  def stats(text: String): InternalRow = {
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
    val one = Integer.valueOf(1)
    val add: java.util.function.BiFunction[Integer, Integer, Integer] =
      (a, b) => Integer.valueOf(a.intValue + b.intValue)
    val words = new java.util.HashMap[String, Integer](toks.length * 2)
    var w = 0
    while (w < toks.length) {
      words.merge(toks(w), one, add)
      w += 1
    }
    val nGrams = math.max(toks.length - 1, 0)
    var topGram = 0L
    if (nGrams > 0) {
      val grams = new java.util.HashMap[String, Integer](nGrams * 2)
      var g = 0
      while (g < nGrams) {
        val c = grams.merge(toks(g) + " " + toks(g + 1), one, add)
        if (c.intValue > topGram) topGram = c.longValue
        g += 1
      }
    }
    new GenericInternalRow(Array[Any](
      toks.length.toLong, words.size.toLong, nGrams.toLong, topGram))
  }

  def repetitionStats(c: Column): Column =
    ColumnBridge.column(RepetitionStatsExpr(ColumnBridge.expression(c)))
}
