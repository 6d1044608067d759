package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint:
  * `h = (h * 31 + charCode) mod 1_000_000_007` over the string's chars.
  *
  * A native Catalyst `Expression` with whole-stage codegen (`doGenCode`)
  * rather than a Scala UDF, so fingerprinting stays inside the generated
  * loop with no serialization boundary — the preferred extension path
  * for scalar functions (SURVEY.md §2f).
  *
  * Arithmetic is mod-prime in Long, making the value reproducible by any
  * engine with 64-bit integer math (the DuckDB oracle recomputes it with
  * `list_reduce`). Chars are UTF-16 units, equal to code points for the
  * ASCII corpus.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  private val Mod = RollingHash.Mod

  override def dataType: DataType = LongType
  override def checkInputDataTypes() = child.dataType match {
    case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * 31 + s.charAt(i)) % Mod
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |String $str = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $str.length(); $i++) {
         |  $h = ($h * 31L + $str.charAt($i)) % ${Mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  val Mod: Long = 1000000007L

  /** Column-level entry point (Spark 4 Column wraps a ColumnNode, so the
    * classic Expression bridge goes through [[ColumnBridge]]).
    */
  def rollingHash(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
  }

  /** Reference implementation for tests. */
  def reference(s: String): Long = {
    var h = 0L
    s.foreach(ch => h = (h * 31 + ch) % Mod)
    h
  }
}
