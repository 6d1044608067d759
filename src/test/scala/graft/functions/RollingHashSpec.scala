package graft.functions

import org.apache.spark.sql.functions.col

import graft.SparkTestBase
import graft.functions.RollingHash.rollingHash

class RollingHashSpec extends SparkTestBase {
  import spark.implicits._

  test("codegen path matches the reference implementation") {
    val inputs = Seq("", "a", "hello world", "x" * 10000,
      "agg table spark hash sort")
    val got = inputs.toDF("s")
      .select(col("s"), rollingHash(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach { s =>
      assert(got(s) == RollingHash.reference(s), s"mismatch for '$s'")
    }
  }

  test("interpreted (eval) path agrees with codegen") {
    val e = RollingHash(
      org.apache.spark.sql.catalyst.expressions.Literal("spark graft"))
    assert(e.eval(null) == RollingHash.reference("spark graft"))
  }

  test("null input stays null") {
    val got = Seq(Option("x"), None).toDF("s")
      .select(rollingHash(col("s"))).collect()
    assert(!got(0).isNullAt(0) && got(1).isNullAt(0))
  }
}
