package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.SparkTestBase

/** The limb-sum aggregation must be bitwise-equal to the direct
  * decimal-sum formulation it replaced, across sign mixes, magnitude
  * mixes, nulls, and empty groups.
  */
class DecimalLimbsSpec extends SparkTestBase {
  import spark.implicits._

  private val rng = new scala.util.Random(4242)

  test("limb dsum/davg equals sum(decimal).cast(double) bitwise on random data") {
    (1 to 4).foreach { round =>
      val rows = (1 to 2000).map { i =>
        val g = s"g${i % 7}"
        val v: java.lang.Double = rng.nextInt(5) match {
          case 0 => rng.nextDouble() * 1e6 - 5e5     // large
          case 1 => rng.nextDouble() * 2 - 1         // small
          case 2 => -rng.nextDouble() * 1e4          // negative
          case 3 => math.round(rng.nextDouble() * 1e8) / 100.0 // 2-decimal
          case _ => if (rng.nextBoolean()) null else rng.nextDouble()
        }
        (g, v)
      }
      val df = rows.toDF("g", "v")
      def bits(c: org.apache.spark.sql.DataFrame) =
        c.collect().map(r => r.getString(0) ->
          (java.lang.Double.doubleToLongBits(r.getDouble(1)),
            java.lang.Double.doubleToLongBits(r.getDouble(2)))).toMap
      val limb = bits(df.groupBy($"g").agg(
        dsum($"v").as("s"), davg($"v").as("a")).orderBy($"g"))
      val direct = bits(df.groupBy($"g").agg(
        sum($"v".cast(DecimalType(18, 6))).cast(DoubleType).as("s"),
        (sum($"v".cast(DecimalType(18, 6))).cast(DoubleType) /
          count(lit(1))).as("a")).orderBy($"g"))
      assert(limb == direct, s"round $round")
    }
  }

  test("limb dsumProd equals sum(dec*dec).cast(double) bitwise, signs included") {
    val rows = (1 to 3000).map { i =>
      (s"g${i % 5}",
        rng.nextDouble() * 2e3 - 1e3,
        rng.nextDouble() * 2 - 1)
    }
    val df = rows.toDF("g", "a", "b")
    def bits(c: org.apache.spark.sql.DataFrame) =
      c.collect().map(r => r.getString(0) ->
        java.lang.Double.doubleToLongBits(r.getDouble(1))).toMap
    val limb = bits(df.groupBy($"g").agg(dsumProd($"a", $"b").as("s")))
    val direct = bits(df.groupBy($"g").agg(
      sum($"a".cast(DecimalType(18, 6)) * $"b".cast(DecimalType(18, 6)))
        .cast(DoubleType).as("s")))
    assert(limb == direct)
  }

  test("all-null and empty groups yield null, like the decimal sum") {
    val df = Seq(("a", null: java.lang.Double), ("a", null: java.lang.Double),
      ("b", 1.5: java.lang.Double)).toDF("g", "v")
    val got = df.groupBy($"g").agg(dsum($"v").as("s")).orderBy($"g")
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("a").isEmpty)
    assert(got("b").contains(1.5))
  }
}
