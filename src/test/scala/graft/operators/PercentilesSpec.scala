package graft.operators

import graft.SparkTestBase

/** Randomized (fixed-seed) equivalence: the distributed-selection
  * percentile must be BITWISE-equal to the rank-window form on
  * adversarial group shapes — single-row groups, all-equal groups,
  * duplicate-heavy values, negatives, extreme p values.
  */
class PercentilesSpec extends SparkTestBase {
  import spark.implicits._

  private val rng = new scala.util.Random(12345)

  private def randomDataset(): Seq[(String, Double)] = {
    val nGroups = 1 + rng.nextInt(5)
    (0 until nGroups).flatMap { g =>
      val size = 1 + rng.nextInt(300)
      val shape = rng.nextInt(4)
      (0 until size).map { _ =>
        val v = shape match {
          case 0 => rng.nextDouble() * 1000 - 500          // continuous
          case 1 => (rng.nextInt(10) * 10).toDouble        // few distinct
          case 2 => 42.0                                   // constant group
          case _ => math.round(rng.nextGaussian() * 100) / 4.0 // dup-heavy
        }
        (s"g$g", v)
      }
    }
  }

  test("selection percentiles match the window form bitwise on random group shapes") {
    val ps = Seq("p0" -> 0.0, "p01" -> 0.01, "p50" -> 0.5,
      "p75" -> 0.75, "p99" -> 0.99, "p100" -> 1.0)
    (1 to 6).foreach { round =>
      val df = randomDataset().toDF("g", "v")
      def collect(out: org.apache.spark.sql.DataFrame) =
        out.collect().map(r => r.getString(0) ->
          (1 to ps.length).map(i =>
            java.lang.Double.doubleToLongBits(r.getDouble(i)))).toMap
      val win = collect(Percentiles.exact(df, "g", "v", ps))
      val sel = collect(Percentiles.exactSelect(df, "g", "v", ps))
      assert(sel == win, s"round $round")
    }
  }

  test("a null group key is a real group, identical to the window form") {
    val df = Seq((null.asInstanceOf[String], 1.0), (null.asInstanceOf[String], 3.0),
      (null.asInstanceOf[String], 8.0), ("a", 5.0), ("a", 7.0))
      .toDF("g", "v")
    val ps = Seq("p50" -> 0.5)
    def rows(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    val win = rows(Percentiles.exact(df, "g", "v", ps))
    val sel = rows(Percentiles.exactSelect(df, "g", "v", ps))
    assert(sel == win)
    assert(sel(None) == 3.0 && sel(Some("a")) == 6.0)
  }

  test("selection percentiles honor a tiny bin count (dense bins exercise the offset path)") {
    val df = randomDataset().toDF("g", "v")
    val ps = Seq("p50" -> 0.5, "p25" -> 0.25)
    def bits(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => r.getString(0) ->
        (1 to ps.length).map(i =>
          java.lang.Double.doubleToLongBits(r.getDouble(i)))).toMap
    assert(bits(Percentiles.exactSelect(df, "g", "v", ps, numBins = 2)) ==
      bits(Percentiles.exact(df, "g", "v", ps)))
  }
}
