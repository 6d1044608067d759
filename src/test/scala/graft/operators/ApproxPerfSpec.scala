package graft.operators

import graft.SparkTestBase

class ApproxPerfSpec extends SparkTestBase {
  test("time q27 components at sf0.1") {
    val d = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMING $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, d)
    time("q1_agg")(Relational.q1Agg(spark, d).write.format("noop").mode("overwrite").save())
    time("exact countDistinct")(
      li.groupBy(col("l_returnflag")).agg(countDistinct(col("l_orderkey")))
        .write.format("noop").mode("overwrite").save())
    time("hll rsd=0.01")(
      li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey"), rsd = 0.01))
        .write.format("noop").mode("overwrite").save())
    time("exact percentile")(
      li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, 0.5)"))
        .write.format("noop").mode("overwrite").save())
    time("approx_percentile")(
      li.groupBy(col("l_returnflag"))
        .agg(expr("approx_percentile(l_extendedprice, 0.5, 1000)"))
        .write.format("noop").mode("overwrite").save())
    // perf canary: countDistinct combined with sketch buffers in one
    // aggregate regressed this to 117 s; split aggregates stay fast.
    // Best of two runs: suites share the JVM and run concurrently, so a
    // single cold run can flake past the bound on scheduler noise alone
    // (measured 21 s under full-suite load vs 6.5 s in isolation) —
    // the 117 s-class regression this guards fails both runs regardless
    val secs = (1 to 2).map { i =>
      val t0 = System.nanoTime()
      time(s"full q27 (run $i)")(Relational2.q27Approx(spark, d)
        .write.format("noop").mode("overwrite").save())
      (System.nanoTime() - t0) / 1e9
    }
    assert(secs.min < 20,
      f"q27 took ${secs.min}%.1f s at sf0.1 — perf regression")
  }
}
