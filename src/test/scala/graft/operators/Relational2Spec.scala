package graft.operators

import graft.SparkTestBase

class Relational2Spec extends SparkTestBase {

  test("sketch aggregates stay within their error bounds vs exact answers") {
    // q27Approx computes the |approx − exact| ≤ 5% check in-plan and
    // emits it as boolean columns (so the DuckDB oracle can gate it);
    // the spec asserts every group is in bounds.
    val rows = Relational2.q27Approx(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"HLL out of bounds for group ${r.get(0)}")
      assert(r.getBoolean(4), s"approx percentile out of bounds for group ${r.get(0)}")
    }
  }

  test("distributed-selection percentiles are bitwise-equal to the rank-window form") {
    val ps = Seq("p50" -> 0.5, "p25" -> 0.25, "p75" -> 0.75, "p99" -> 0.99)
    val li = graft.sources.Tables.lineitem(spark, sf001)
    val win = Percentiles.exact(li, "l_returnflag", "l_extendedprice", ps)
      .collect().map(r => r.getString(0) ->
        (1 to ps.length).map(i => java.lang.Double.doubleToLongBits(r.getDouble(i)))).toMap
    val sel = Percentiles.exactSelect(li, "l_returnflag", "l_extendedprice", ps)
      .collect().map(r => r.getString(0) ->
        (1 to ps.length).map(i => java.lang.Double.doubleToLongBits(r.getDouble(i)))).toMap
    assert(sel == win)
    assert(sel.nonEmpty)
  }

  test("distributed-selection percentiles handle single-row and constant groups") {
    import spark.implicits._
    val df = Seq(("a", 5.0), ("b", 2.0), ("b", 2.0), ("b", 2.0),
      ("c", 1.0), ("c", 4.0)).toDF("g", "v")
    val got = Percentiles.exactSelect(df, "g", "v", Seq("p50" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 5.0, "b" -> 2.0, "c" -> 2.5))
  }

  test("as-of join composition agrees with a brute-force per-row scan") {
    val got = AsOfJoin.stAsofJoin(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    // brute force: for every purchase, scan all views of the user
    val ev = graft.sources.Tables.events(spark, sf0001)
      .selectExpr("event_id", "user_id", "event_type", "ts_ns DIV 1000 AS ts_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val views = ev.filter(_._3 == "view")
    val purchases = ev.filter(_._3 == "purchase")
    val expected = purchases.flatMap { case (pid, u, _, pts) =>
      val prior = views.filter(v => v._2 == u && v._4 <= pts)
      if (prior.isEmpty) None
      else {
        val bestTs = prior.map(_._4).max
        val bestId = prior.filter(_._4 == bestTs).map(_._1).max
        Some(pid -> (bestTs, bestId))
      }
    }.toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
