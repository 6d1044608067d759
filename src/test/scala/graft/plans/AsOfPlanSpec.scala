package graft.plans

import graft.SparkTestBase

class AsOfPlanSpec extends SparkTestBase {
  import spark.implicits._

  test("custom as-of exec equals the union-window composition on real events") {
    val got = graft.operators.AsOfJoin.stAsofCustom(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val composed = graft.operators.AsOfJoin.stAsofJoin(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == composed)
    assert(got.nonEmpty)
  }

  test("custom as-of exec handles hand-built edges: equal ts, no prior build, key gaps") {
    val probe = Seq(
      (1L, 10L, 100L), // matches build at exactly ts=100 (inclusive)
      (2L, 10L, 50L),  // before every build row of key 10 → dropped
      (3L, 20L, 500L), // key with no build rows at all → dropped
      (4L, 30L, 300L)  // later than both build rows of key 30 → latest wins
    ).toDF("p_id", "p_key", "p_ts")
    val build = Seq(
      (101L, 10L, 100L),
      (102L, 30L, 100L),
      (103L, 30L, 200L)
    ).toDF("b_id", "b_key", "b_ts")
    val got = AsOf.join(probe, build, "p_key", "b_key", "p_ts", "b_ts")
      .select($"p_id", $"b_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 101L, 4L -> 103L))
  }

  test("custom as-of exec plans two sorted co-partitioned children, no union padding") {
    val p = graft.operators.AsOfJoin.stAsofCustom(spark, sf0001)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("Union"), "custom path must not union-pad:\n" + p)
  }

  test("forward as-of: earliest at-or-after match; consecutive probes share one future row") {
    import spark.implicits._
    val probe = Seq(
      (1L, 10L, 50L),  // before both build rows → matches ts 100
      (2L, 10L, 100L), // exactly at → inclusive match at 100
      (3L, 10L, 150L), // between → matches 200
      (4L, 10L, 250L), // after everything → drops
      (5L, 20L, 0L)    // key with no build rows → drops
    ).toDF("p_id", "p_key", "p_ts")
    val build = Seq(
      (101L, 10L, 100L),
      (102L, 10L, 200L),
      (103L, 30L, 100L)
    ).toDF("b_id", "b_key", "b_ts")
    val got = AsOf.joinForward(probe, build, "p_key", "b_key", "p_ts", "b_ts")
      .select($"p_id", $"b_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // probes 1 AND 2 both match build 101 — the peeked row is shared
    assert(got == Map(1L -> 101L, 2L -> 101L, 3L -> 102L))
  }

  test("forward and backward agree with each other on symmetric data") {
    import spark.implicits._
    // build at every ts; forward from ts and backward from the SAME ts
    // onto an exact-hit build row must both pick it
    val probe = Seq((1L, 1L, 100L), (2L, 1L, 200L)).toDF("p_id", "p_key", "p_ts")
    val build = Seq((11L, 1L, 100L), (12L, 1L, 200L)).toDF("b_id", "b_key", "b_ts")
    val fwd = AsOf.joinForward(probe, build, "p_key", "b_key", "p_ts", "b_ts")
      .select($"p_id", $"b_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bwd = AsOf.join(probe, build, "p_key", "b_key", "p_ts", "b_ts")
      .select($"p_id", $"b_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fwd === bwd && fwd === Map(1L -> 11L, 2L -> 12L))
  }
}
