package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("binned range join equals the naive non-equi join") {
    val points = Seq(0L, 5L, 10L, 99L, 100L, 101L, 250L, 999L, 1000L)
      .toDF("p")
    val intervals = Seq(
      (1L, 0L, 10L),     // narrow, within one bin
      (2L, 95L, 105L),   // straddles a bin boundary
      (3L, 0L, 999L),    // spans many bins
      (4L, 400L, 450L),  // matches nothing
      (5L, 250L, 250L),  // degenerate single-point interval
    ).toDF("iv_id", "lo", "hi")

    val binned = RangeJoin.binned(points, "p", intervals, "lo", "hi", 100L)
      .select(col("iv_id"), col("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val naive = points.crossJoin(intervals)
      .filter(col("p").between(col("lo"), col("hi")))
      .select(col("iv_id"), col("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(binned == naive)
    assert(naive.nonEmpty)
    // no duplicate pairs: a point meets an interval in exactly one bin
    val rows = RangeJoin.binned(points, "p", intervals, "lo", "hi", 100L)
      .select(col("iv_id"), col("p")).collect()
    assert(rows.length == rows.toSet.size)
  }

  test("binned range join plans as an equi join, not a nested loop") {
    val points = Seq(1L, 2L).toDF("p")
    val intervals = Seq((1L, 0L, 10L)).toDF("iv_id", "lo", "hi")
    val plan = RangeJoin.binned(points, "p", intervals, "lo", "hi", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
