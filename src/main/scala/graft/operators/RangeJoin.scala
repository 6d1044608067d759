package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join: `left` rows whose point column falls inside a
  * `right` row's [start, end] interval.
  *
  * A naive non-equi join plans as BroadcastNestedLoopJoin (every left
  * row against every interval) — quadratic, and the classic 100 TB
  * killer for point-in-interval workloads (events into sessions, reads
  * into genomic ranges, ticks into trading halts). Binning turns it
  * into an equi-join: both sides key on `value DIV binWidth`; an
  * interval explodes into one row per bin it overlaps, a point lands in
  * exactly one bin, so every qualifying (point, interval) pair meets in
  * precisely one bin — an ordinary shuffled/broadcast hash join with no
  * duplicate results, followed by the exact range filter.
  *
  * Pick `binWidth` near the typical interval length: intervals explode
  * into `(end-start)/binWidth + 1` rows (cost of too-small bins), while
  * too-large bins put many non-matching points in each bin (filtered
  * after the join). The reference has no joins at all (SURVEY.md §2e);
  * this operator is part of the engine's extension surface.
  */
object RangeJoin {

  private val BinCol = "__graft_range_bin"

  /** Inner point-in-interval join. `leftPoint` must be a LONG column on
    * `left`; `rightStart`/`rightEnd` LONG columns on `right` with
    * start <= end and non-negative values. Returns all columns of both
    * inputs for qualifying pairs.
    */
  def binned(left: DataFrame, leftPoint: String,
      right: DataFrame, rightStart: String, rightEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // integer DIV, not fractional `/` (which would yield doubles)
    val l = left.withColumn(BinCol, expr(s"$leftPoint DIV $binWidth"))
    val r = right.withColumn(BinCol,
      explode(sequence(expr(s"$rightStart DIV $binWidth"),
        expr(s"$rightEnd DIV $binWidth"))))
    l.join(r, Seq(BinCol))
      .filter(col(leftPoint).between(col(rightStart), col(rightEnd)))
      .drop(BinCol)
  }
}
