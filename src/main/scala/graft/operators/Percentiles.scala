package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles via rank windows.
  *
  * Spark's `percentile` aggregate is a TypedImperativeAggregate that
  * collects EVERY group value into an in-memory buffer and merges those
  * buffers across partials — O(group size) heap per buffer, the
  * allocation pattern behind multi-second GC swings at sf0.1 and an OOM
  * at 100 TB group sizes. This formulation gets the same answer from
  * one partitioned sort: row_number + count per group, keep only the
  * two rows bracketing each requested percentile position, and
  * interpolate with the same `lower + (higher - lower) * fraction`
  * arithmetic Spark's aggregate uses — same answers, O(1) per-task
  * state. Oracle-checked via [[exactSql]], which mirrors the float ops.
  */
object Percentiles {

  /** One row per group: the group column plus one interpolated
    * percentile column per `(name, p)` pair.
    */
  def exact(df: DataFrame, group: String, value: String,
      ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty)
    val wOrd = Window.partitionBy(col(group)).orderBy(col(value))
    val wAll = Window.partitionBy(col(group))
    val ranked = df
      .filter(col(value).isNotNull)
      .select(col(group), col(value))
      .withColumn("__rn", row_number().over(wOrd).cast("long") - 1L)
      .withColumn("__n", count(lit(1)).over(wAll))
    def pos(p: Double): Column = (col("__n") - 1L).cast("double") * p
    // rows not bracketing any requested percentile drop before the agg
    val keep = ps.map { case (_, p) =>
      col("__rn") === floor(pos(p)).cast("long") ||
        col("__rn") === ceil(pos(p)).cast("long")
    }.reduce(_ || _)
    val aggs = ps.flatMap { case (name, p) =>
      Seq(
        max(when(col("__rn") === floor(pos(p)).cast("long"), col(value)))
          .as(s"__lo_$name"),
        max(when(col("__rn") === ceil(pos(p)).cast("long"), col(value)))
          .as(s"__hi_$name"),
        max(pos(p) - floor(pos(p))).as(s"__frac_$name"))
    }
    val out = ps.map { case (name, _) =>
      (col(s"__lo_$name") +
        (col(s"__hi_$name") - col(s"__lo_$name")) * col(s"__frac_$name"))
        .as(name)
    }
    ranked.filter(keep)
      .groupBy(col(group))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(group) +: out: _*)
  }

  /** DuckDB oracle SQL for [[exact]], replicating its IEEE arithmetic
    * OP-FOR-OP: `lo + (hi - lo) * frac` with `pos = (n-1)::double * p`.
    * DuckDB's own `quantile_cont` interpolates in a different operation
    * order, which diverges from this in the last ulp on some groups
    * (observed: p25 of lineitem group 'N' at sf0.01) — and the driver's
    * comparator is exact, so the oracle must do the SAME float ops, not
    * merely the same math. 0.25/0.5/0.75-style fractions are exactly
    * representable, so the `p` literal round-trips losslessly.
    */
  def exactSql(table: String, group: String, value: String,
      ps: Seq[(String, Double)]): String = {
    require(ps.nonEmpty)
    def pos(p: Double) = s"CAST(n - 1 AS DOUBLE) * $p"
    val outs = ps.map { case (name, p) =>
      val lo = s"MAX(CASE WHEN rn = CAST(FLOOR(${pos(p)}) AS BIGINT) THEN v END)"
      val hi = s"MAX(CASE WHEN rn = CAST(CEIL(${pos(p)}) AS BIGINT) THEN v END)"
      val frac = s"MAX(${pos(p)} - FLOOR(${pos(p)}))"
      s"($lo + ($hi - $lo) * $frac) AS $name"
    }
    s"""SELECT $group,
       |  ${outs.mkString(",\n  ")}
       |FROM (SELECT $group, $value AS v,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY $group ORDER BY $value) AS BIGINT) - 1 AS rn,
       |        CAST(COUNT(*) OVER (PARTITION BY $group) AS BIGINT) AS n
       |      FROM $table WHERE $value IS NOT NULL) __ranked
       |GROUP BY $group""".stripMargin
  }
}
