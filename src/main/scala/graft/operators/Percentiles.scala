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

  /** Distributed-selection form of [[exact]] — same answers (bitwise:
    * the same lo/hi rows are selected and the same interpolation
    * arithmetic runs), but no per-group sort.
    *
    * [[exact]]'s rank window shuffles every row into one partition PER
    * GROUP and sorts it there: with 3 groups, 3 tasks do all the work no
    * matter how many executors exist — the classic low-cardinality
    * window trap, fatal at 100 TB. This form finds the two bracketing
    * rows per percentile by histogram selection instead:
    *
    *   1. per-group (n, min, max) — one tiny aggregate;
    *   2. per-group equi-width bin counts (`numBins` bins) — map-side
    *      partial aggregation, shuffle of ≤ groups×bins rows;
    *   3. locate, per requested rank k ∈ {floor,ceil((n-1)·p)}, the bin
    *      with cumBelow ≤ k < cumBelow+cnt (driver-free, a tiny join);
    *   4. rank ONLY the rows of the hit bins (≈ n/numBins rows per
    *      target) and pick offset k−cumBelow.
    *
    * Every pass over the data is a pruned column scan with map-side
    * work; nothing big is ever sorted or shuffled. Rows per hit bin are
    * ~n/numBins in the worst non-degenerate case; duplicate-heavy
    * columns collapse bins but equal values make the pick order-free.
    */
  def exactSelect(df: DataFrame, group: String, value: String,
      ps: Seq[(String, Double)], numBins: Int = 4096): DataFrame = {
    require(ps.nonEmpty)
    val base = df.filter(col(value).isNotNull).select(col(group), col(value))
    val stats = base.groupBy(col(group)).agg(
      count(lit(1)).as("__n"),
      min(col(value)).as("__mn"),
      max(col(value)).as("__mx"))
    def pos(p: Double): Column = (col("__n") - 1L).cast("double") * p

    // requested ranks per group: (name, which, k) — 2·|ps| rows/group
    val targets = stats.select(
      col(group), col("__n"),
      explode(array(ps.flatMap { case (name, p) =>
        Seq(
          struct(lit(name).as("nm"), lit("lo").as("wh"),
            floor(pos(p)).cast("long").as("k")),
          struct(lit(name).as("nm"), lit("hi").as("wh"),
            ceil(pos(p)).cast("long").as("k")))
      }: _*)).as("__t"))
      .select(col(group), col("__t.nm").as("__nm"),
        col("__t.wh").as("__wh"), col("__t.k").as("__k"))

    // equi-width bin per row (degenerate all-equal group → bin 0)
    val width = (col("__mx") - col("__mn")) / numBins
    val rawBin = floor((col(value) - col("__mn")) / width).cast("long")
    val binCol = when(col("__mx") === col("__mn"), 0L)
      .otherwise(least(rawBin, lit(numBins - 1L))).as("__bin")
    // all group-key joins are NULL-SAFE (<=>): a null group is a real
    // group to groupBy/Window, and an equi-join would silently drop it
    val statsR = stats.withColumnRenamed(group, "__g")
    val binned = base.join(broadcast(statsR), col(group) <=> col("__g"))
      .select(col(group), col(value), binCol)

    // per-bin counts + exclusive running total (≤ numBins rows/group)
    val wBins = Window.partitionBy(col(group)).orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = binned.groupBy(col(group), col("__bin"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__below", coalesce(sum(col("__cnt")).over(wBins), lit(0L)))

    // the bin holding each target rank, and the rank's offset inside it
    val cumR = cum.withColumnRenamed(group, "__g")
    val hit = targets.join(cumR, col(group) <=> col("__g"))
      .filter(col("__k") >= col("__below") &&
        col("__k") < col("__below") + col("__cnt"))
      .select(col(group), col("__nm"), col("__wh"), col("__bin"),
        (col("__k") - col("__below")).as("__off"))

    // rank only the hit bins' rows; one tiny sorted partition per target
    val wPick = Window.partitionBy(col(group), col("__nm"), col("__wh"))
      .orderBy(col(value))
    val hitR = hit.withColumnRenamed(group, "__g")
      .withColumnRenamed("__bin", "__hbin")
    val picked = binned.join(broadcast(hitR),
      col(group) <=> col("__g") && col("__bin") === col("__hbin"))
      .withColumn("__rn", row_number().over(wPick).cast("long") - 1L)
      .filter(col("__rn") === col("__off"))

    // reassemble (lo, hi) per percentile and interpolate — the exact
    // arithmetic of [[exact]]: lo + (hi - lo) * (pos - floor(pos))
    val aggs = ps.flatMap { case (name, _) =>
      Seq(
        max(when(col("__nm") === name && col("__wh") === "lo", col(value)))
          .as(s"__lo_$name"),
        max(when(col("__nm") === name && col("__wh") === "hi", col(value)))
          .as(s"__hi_$name"))
    }
    val out = ps.map { case (name, p) =>
      (col(s"__lo_$name") +
        (col(s"__hi_$name") - col(s"__lo_$name")) *
          (pos(p) - floor(pos(p))))
        .as(name)
    }
    picked.groupBy(col(group))
      .agg(aggs.head, aggs.tail: _*)
      .join(broadcast(statsR.select(col("__g"), col("__n"))),
        col(group) <=> col("__g"))
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
