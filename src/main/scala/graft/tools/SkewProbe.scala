package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** Hot-key skew probe — the SCALING.md ladder row for AQE's skew-join
  * handler (`GraftSession` turns it on; `SkewJoinSpec` pins the split
  * on a fixture). This drives the REAL shape at corpus scale: a fact
  * table with 30% of its rows remapped onto ONE user_id, joined to a
  * per-user dimension, grouped — the "one whale tenant" distribution
  * every 100 TB event store has. Runs the identical plan with the skew
  * handler ON and OFF and prints one timing line per arm plus whether
  * the executed plan actually split the hot partition, so the recorded
  * ladder number is the handler's doing, not scheduling luck.
  *
  *   SBT_OPTS=-Xmx48g sbt "runMain graft.tools.SkewProbe /tmp/graft100x 3"
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft100x")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.getOrCreate("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    // no broadcast: the dimension side grows with the user base, and
    // the point is the shuffle join's hot partition
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // Detection thresholds scaled to the probe corpus: the defaults
    // (256 MB absolute floor) target multi-TB shuffles on real
    // clusters — at this 10M-row probe the hot partition is ~90 MB, so
    // with defaults the handler correctly judges it not worth
    // splitting. Lowering the absolute floor (the RELATIVE factor
    // stays at a production-like 2×median) exercises the same
    // detect-and-split path a 100 TB hot key takes. Applied to BOTH
    // arms; only the enabled flag differs between them.
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")

    def fact = Tables.events(spark, dir).select(
      when(col("event_id") % 10 < 3, lit(0L))
        .otherwise(col("user_id")).as("user_id"),
      col("value"), col("event_type"))
    // MATERIALIZED dimension (as any production star join's dim table
    // is). This matters beyond realism: AQE's OptimizeSkewedJoin
    // pattern-matches SMJ(Sort(Shuffle), Sort(Shuffle)) — a distinct
    // aggregation PIPELINED between the dim shuffle and the join blocks
    // the rule entirely (observed here: no split at any threshold). A
    // derived dimension must be materialized (or re-shuffled) for the
    // hot fact partition to be splittable.
    val dim = Tables.events(spark, dir).select(col("user_id")).distinct()
      .select(col("user_id"), (col("user_id") % 97).as("segment"))
      .localCheckpoint()
    def probe() = fact.join(dim, "user_id")
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))

    for (arm <- Seq("on", "off")) {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
        (arm == "on").toString)
      val times = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        val q = probe()
        // collect, not a noop write: the write would spawn its OWN
        // QueryExecution, leaving q's executedPlan un-adapted
        // (isFinalPlan=false) — the skew_split flag would read the
        // pre-AQE plan. The result is ≤97 segment rows.
        q.collect()
        val sec = (System.nanoTime() - t0) / 1e9
        if (sys.env.contains("GRAFT_SKEW_DEBUG"))
          System.err.println(q.queryExecution.executedPlan.toString)
        (sec, graft.operators.SkewJoin
          .planWasSkewSplit(q.queryExecution.executedPlan))
      }
      println(f"[skewprobe] handler=$arm%-3s reps=${times.map(t => f"${t._1}%.2f").mkString(",")} skew_split=${times.map(_._2).mkString(",")}")
    }
    spark.stop()
  }
}
