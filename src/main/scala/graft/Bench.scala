package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the target scale
  * factor and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Queries are materialized through the `noop` sink — unlike `count()`,
  * which lets Catalyst prune every non-key column out of the scan, noop
  * forces full evaluation of the real output while writing nothing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup: run EVERY query once at the smallest SF so
    // whole-stage-codegen compilation and JIT of each query's generated
    // classes don't land on its one measured run (measured: 2.0s first
    // run vs 0.48s warm for the same query at sf0.1 — the gap is class
    // generation, not data, which is ~17 MB and page-cached anyway).
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    // optional args: query names to bench (repeats allowed), e.g.
    //   runMain graft.Bench dd_apply dd_apply dd_simhash
    val selected =
      if (args.nonEmpty) args.toSeq.map(n => n -> SparkEntry.queries(n))
      else SparkEntry.queries.toSeq.sortBy(_._1)
    val results = selected.map { case (name, fn) =>
      // drain the previous query's garbage so its GC tail doesn't land
      // on this measurement (measured: a heap-churning neighbor inflated
      // an unrelated 0.5s query to 12s); the gc runs OUTSIDE the timer
      System.gc()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // Double.toString is locale-independent; the f-interpolator is NOT
    // (comma decimals under e.g. a German default locale would corrupt
    // the JSON line)
    def num(v: Double): String = (math.round(v * 1000) / 1000.0).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
