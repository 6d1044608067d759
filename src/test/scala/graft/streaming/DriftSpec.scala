package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** Semantics and streaming execution of the corpus-drift monitor. */
class DriftSpec extends SparkTestBase {

  private val t0 = DocStreams.DriftT0

  test("a window that replays the baseline distribution drifts exactly 0") {
    val base = spark.createDataFrame(Seq(
      (1L, "a a b c"), (2L, "b c d d"))).toDF("doc_id", "text")
    val win = base.select(expr(s"timestamp_seconds($t0)").as("ts"),
      col("text"))
    val out = DocStreams.driftMonitor(win, base).collect()
    assert(out.length === 1)
    assert(out.head.getDouble(3) === 0.0)
    assert(out.head.getLong(2) === 0L, "no new terms")
    assert(out.head.getLong(1) === 8L)
  }

  test("planted new terms raise drift and are counted") {
    val base = spark.createDataFrame(Seq(
      (1L, "a a b c"), (2L, "b c d d"))).toDF("doc_id", "text")
    // window: half familiar, half a NEW term (z not in baseline)
    val win = spark.createDataFrame(Seq(
      (9L, "a b z z"))).toDF("doc_id", "text")
      .select(expr(s"timestamp_seconds($t0)").as("ts"), col("text"))
    val out = DocStreams.driftMonitor(win, base).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(2) === 1L, "one new distinct term")
    // exact TV distance: window (a:1 b:1 z:2)/4 vs baseline
    // (a:2 b:2 c:2 d:2)/8 -> sum|p-q| = |.25-.25|+|.25-.25|+|.5-0|
    //   +|0-.25|+|0-.25| = 1.0; TV = 0.5
    assert(r.getDouble(3) === 0.5)
  }

  test("gated twin: windows partition the corpus and drift is in [0, 1)") {
    val out = DocStreams.stDrift(spark, sf001).collect()
    assert(out.length === DocStreams.DriftWindows)
    val nTotal = out.map(_.getLong(1)).sum
    val corpus = graft.sources.Tables.documents(spark, sf001)
      .select(explode(graft.functions.tokens(col("text")))).count()
    assert(nTotal === corpus, "window token counts partition the corpus")
    out.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0)
      assert(r.getLong(2) === 0L, "self-baseline has no new terms")
      // a ~quarter slice of a well-mixed corpus stays near the corpus
      // distribution; the bound is loose but pins sanity
      assert(r.getDouble(3) < 0.5)
    }
  }

  test("streaming drift monitor emits the same windows as the batch form") {
    val base = graft.sources.Tables.documents(spark, sf0001)
    def frame = base.select(
      expr(s"timestamp_seconds($t0 + (doc_id % 2) * ${DocStreams.DriftWindowSec})")
        .as("ts"),
      col("text"))
    val dir = Files.createTempDirectory("graft-drift-")
    def writeBatch(name: String, pred: org.apache.spark.sql.Column): Unit = {
      val staging = Files.createTempDirectory("graft-drift-stage-")
      base.filter(pred).select(
        expr(s"timestamp_seconds($t0 + (doc_id % 2) * ${DocStreams.DriftWindowSec})")
          .as("ts"), col("text"))
        .coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = Files.list(staging).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      Files.copy(part, dir.resolve(name))
    }
    writeBatch("001.parquet", col("doc_id") < 200)
    writeBatch("002.parquet", col("doc_id") >= 200 && col("doc_id") < 400)
    // sentinel far-future doc closes the watermark for append mode
    val staging = Files.createTempDirectory("graft-drift-stage-")
    base.filter(col("doc_id") === 0)
      .select(expr(s"timestamp_seconds($t0 + 999999)").as("ts"), col("text"))
      .coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = Files.list(staging).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.toString.endsWith(".parquet")).get
    Files.copy(part, dir.resolve("003.parquet"))
    val stream = spark.readStream
      .schema(frame.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val q = DocStreams.driftMonitor(stream, base)
      .writeStream.outputMode("append")
      .format("memory").queryName("drift_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.table("drift_out").collect()
      .filter(_.getLong(0) < t0 + 500000)
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val batch = DocStreams.driftMonitor(
      base.filter(col("doc_id") < 400).select(
        expr(s"timestamp_seconds($t0 + (doc_id % 2) * ${DocStreams.DriftWindowSec})")
          .as("ts"), col("text")),
      base).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(streamed == batch && streamed.size === 2)
  }

  test("drift state survives a restart and drops sub-watermark docs") {
    // st_attr's restart pattern on the drift monitor: a window open at
    // shutdown must finish from checkpointed state, and a doc arriving
    // below the advanced watermark must be dropped, never re-opening
    // its finalized window
    val base = graft.sources.Tables.documents(spark, sf0001)
    val dir = Files.createTempDirectory("graft-drift-restart-")
    val cp = Files.createTempDirectory("graft-drift-restart-cp-")
    val out = Files.createTempDirectory("graft-drift-restart-out-")
    def stamped(pred: org.apache.spark.sql.Column, ts: String) =
      base.filter(pred).select(expr(ts).as("ts"), col("text"))
    def writeBatch(name: String, frame: org.apache.spark.sql.DataFrame): Unit = {
      val staging = Files.createTempDirectory("graft-drift-restart-stage-")
      frame.coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = Files.list(staging).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      Files.copy(part, dir.resolve(name))
    }
    val schema = stamped(col("doc_id") < 0, s"timestamp_seconds($t0)").schema
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.toString)
      val q = DocStreams.driftMonitor(stream, base)
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp.toString)
        .format("parquet").option("path", out.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
    }
    // run 1: half the window's docs — the window stays open, its
    // per-term counts exist only in the checkpoint at shutdown
    writeBatch("001.parquet",
      stamped(col("doc_id") < 100, s"timestamp_seconds($t0)"))
    run()
    // run 2 (restart): the window's other half + a far-future sentinel
    // that closes it — the emitted row must equal the batch form over
    // ALL the window's docs, which requires the pre-restart state
    writeBatch("002.parquet",
      stamped(col("doc_id") >= 100 && col("doc_id") < 200,
        s"timestamp_seconds($t0)"))
    writeBatch("003.parquet",
      stamped(col("doc_id") === 0, s"timestamp_seconds($t0 + 999999)"))
    run()
    val got = spark.read.parquet(out.toString).collect()
      .filter(_.getLong(0) < t0 + 500000)
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val batch = DocStreams.driftMonitor(
      stamped(col("doc_id") < 200, s"timestamp_seconds($t0)"), base)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == batch && got.size === 1,
      "restart lost the open window's term state")
    // run 3: a doc stamped back at t0 — far below the advanced
    // watermark — must be dropped; the finalized window cannot re-emit
    writeBatch("004.parquet",
      stamped(col("doc_id") === 5, s"timestamp_seconds($t0)"))
    run()
    val after = spark.read.parquet(out.toString).collect()
      .filter(_.getLong(0) < t0 + 500000)
    assert(after.length == 1, "sub-watermark doc re-opened a closed window")
  }
}
