package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.streaming.EventStreams._

class EventStreamsSpec extends SparkTestBase {
  import spark.implicits._

  /** Copy the events parquet into a fresh dir (file-source streams want a
    * directory they can watch; testdata is read-only).
    */
  private def stagedDir(): String = {
    val dir = Files.createTempDirectory("graft-stream-")
    Files.copy(Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  /** Drop one single-part parquet file of synthetic events into `dir` —
    * a micro-batch for a `maxFilesPerTrigger=1` file stream. Rows are
    * `(event_id, user_id, ts_ns)`. Sleeps so successive batches get
    * distinct mtimes → deterministic trigger order.
    */
  private def writeBatch(dir: java.nio.file.Path, name: String,
      rows: Seq[(Long, Long, Long)]): Unit =
    writeTypedBatch(dir, name, rows.map(r => (r._1, r._2, r._3, "click")))

  /** Like [[writeBatch]] but with a per-row event_type (for the
    * purchase/view join tests).
    */
  private def writeTypedBatch(dir: java.nio.file.Path, name: String,
      rows: Seq[(Long, Long, Long, String)]): Unit = {
    val staging = Files.createTempDirectory("graft-sess-stage-")
    rows.toDF("event_id", "user_id", "ts_ns", "event_type")
      .selectExpr("event_id", "ts_ns AS ts", "user_id",
        "event_type", "1.0 AS value", "'' AS props")
      .coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = Files.list(staging).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.toString.endsWith(".parquet")).get
    Files.copy(part, dir.resolve(name))
    Thread.sleep(1100)
  }

  test("streaming windowed counts equal the batch answer (readStream → memory sink)") {
    val q = windowedCounts(readEventStream(spark, stagedDir()))
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("win_out")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    val batch = stWindowAgg(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stateful flatMapGroupsWithState sessionizer equals the declarative batch sessionizer") {
    val events = graft.sources.Tables.events(spark, sf0001)
      .selectExpr("event_id", "ts_ns", "user_id", "event_type", "value", "props")
      .as[Event]
    // declarative output is in micros (DuckDB timestamp precision);
    // stateful keeps full nanos — truncate for comparison
    val stateful = sessionize(events).collect()
      .map(s => (s.user_id, s.start_ns / 1000, s.end_ns / 1000, s.n_events)).toSet
    val declarative = stSessionize(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(2))).toSet
    assert(stateful == declarative)
    assert(stateful.nonEmpty)
  }

  test("streaming dedup removes duplicate events across micro-batches") {
    // duplicate the corpus into two input files: every event arrives twice
    val dir = Files.createTempDirectory("graft-dedup-")
    Files.copy(Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("a.parquet"))
    Files.copy(Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("b.parquet"))
    val q = streamingDedup(readEventStream(spark, dir.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val total = graft.sources.Tables.events(spark, sf0001).count()
    assert(spark.table("dedup_out").count() == total)
    assert(spark.table("dedup_out").select("event_id").distinct().count() == total)
  }

  test("st_dedup batch twin collapses redelivered events to exactly-once counts") {
    import org.apache.spark.sql.functions.col
    val perType = graft.sources.Tables.events(spark, sf0001)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = stDedup(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the union redelivers ~1/7 of events; dedup must restore the
    // original per-type counts exactly
    assert(got == perType)
    val redelivered = graft.sources.Tables.events(spark, sf0001)
      .filter(col("event_id") % 7 === 0).count()
    assert(redelivered > 0, "gate corpus must exercise redelivery")
  }

  test("dedup state survives a checkpointed restart") {
    val dir = Files.createTempDirectory("graft-restart-")
    val cp = Files.createTempDirectory("graft-restart-cp-")
    val out = Files.createTempDirectory("graft-restart-out-")
    val t0 = 1704067200L * 1000000000L
    val min = 60L * 1000000000L
    def run(): Unit = {
      val q = streamingDedup(readEventStream(spark, dir.toString))
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp.toString)
        .format("parquet").option("path", out.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    writeBatch(dir, "001.parquet", Seq((1L, 1L, t0), (2L, 1L, t0), (3L, 2L, t0)))
    run()
    // event 2 arrives AGAIN after the restart — only the checkpointed
    // state store can know it was already emitted
    writeBatch(dir, "002.parquet", Seq((2L, 1L, t0), (4L, 3L, t0 + min)))
    run()
    val ids = spark.read.parquet(out.toString)
      .select("event_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(ids == Seq(1L, 2L, 3L, 4L))
  }

  test("sessionizer state survives a restart: one session spans the stop/start") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-restart-sess-")
    val cp = Files.createTempDirectory("graft-restart-sess-cp-")
    val out = Files.createTempDirectory("graft-restart-sess-out-")
    val t0 = 1704067200L * 1000000000L
    val min = 60L * 1000000000L
    def run(): Unit = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val es = spark.readStream.schema(eventSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.toString)
        .withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
        .withWatermark("ts", "0 seconds")
        .as[EventWithTs]
      val q = sessionizeStream(es)
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp.toString)
        .format("parquet").option("path", out.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
    }
    writeBatch(dir, "001.parquet", Seq((1L, 1L, t0), (2L, 1L, t0 + min)))
    run() // session open in state at shutdown
    // the in-gap extension arrives only AFTER the restart; the merged
    // session must still come out as ONE row
    writeBatch(dir, "002.parquet", Seq((3L, 1L, t0 + 2 * min)))
    writeBatch(dir, "003.parquet", Seq((99L, 999L, t0 + 600 * min)))
    run()
    val got = spark.read.parquet(out.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, t0, t0 + 2 * min, 3L)))
  }

  test("streaming as-of enrichment equals batch and a hand computation") {
    val q = latestViewBeforePurchase(readEventStream(spark, stagedDir()))
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
    val streamed = keyed(spark.table("asof_out").collect())
    val batch = keyed(latestViewBeforePurchase(
      graft.sources.Tables.events(spark, sf0001)).collect())
    // independent single-threaded re-derivation of the batch answer
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select("event_id", "user_id", "event_type", "ts_ns").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3) / 1000))
    val views = ev.filter(_._3 == "view")
    val purchUs = ev.filter(_._3 == "purchase").map(e => e._1 -> e._4).toMap
    val expect = ev.filter(_._3 == "purchase").flatMap { case (pid, u, _, pus) =>
      val cand = views.filter(v => v._2 == u &&
        v._4 >= pus - 3600000000L && v._4 <= pus)
      if (cand.isEmpty) None
      else {
        val best = cand.maxBy(v => (v._4, v._1))
        Some(pid -> ((u, best._1, best._4)))
      }
    }.toMap
    assert(batch == expect)
    assert(batch.nonEmpty)
    // streaming emits exactly the batch rows whose purchase window the
    // FINAL watermark closed (append mode withholds the unfinalizable
    // tail); the global watermark is the min across both branches
    val wmFinal = math.min(purchUs.values.max, views.map(_._4).max) -
      3600000000L
    val closed = batch.filter { case (pid, _) =>
      (purchUs(pid) / 300000000L + 1) * 300000000L <= wmFinal
    }
    assert(streamed == closed)
  }

  test("stream-stream join equals the batch join") {
    val q = purchaseViewJoin(readEventStream(spark, stagedDir()))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("ssj_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = purchaseViewJoin(
      graft.sources.Tables.events(spark, sf0001)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming sessionizer merges a session spanning micro-batches and times out idle ones") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-sess-")
    val t0 = 1704067200L * 1000000000L
    val min = 60L * 1000000000L
    // b1: user1 two events; user2 one event
    writeBatch(dir, "001.parquet",
      Seq((1L, 1L, t0), (2L, 1L, t0 + min), (10L, 2L, t0)))
    // b2: user1 extends within the gap (MUST merge, not restart);
    //     user2 exceeds the gap (closes session 1, opens session 2)
    writeBatch(dir, "002.parquet",
      Seq((3L, 1L, t0 + 2 * min), (11L, 2L, t0 + 120 * min)))
    // b3: far-future sentinel pushes the watermark → idle sessions time out
    writeBatch(dir, "003.parquet", Seq((99L, 999L, t0 + 600 * min)))

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val es = spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
      .withWatermark("ts", "0 seconds")
      .as[EventWithTs]
    val q = sessionizeStream(es)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val got = spark.table("sess_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      (1L, t0, t0 + 2 * min, 3L),          // ONE merged session across b1+b2
      (2L, t0, t0, 1L),                    // closed by the gap-exceeding event
      (2L, t0 + 120 * min, t0 + 120 * min, 1L))) // idle-timed-out by sentinel
  }

  test("streaming sessionizer handles in-watermark out-of-order events (nonzero watermark)") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-sess-ooo-")
    val t0 = 1704067200L * 1000000000L
    val min = 60L * 1000000000L
    // b1: user1 session opens at [t0+60m, t0+62m]
    writeBatch(dir, "001.parquet",
      Seq((1L, 1L, t0 + 60 * min), (2L, 1L, t0 + 62 * min)))
    // b2 (out-of-order, within the 2h watermark): t0 is MORE than a gap
    // before the open session's start → disjoint earlier session;
    // t0+40m is within the gap of start → must merge and LOWER start
    writeBatch(dir, "002.parquet",
      Seq((3L, 1L, t0), (4L, 1L, t0 + 40 * min)))
    // b3: sentinel advances the watermark past end+gap → flush
    writeBatch(dir, "003.parquet", Seq((99L, 999L, t0 + 600 * min)))

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val es = spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
      .withWatermark("ts", "2 hours")
      .as[EventWithTs]
    val q = sessionizeStream(es)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_ooo_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val got = spark.table("sess_ooo_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      (1L, t0, t0, 1L),                        // disjoint earlier session
      (1L, t0 + 40 * min, t0 + 62 * min, 3L))) // start lowered by merge
  }

  test("streaming sessionizer merges multiple out-of-order events into one earlier session") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-sess-ooo2-")
    val t0 = 1704067200L * 1000000000L
    val min = 60L * 1000000000L
    // b1: user1 session opens at [t0+100m, t0+102m]
    writeBatch(dir, "001.parquet",
      Seq((1L, 1L, t0 + 100 * min), (2L, 1L, t0 + 102 * min)))
    // b2 (out-of-order, within the 3h watermark): t0 and t0+10m are both
    // more than a gap before the open session's start, but within a gap
    // of EACH OTHER — they must merge into one 2-event earlier session
    // (the old single-open-session code emitted two singletons eagerly)
    writeBatch(dir, "002.parquet",
      Seq((3L, 1L, t0), (4L, 1L, t0 + 10 * min)))
    // b3: sentinel advances the watermark past end+gap → flush all
    writeBatch(dir, "003.parquet", Seq((99L, 999L, t0 + 600 * min)))

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val es = spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
      .withWatermark("ts", "3 hours")
      .as[EventWithTs]
    val q = sessionizeStream(es)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_ooo2_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val got = spark.table("sess_ooo2_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      (1L, t0, t0 + 10 * min, 2L),                 // merged earlier session
      (1L, t0 + 100 * min, t0 + 102 * min, 2L)))
  }

  test("randomized: streaming sessionizer equals the batch sessionizer under in-watermark disorder") {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(777)
    val dir = Files.createTempDirectory("graft-sess-rand-")
    val t0 = 1704067200L * 1000000000L
    val hour = 3600L * 1000000000L
    // 5 users × ~24 events over 6 hours → natural 30-min-gap sessions
    val events = (for {
      u <- 1L to 5L
      i <- 0 until (18 + rng.nextInt(12))
    } yield (u * 1000 + i, u, t0 + (rng.nextDouble() * 6 * hour).toLong))
      .sortBy(_._3)
    // consecutive time chunks as micro-batches, then move ~15% of
    // events one batch LATER: they arrive after events with larger ts
    // (disorder) but stay inside the 2h watermark (batch span ~1h)
    val nBatches = 6
    val chunks = events.grouped(
      math.ceil(events.size / nBatches.toDouble).toInt).toArray
    val batches = Array.fill(chunks.length)(
      scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]())
    chunks.zipWithIndex.foreach { case (chunk, bi) =>
      chunk.foreach { e =>
        val target = if (bi + 1 < chunks.length && rng.nextDouble() < 0.15)
          bi + 1 else bi
        batches(target) += e
      }
    }
    batches.zipWithIndex.foreach { case (b, i) =>
      if (b.nonEmpty) writeBatch(dir, f"r${i}%03d.parquet", b.toSeq)
    }
    // sentinel far past every session's end+gap → all real sessions emit
    writeBatch(dir, "zz_sentinel.parquet",
      Seq((99999L, 999L, t0 + 48 * hour)))

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val es = spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
      .withWatermark("ts", "2 hours")
      .as[EventWithTs]
    val q = sessionizeStream(es)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_rand_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.table("sess_rand_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(_._1 != 999L).toSet

    val batchDs = events.toDF("event_id", "user_id", "ts_ns")
      .selectExpr("event_id", "ts_ns", "user_id",
        "'click' AS event_type", "CAST(1.0 AS DOUBLE) AS value", "'' AS props")
      .as[Event]
    val expected = sessionize(batchDs).collect()
      .map(s => (s.user_id, s.start_ns, s.end_ns, s.n_events)).toSet
    assert(streamed == expected)
    assert(streamed.size >= 5)
  }

  test("left-outer stream-stream join emits unmatched purchases with null view once the watermark proves them") {
    val dir = Files.createTempDirectory("graft-ssj-outer-")
    val t0 = 1704067200L * 1000000000L
    val min = 60L * 1000000000L
    // user1: view 10 min before the purchase (matches);
    // user2: purchase with NO view in its 1-hour lookback
    writeTypedBatch(dir, "001.parquet", Seq(
      (1L, 1L, t0 - 10 * min, "view"),
      (2L, 1L, t0, "purchase"),
      (3L, 2L, t0, "purchase")))
    // sentinel views push BOTH watermarks far past t0 + 1h, proving
    // purchase 3 can never match
    writeTypedBatch(dir, "002.parquet", Seq(
      (98L, 999L, t0 + 600 * min, "view"),
      (99L, 999L, t0 + 600 * min, "purchase")))

    val q = purchaseViewJoinOuter(readEventStream(spark, dir.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_outer_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("ssj_outer_out").collect()
      .filter(_.getLong(2) != 999L) // drop the sentinel's own join rows
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(got == Set((2L, 1L), (3L, -1L)))
    // and on a batch frame the same plan is a plain left-outer join
    val batch = purchaseViewJoinOuter(
      graft.sources.Tables.events(spark, sf0001))
    val inner = purchaseViewJoin(graft.sources.Tables.events(spark, sf0001))
    val purchases = graft.sources.Tables.events(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .count()
    assert(batch.count() ==
      inner.count() + (purchases - inner.select("p_id").distinct().count()))
  }

  test("latest-by-key stateful stream equals the batch aggregate form") {
    val events = graft.sources.Tables.events(spark, sf0001)
      .selectExpr("event_id", "ts_ns", "user_id", "event_type", "value", "props")
      .as[Event]
    val stateful = latestByKeyStream(events).collect()
      .map(o => o.user_id ->
        ((o.last_ts_ns / 1000, o.last_event_id, o.last_event_type,
          o.last_value))).toMap
    val batch = stLatestByKey(spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))).toMap
    assert(stateful == batch)
    assert(stateful.nonEmpty)
  }

  test("latest-by-key stream maintains the snapshot across micro-batches (late keys don't regress)") {
    val dir = Files.createTempDirectory("graft-latest-")
    val t0 = 1704067200L * 1000000000L
    val min = 60L * 1000000000L
    // b1: user1 arrives out of order inside the batch; user2 one event
    writeBatch(dir, "001.parquet",
      Seq((1L, 1L, t0 + min), (2L, 1L, t0), (10L, 2L, t0)))
    // b2: user1 advances; user2 receives a LATE (older) event — the
    // snapshot must not regress to it
    writeBatch(dir, "002.parquet",
      Seq((3L, 1L, t0 + 2 * min), (11L, 2L, t0 - min)))

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val es = spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .withColumnRenamed("ts", "ts_ns")
      .as[Event]
    val q = latestByKeyStream(es)
      .writeStream.outputMode("update")
      .format("memory").queryName("latest_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // update mode re-emits a key's current winner whenever a batch
    // touches it; winners only advance, so the max emitted row per key
    // IS the final snapshot
    val finalSnap = spark.table("latest_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(r => (r._2, r._3)).max }
    assert(finalSnap == Map(
      1L -> ((t0 + 2 * min, 3L)),
      2L -> ((t0, 10L))))
  }

  private def runFunnelStream(dir: java.nio.file.Path, queryName: String,
      watermark: String = "0 seconds"): Unit = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val es = spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
      .withWatermark("ts", watermark)
      .as[EventWithTs]
    val q = funnelStream(es, Seq("view", "click", "purchase"),
      60L * 60 * 1000000000L) // 1-hour horizon
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
  }

  test("streaming funnel emits batch-equal depths once the watermark closes each window") {
    val dir = Files.createTempDirectory("graft-funnel-")
    val t0 = 1704067200L * 1000000000L
    val min = 60L * 1000000000L
    // user 1 completes ACROSS micro-batches; user 2's purchase precedes
    // its view in EVENT time (depth stops at 1 — no click at all);
    // user 3's click lands outside the 1-hour horizon
    writeTypedBatch(dir, "001.parquet", Seq(
      (1L, 1L, t0, "view"), (2L, 1L, t0 + min, "click"),
      (10L, 2L, t0, "purchase"), (11L, 2L, t0 + min, "view"),
      (20L, 3L, t0, "view")))
    writeTypedBatch(dir, "002.parquet", Seq(
      (3L, 1L, t0 + 2 * min, "purchase"),
      (21L, 3L, t0 + 70 * min, "click")))
    // sentinel pushes the watermark past every anchor + horizon
    writeTypedBatch(dir, "003.parquet",
      Seq((99L, 999L, t0 + 600 * min, "view")))
    runFunnelStream(dir, "funnel_out")
    val got = spark.table("funnel_out").collect()
      .filter(_.getLong(0) != 999L)
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 1))
  }

  test("streaming funnel handles a late in-watermark anchor that re-qualifies earlier stages") {
    val dir = Files.createTempDirectory("graft-funnel-late-")
    val t0 = 1704067200L * 1000000000L
    val min = 60L * 1000000000L
    // b1: click+purchase arrive FIRST (no anchor yet — without the
    // below-anchor retention they'd be lost)
    writeTypedBatch(dir, "001.parquet", Seq(
      (2L, 1L, t0 + 10 * min, "click"), (3L, 1L, t0 + 20 * min, "purchase")))
    // b2 (within the 2h watermark): the view that anchors BEFORE them
    writeTypedBatch(dir, "002.parquet", Seq((1L, 1L, t0, "view")))
    writeTypedBatch(dir, "003.parquet",
      Seq((99L, 999L, t0 + 600 * min, "view")))
    runFunnelStream(dir, "funnel_late_out", watermark = "2 hours")
    val got = spark.table("funnel_late_out").collect()
      .filter(_.getLong(0) != 999L)
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 3))
  }

  private def runAttrStream(dir: java.nio.file.Path, queryName: String,
      watermark: String = "0 seconds"): Unit = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val es = spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
      .withWatermark("ts", watermark)
      .as[EventWithTs]
    val q = attributionStream(es,
      horizonNs = 60L * 60 * 1000000000L) // 1-hour horizon
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
  }

  test("streaming attribution credits the last in-horizon touch once the watermark passes each purchase") {
    val dir = Files.createTempDirectory("graft-attr-")
    val t0 = 1704067200L * 1000000000L
    val min = 60L * 1000000000L
    writeTypedBatch(dir, "001.parquet", Seq(
      // user 1: view then purchase; a second purchase past the 1h horizon
      (1L, 1L, t0, "view"), (2L, 1L, t0 + min, "purchase"),
      (3L, 1L, t0 + 70 * min, "purchase"),
      // user 2: purchase arrives FIRST; its click lands in the next
      // micro-batch with an EARLIER event time (in-watermark disorder)
      (11L, 2L, t0 + 2 * min, "purchase"),
      // user 3: no touch at all
      (30L, 3L, t0, "purchase"),
      // user 4: click superseded by a later view
      (20L, 4L, t0, "click"), (21L, 4L, t0 + min, "view"),
      (23L, 4L, t0 + 2 * min, "purchase")))
    writeTypedBatch(dir, "002.parquet", Seq(
      (10L, 2L, t0 + 1 * min, "click")))
    // sentinel pushes the watermark past every purchase
    writeTypedBatch(dir, "003.parquet",
      Seq((99L, 999L, t0 + 600 * min, "view")))
    runAttrStream(dir, "attr_out", watermark = "2 hours")
    val got = spark.table("attr_out").collect()
      .map(r => r.getLong(1) -> r.getString(3))
    assert(got.length === got.map(_._1).distinct.length,
      "each purchase emits exactly once")
    assert(got.toMap === Map(
      2L -> "view", 3L -> "direct", 11L -> "click",
      30L -> "direct", 23L -> "view"))
  }

  test("attribution state survives a restart: a pre-restart touch credits a post-restart purchase") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-restart-attr-")
    val cp = Files.createTempDirectory("graft-restart-attr-cp-")
    val out = Files.createTempDirectory("graft-restart-attr-out-")
    val t0 = 1704067200L * 1000000000L
    val min = 60L * 1000000000L
    def run(): Unit = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val es = spark.readStream.schema(eventSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.toString)
        .withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
        .withWatermark("ts", "0 seconds")
        .as[EventWithTs]
      val q = attributionStream(es, horizonNs = 60L * 60 * 1000000000L)
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp.toString)
        .format("parquet").option("path", out.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
    }
    writeTypedBatch(dir, "001.parquet", Seq((1L, 1L, t0, "click")))
    run() // the touch is only in checkpointed state at shutdown
    writeTypedBatch(dir, "002.parquet",
      Seq((2L, 1L, t0 + min, "purchase")))
    writeTypedBatch(dir, "003.parquet",
      Seq((99L, 999L, t0 + 600 * min, "view")))
    run()
    val got = spark.read.parquet(out.toString).collect()
      .map(r => (r.getLong(1), r.getString(3)))
    assert(got.toSeq === Seq((2L, "click")),
      "the restart must not lose the touch the purchase attributes to")
  }

  test("randomized: streaming attribution equals the batch per-purchase rows") {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(1717)
    val dir = Files.createTempDirectory("graft-attr-rand-")
    val t0 = 1704067200L * 1000000000L
    val hour = 3600L * 1000000000L
    val types = Array("view", "click", "purchase", "error", "signup")
    val events = (for {
      u <- 1L to 8L
      i <- 0 until (12 + rng.nextInt(8))
    } yield (u * 1000 + i, u, t0 + (rng.nextDouble() * 6 * hour).toLong,
      types(rng.nextInt(types.length)))).sortBy(_._3)
    events.grouped((events.size + 4) / 5).zipWithIndex.foreach {
      case (chunk, i) => writeTypedBatch(dir, f"$i%03d.parquet", chunk)
    }
    // the sentinel must clear max-event-time + the 7h watermark lag,
    // or the late tail of purchases never finalizes
    writeTypedBatch(dir, "999.parquet",
      Seq((9999L, 999L, t0 + 20 * hour, "view")))
    runAttrStream(dir, "attr_rand_out", watermark = "7 hours")
    val streamed = spark.table("attr_rand_out").collect()
      .filter(_.getLong(0) != 999L)
      .map(r => r.getLong(1) -> r.getString(3)).toMap
    val batch = graft.operators.EventAnalytics.attributedPurchases(
      events.toDF("event_id", "user_id", "ts_ns", "event_type")
        .selectExpr("user_id", "event_type", "event_id",
          "1.0 AS value", "ts_ns DIV 1000 AS ts_us"),
      horizonUs = 3600L * 1000000L)
      .collect().map(r => r.getLong(1) -> r.getString(3)).toMap
    assert(streamed === batch,
      "every watermark-admitted purchase attributes identically to batch")
    assert(batch.nonEmpty)
  }

  test("randomized: streaming funnel equals the batch funnel under in-watermark disorder") {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(4242)
    val dir = Files.createTempDirectory("graft-funnel-rand-")
    val t0 = 1704067200L * 1000000000L
    val hour = 3600L * 1000000000L
    val types = Array("view", "click", "purchase", "error")
    val events = (for {
      u <- 1L to 8L
      i <- 0 until (10 + rng.nextInt(10))
    } yield (u * 1000 + i, u, t0 + (rng.nextDouble() * 6 * hour).toLong,
      types(rng.nextInt(types.length)))).sortBy(_._3)
    val nBatches = 5
    val chunks = events.grouped(
      math.ceil(events.size / nBatches.toDouble).toInt).toArray
    val batches = Array.fill(chunks.length)(
      scala.collection.mutable.ArrayBuffer[(Long, Long, Long, String)]())
    chunks.zipWithIndex.foreach { case (chunk, bi) =>
      chunk.foreach { e =>
        val target = if (bi + 1 < chunks.length && rng.nextDouble() < 0.15)
          bi + 1 else bi
        batches(target) += ((e._1, e._2, e._3, e._4))
      }
    }
    batches.zipWithIndex.foreach { case (b, i) =>
      if (b.nonEmpty) writeTypedBatch(dir, f"r${i}%03d.parquet", b.toSeq)
    }
    writeTypedBatch(dir, "zz_sentinel.parquet",
      Seq((99999L, 999L, t0 + 48 * hour, "view")))
    runFunnelStream(dir, "funnel_rand_out", watermark = "2 hours")
    // pre-anchor eras are silent: every emitted row is an anchored era
    // (depth ≥ 1), multiple rows per user only for GENUINE separate
    // anchored eras (anchors more than a horizon apart), and the
    // earliest-anchor row per user carries the batch depth
    val streamedRows = spark.table("funnel_rand_out").collect()
      .filter(_.getLong(0) != 999L)
    streamedRows.foreach(r =>
      assert(r.getInt(1) >= 1, s"depth-0 row leaked: $r"))
    val perUser = streamedRows.groupBy(_.getLong(0))
    perUser.foreach { case (u, rs) =>
      val anchors = rs.map(_.getLong(2)).sorted
      anchors.sliding(2).filter(_.length == 2).foreach { w =>
        assert(w(1) - w(0) > hour,
          s"user $u emitted two rows within one horizon: ${rs.toSeq}")
      }
    }
    val streamed = perUser.map { case (u, rs) =>
      u -> rs.minBy(_.getLong(2)).getInt(1)
    }
    val batch = graft.operators.EventAnalytics.funnelDepths(
      events.toDF("event_id", "user_id", "ts_ns", "event_type")
        .selectExpr("user_id", "event_type", "ts_ns DIV 1000 AS ts_us",
          "event_id"),
      Seq("view", "click", "purchase"), 3600000000L) // same 1h horizon, us
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // anchored users (≥1 view): stream == batch; never-anchored users
    // are batch-only (their depth 0 is undecidable mid-stream)
    val anchored = events.filter(_._4 == "view").map(_._2).toSet
    assert(streamed == batch.filter { case (u, _) => anchored(u) })
    assert(streamed.keySet.intersect(batch.keySet -- anchored).isEmpty)
    assert(streamed.nonEmpty)
  }

  test("streaming funnel: an expired pre-anchor era is silent and a later anchored era emits once") {
    val dir = Files.createTempDirectory("graft-funnel-era-")
    val t0 = 1704067200L * 1000000000L
    val min = 60L * 1000000000L
    // era 1: user 1 clicks with NO view; its horizon expires well
    // before the era-2 view (5h later) — round 5 emitted a depth-0 row
    // here, double-counting the user for append consumers
    writeTypedBatch(dir, "001.parquet", Seq((1L, 1L, t0, "click")))
    // watermark (2h) moves past t0 + horizon via an unrelated user
    writeTypedBatch(dir, "002.parquet", Seq((50L, 7L, t0 + 4 * 60 * min, "view")))
    // era 2: anchored view + qualifying click -> depth 2
    writeTypedBatch(dir, "003.parquet", Seq(
      (2L, 1L, t0 + 5 * 60 * min, "view"),
      (3L, 1L, t0 + 5 * 60 * min + 10 * min, "click")))
    writeTypedBatch(dir, "004.parquet",
      Seq((99L, 999L, t0 + 600 * min, "view")))
    runFunnelStream(dir, "funnel_era_out", watermark = "2 hours")
    val got = spark.table("funnel_era_out").collect()
      .filter(r => r.getLong(0) != 999L && r.getLong(0) != 7L)
    assert(got.length == 1,
      s"expected exactly one row for user 1, got ${got.toSeq}")
    assert(got(0).getLong(0) == 1L && got(0).getInt(1) == 2)
    // batch agrees: the only anchor is the era-2 view
    val batch = graft.operators.EventAnalytics.funnelDepths(
      Seq((1L, 1L, t0, "click"),
        (2L, 1L, t0 + 5 * 60 * min, "view"),
        (3L, 1L, t0 + 5 * 60 * min + 10 * min, "click"))
        .toDF("event_id", "user_id", "ts_ns", "event_type")
        .selectExpr("user_id", "event_type", "ts_ns DIV 1000 AS ts_us",
          "event_id"),
      Seq("view", "click", "purchase"), 3600000000L)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(batch(1L) == 2)
  }

  test("watermark drops late data in incremental streaming (two micro-batches)") {
    // feed two files: batch 1 has late-window data only after watermark
    // advances past it in batch 2's processing — append mode emits only
    // windows below the final watermark.
    val dir = Files.createTempDirectory("graft-late-")
    val mkEvents = (ids: Seq[(Long, Long)]) =>
      ids.toDF("event_id", "ts_ns")
        .selectExpr("event_id", "ts_ns", "event_id AS user_id",
          "'click' AS event_type", "1.0 AS value", "'' AS props")
    val t0 = 1704067200L * 1000000000L
    mkEvents(Seq((1L, t0), (2L, t0 + 60L * 1000000000L)))
      .write.parquet(s"$dir/b1")
    val q = windowedCounts(
      readEventStream(spark, s"$dir/b*/")
    ).writeStream.outputMode("append")
      .format("memory").queryName("late_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // append mode with watermark: windows emit only once finalized; with a
    // single burst nothing may finalize — the point here is the pipeline
    // runs incrementally without error and produces a consistent table.
    assert(spark.table("late_out").columns.toSeq ==
      Seq("win_start_s", "event_type", "n"))
  }

  test("streaming anomaly scoring equals the batch st_anomaly twin") {
    val baseline = hourlyBaseline(graft.sources.Tables.events(spark, sf0001))
    val q = anomalyScoreStream(readEventStream(spark, stagedDir()), baseline)
      .writeStream.outputMode("complete")
      .format("memory").queryName("anom_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("anom_out").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getBoolean(4)))).toMap
    val batch = stAnomaly(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getBoolean(4)))).toMap
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    assert(batch.exists(_._2._3), "expected at least one flagged hour")
  }

  private def runScd2Stream(dir: java.nio.file.Path, queryName: String,
      watermark: String = "0 seconds"): Unit = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val es = spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
      .withWatermark("ts", watermark)
      .as[EventWithTs]
    val q = scd2Stream(es)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
  }

  test("streaming SCD2 closes intervals across batches and under in-watermark disorder") {
    val dir = Files.createTempDirectory("graft-scd2-")
    val t0 = 1704067200L * 1000000000L
    val min = 60L * 1000000000L
    // user 1's click arrives a batch EARLY relative to event time (the
    // second view lands before it in event order, via a later file) —
    // the 2h watermark holds both in the buffer until order is settled
    writeTypedBatch(dir, "001.parquet", Seq(
      (1L, 1L, t0, "view"), (3L, 1L, t0 + 30 * min, "click")))
    writeTypedBatch(dir, "002.parquet", Seq(
      (2L, 1L, t0 + 10 * min, "view"),
      (10L, 2L, t0, "error")))
    // sentinel pushes the watermark past everything above
    writeTypedBatch(dir, "003.parquet",
      Seq((99L, 999L, t0 + 600 * min, "view")))
    runScd2Stream(dir, "scd2_out", watermark = "2 hours")
    val got = spark.table("scd2_out").collect()
      .filter(_.getLong(0) != 999L)
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // the two views collapse into ONE interval despite arriving in
    // different files; user 2's open error interval never emits
    assert(got.toSet === Set(
      (1L, "view", t0 / 1000, (t0 + 30 * min) / 1000, 2L)))
  }

  test("randomized: streaming SCD2 equals the batch core's closed intervals") {
    val rng = new scala.util.Random(4242)
    val dir = Files.createTempDirectory("graft-scd2-rand-")
    val t0 = 1704067200L * 1000000000L
    val hour = 3600L * 1000000000L
    val types = Array("view", "click", "purchase", "error")
    val events = (for {
      u <- 1L to 8L
      i <- 0 until (12 + rng.nextInt(8))
    } yield (u * 1000 + i, u, t0 + (rng.nextDouble() * 6 * hour).toLong,
      types(rng.nextInt(types.length)))).sortBy(_._3)
    events.grouped((events.size + 4) / 5).zipWithIndex.foreach {
      case (chunk, i) => writeTypedBatch(dir, f"$i%03d.parquet", chunk)
    }
    writeTypedBatch(dir, "999.parquet",
      Seq((9999L, 999L, t0 + 20 * hour, "view")))
    runScd2Stream(dir, "scd2_rand_out", watermark = "7 hours")
    val streamed = spark.table("scd2_rand_out").collect()
      .filter(_.getLong(0) != 999L)
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val batch = graft.operators.EventAnalytics.scd2Intervals(
      events.toDF("event_id", "user_id", "ts_ns", "event_type")
        .selectExpr("user_id", "event_type", "event_id",
          "ts_ns DIV 1000 AS ts_us"))
      .filter(!org.apache.spark.sql.functions.col("is_current")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(streamed === batch,
      "every closed interval must match the batch compaction exactly")
    assert(batch.nonEmpty)
  }

  test("SCD2 admits an event landing EXACTLY on the watermark (Spark's >= convention)") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-scd2-boundary-")
    val t0 = 1704067200L * 1000000000L
    val hr = 3600L * 1000000000L
    // batch 0: a sentinel at T raises the watermark TO exactly T (0s
    // delay) before the probe event arrives
    writeTypedBatch(dir, "001.parquet", Seq((90L, 999L, t0, "view")))
    // batch 1: user 1's view lands with event time EXACTLY T == the
    // current watermark — Spark's late filter keeps ts >= wm rows, and
    // the r10 strict-> admission dropped precisely this row
    writeTypedBatch(dir, "002.parquet", Seq((1L, 1L, t0, "view")))
    // the click closes the view's interval; the final sentinel pushes
    // the watermark far past everything so the close folds and emits
    writeTypedBatch(dir, "003.parquet", Seq((2L, 1L, t0 + 1 * hr, "click")))
    writeTypedBatch(dir, "004.parquet", Seq((99L, 999L, t0 + 10 * hr, "view")))
    val dropped = spark.sparkContext.longAccumulator("scd2-boundary-drops")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val es = spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
      .withWatermark("ts", "0 seconds")
      .as[EventWithTs]
    val q = scd2Stream(es, droppedAtWatermark = Some(dropped))
      .writeStream.outputMode("append")
      .format("memory").queryName("scd2_boundary_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val got = spark.table("scd2_boundary_out").collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // the at-watermark view OPENS the closed interval: were it dropped
    // on entry (the old strict->), no closed interval would exist at all
    assert(got.toSeq === Seq(("view", t0 / 1000, (t0 + 1 * hr) / 1000, 1L)),
      s"the at-watermark event must be admitted and open its interval: ${got.toSeq}")
    assert(dropped.value == 0L,
      s"no event here is late under >= admission, saw ${dropped.value} drops")
  }

  test("SCD2 state survives a restart: a pre-restart open interval closes after it") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-restart-scd2-")
    val cp = Files.createTempDirectory("graft-restart-scd2-cp-")
    val out = Files.createTempDirectory("graft-restart-scd2-out-")
    val t0 = 1704067200L * 1000000000L
    val min = 60L * 1000000000L
    def run(): Unit = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val es = spark.readStream.schema(eventSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.toString)
        .withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
        .withWatermark("ts", "0 seconds")
        .as[EventWithTs]
      val q = scd2Stream(es)
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp.toString)
        .format("parquet").option("path", out.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
    }
    // run 1: the view interval OPENS (watermark passes it via the
    // mid-sentinel) but cannot close — only checkpointed state holds it
    writeTypedBatch(dir, "001.parquet", Seq((1L, 1L, t0, "view")))
    writeTypedBatch(dir, "002.parquet",
      Seq((50L, 500L, t0 + 30 * min, "view")))
    run()
    // run 2: the click closes the pre-restart interval
    writeTypedBatch(dir, "003.parquet",
      Seq((2L, 1L, t0 + 60 * min, "click")))
    writeTypedBatch(dir, "004.parquet",
      Seq((99L, 999L, t0 + 600 * min, "view")))
    run()
    val got = spark.read.parquet(out.toString).collect()
      .filter(r => r.getLong(0) == 1L)
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(("view", t0 / 1000, (t0 + 60 * min) / 1000, 1L)),
      "the restart must not lose the open interval the click closes")
  }

  test("SCD2 buffered OUT-OF-ORDER events survive a restart and fold in event order") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-restart-scd2ooo-")
    val cp = Files.createTempDirectory("graft-restart-scd2ooo-cp-")
    val out = Files.createTempDirectory("graft-restart-scd2ooo-out-")
    val t0 = 1704067200L * 1000000000L
    val hr = 3600L * 1000000000L
    def run(): Unit = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val es = spark.readStream.schema(eventSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.toString)
        .withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
        .withWatermark("ts", "0 seconds")
        .as[EventWithTs]
      val q = scd2Stream(es)
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp.toString)
        .format("parquet").option("path", out.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
    }
    // run 1, ONE batch: the LATER event (id 5, t0+3h) lands before the
    // EARLIER one (id 2, t0+1h) — both above the watermark, so both
    // buffer unfolded; only checkpointed state carries the disorder
    writeTypedBatch(dir, "001.parquet", Seq(
      (5L, 1L, t0 + 3 * hr, "view"),
      (2L, 1L, t0 + 1 * hr, "click")))
    run()
    // run 2: a sentinel advances the watermark; the restored buffer
    // must fold by EVENT time — the click opens first despite arriving
    // second, and the view closes it
    writeTypedBatch(dir, "002.parquet",
      Seq((99L, 999L, t0 + 10 * hr, "view")))
    writeTypedBatch(dir, "003.parquet",
      Seq((98L, 999L, t0 + 12 * hr, "view")))
    run()
    val got = spark.read.parquet(out.toString).collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      ("click", (t0 + 1 * hr) / 1000, (t0 + 3 * hr) / 1000, 1L)),
      s"restored out-of-order buffer must fold by event time: ${got.toSeq}")
  }

  test("an at-watermark arrival is admitted and splits intervals exactly as the batch order does") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-scd2-atwm-")
    val cp = Files.createTempDirectory("graft-scd2-atwm-cp-")
    val out = Files.createTempDirectory("graft-scd2-atwm-out-")
    val t0 = 1704067200L * 1000000000L
    val hr = 3600L * 1000000000L
    val dropped = spark.sparkContext.longAccumulator("scd2-at-wm-drops")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // batch 1 sets the watermark to t0+2h; batch 2 delivers a click
    // whose event time EQUALS that watermark (the ADVICE boundary) at
    // the same instant as the already-buffered view. Under >=
    // admission (Spark's own late-filter convention) the click is
    // KEPT, buffers, and folds in (ts, event_id) order — producing the
    // same zero-length view interval and click interval the batch
    // scd2Intervals core derives from these rows. The r10 strict->
    // admission dropped it (and diverged from the batch twin).
    writeTypedBatch(dir, "001.parquet", Seq((1L, 1L, t0 + 2 * hr, "view")))
    writeTypedBatch(dir, "002.parquet", Seq(
      (2L, 1L, t0 + 2 * hr, "click"), // == watermark: admitted
      (3L, 1L, t0 + 4 * hr, "view")))
    writeTypedBatch(dir, "003.parquet",
      Seq((99L, 999L, t0 + 10 * hr, "view")))
    writeTypedBatch(dir, "004.parquet",
      Seq((98L, 999L, t0 + 12 * hr, "view")))
    val es = spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
      .withWatermark("ts", "0 seconds")
      .as[EventWithTs]
    val q = scd2Stream(es, Some(dropped))
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp.toString)
      .format("parquet").option("path", out.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    assert(dropped.value == 0L,
      s"an at-watermark arrival is not late under >= admission: ${dropped.value}")
    val got = spark.read.parquet(out.toString).collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(r => (r._2, r._1))
    // the admitted click closes the same-instant view (zero-length
    // interval, the batch core's exact answer for equal timestamps
    // ordered by event_id) and the t0+4h view closes the click
    assert(got.toSeq === Seq(
      ("click", (t0 + 2 * hr) / 1000, (t0 + 4 * hr) / 1000, 1L),
      ("view", (t0 + 2 * hr) / 1000, (t0 + 2 * hr) / 1000, 1L)),
      s"boundary fold must match the batch event order: ${got.toSeq}")
    // cross-check: the batch core on the same rows agrees row-for-row
    val batch = graft.operators.EventAnalytics.scd2Intervals(
      Seq((1L, 1L, t0 + 2 * hr, "view"), (2L, 1L, t0 + 2 * hr, "click"),
        (3L, 1L, t0 + 4 * hr, "view"))
        .toDF("event_id", "user_id", "ts_ns", "event_type")
        .selectExpr("user_id", "event_type", "event_id",
          "ts_ns DIV 1000 AS ts_us"))
      .filter(!col("is_current")).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(r => (r._2, r._1))
    assert(batch.toSeq === got.toSeq,
      "streamed closed intervals must equal the batch twin at the boundary")
  }
}
