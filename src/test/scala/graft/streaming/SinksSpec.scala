package graft.streaming

import java.nio.file.{Files, Path => JPath}

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkTestBase
import graft.sources.Storage

class SinksSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(StructField("x", LongType)))

  /** One parquet file (= one micro-batch at maxFilesPerTrigger=1). */
  private def writeBatchFile(dir: JPath, name: String,
      rows: Seq[Long]): Unit = {
    val staging = Files.createTempDirectory("graft-sink-stage-")
    rows.toDF("x").coalesce(1).write.mode("overwrite")
      .parquet(staging.toString)
    val part = Files.list(staging).toArray
      .map(_.asInstanceOf[JPath])
      .find(_.toString.endsWith(".parquet")).get
    Files.copy(part, dir.resolve(name))
    Thread.sleep(1100)
  }

  private def stream(dir: JPath) =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)

  test("a batch replayed after a kill BETWEEN table commit and checkpoint update is not duplicated") {
    val src = Files.createTempDirectory("graft-sink-src-")
    val cp = Files.createTempDirectory("graft-sink-cp-")
    val storage = new Storage(spark,
      Files.createTempDirectory("graft-sink-wh-").toString)
    writeBatchFile(src, "001.parquet", Seq(1L, 2L, 3L))
    writeBatchFile(src, "002.parquet", Seq(10L, 20L))

    // run 1: die AFTER batch 0's table commit but BEFORE the streaming
    // checkpoint records the batch — the classic duplicate window
    val q1 = stream(src).writeStream
      .outputMode("append")
      .option("checkpointLocation", cp.toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        storage.appendBatchIdempotent("evts", b, id)
        if (id == 0) throw new RuntimeException("injected post-commit kill")
      }
      .trigger(Trigger.AvailableNow()).start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    // the commit itself landed
    assert(storage.readVersioned("evts").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L, 3L))

    // run 2: Spark replays batch 0 (its offsets were never committed);
    // the sink must recognize the batch id and skip, then land batch 1
    val q2 = stream(src).writeStream
      .outputMode("append")
      .option("checkpointLocation", cp.toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        storage.appendBatchIdempotent("evts", b, id)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(180000)

    val all = storage.readVersioned("evts").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(all == Seq(1L, 2L, 3L, 10L, 20L),
      s"replay must not duplicate batch 0: $all")
    // exactly two committed versions: batch 0 once, batch 1 once
    assert(storage.versions("evts") == Seq(1L, 2L))
    // and the direct replay call is a no-op too
    assert(storage.appendBatchIdempotent("evts",
      Seq(1L, 2L, 3L).toDF("x"), 0L).isEmpty)
  }

  test("scd2Stream -> versioned sink: closed intervals land exactly once across a mid-stream kill") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{DoubleType, StringType}
    val src = Files.createTempDirectory("graft-scd2sink-src-")
    val cp = Files.createTempDirectory("graft-scd2sink-cp-")
    val storage = new Storage(spark,
      Files.createTempDirectory("graft-scd2sink-wh-").toString)
    val eventSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val t0 = 1704067200L * 1000000000L
    val hr = 3600L * 1000000000L
    def writeEvents(name: String, rows: Seq[(Long, Long, Long, String)]): Unit = {
      val staging = Files.createTempDirectory("graft-scd2sink-stage-")
      rows.toDF("event_id", "user_id", "ts_ns", "event_type")
        .selectExpr("event_id", "ts_ns AS ts", "user_id", "event_type",
          "1.0 AS value", "'' AS props")
        .coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = Files.list(staging).toArray.map(_.asInstanceOf[JPath])
        .find(_.toString.endsWith(".parquet")).get
      Files.copy(part, src.resolve(name))
      Thread.sleep(1100)
    }
    def scd2(): org.apache.spark.sql.DataFrame = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      EventStreams.scd2Stream(
        spark.readStream.schema(eventSchema)
          .option("maxFilesPerTrigger", "1")
          .parquet(src.toString)
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
          .withWatermark("ts", "0 seconds")
          .as[EventStreams.EventWithTs]).toDF()
    }
    writeEvents("001.parquet", Seq((1L, 1L, t0, "view")))
    writeEvents("002.parquet", Seq((2L, 1L, t0 + 1 * hr, "click")))
    writeEvents("003.parquet", Seq((3L, 1L, t0 + 2 * hr, "view")))
    writeEvents("004.parquet", Seq((90L, 999L, t0 + 10 * hr, "view")))
    writeEvents("005.parquet", Seq((91L, 999L, t0 + 12 * hr, "view")))
    // run 1: die after batch 1's table commit — the interval emitted in
    // batch 1 is exactly the row a naive restart would double-write
    val q1 = scd2().writeStream
      .outputMode("append")
      .option("checkpointLocation", cp.toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (storage.appendBatchIdempotent("scd2", b, id).isEmpty)
          b.foreachPartition(
            (it: Iterator[org.apache.spark.sql.Row]) => it.foreach(_ => ()))
        if (id == 2) throw new RuntimeException("injected post-commit kill")
      }
      .trigger(Trigger.AvailableNow()).start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    // run 2: the packaged sink resumes from the checkpoint
    Sinks.sinkVersionedExactlyOnce(scd2(), storage, "scd2", cp.toString)
      .awaitTermination(180000)
    val got = storage.readVersioned("scd2").collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sortBy(_._2)
    assert(got == Seq(
      ("view", t0 / 1000, (t0 + 1 * hr) / 1000, 1L),
      ("click", (t0 + 1 * hr) / 1000, (t0 + 2 * hr) / 1000, 1L)),
      s"closed intervals must land exactly once: $got")
  }

  test("ingestPipeline -> versioned sink: corpus stats land exactly once across a mid-stream kill") {
    // the production consumer: the streaming corpus-ingest assembly
    // (PII scrub -> quality filter -> in-horizon dedup -> chunk stats,
    // a dedup->windowed-agg stateful CHAIN) feeding the exactly-once
    // sink. The kill lands between table commit and checkpoint update
    // on the batch that emits the first closed window; the replay must
    // skip the table write while still draining every partition so
    // BOTH stateful operators commit their state stores.
    import org.apache.spark.sql.functions._
    val src = Files.createTempDirectory("graft-ingsink-src-")
    val cp = Files.createTempDirectory("graft-ingsink-cp-")
    val storage = new Storage(spark,
      Files.createTempDirectory("graft-ingsink-wh-").toString)
    val t0 = 1704067200L // window-aligned (t0 % 600 == 0)
    val good1 = "the quick a fox jumps over"
    val good2 = "the big a dog runs fast"
    val sentinel = "the a of to in is and the a of the a"
    def writeDocs(name: String, rows: Seq[(Long, String, String, Long)]): Unit = {
      val staging = Files.createTempDirectory("graft-ingsink-stage-")
      rows.toDF("doc_id", "text", "lang", "sec")
        .selectExpr("doc_id", "text", "lang", "timestamp_seconds(sec) AS ts")
        .coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = Files.list(staging).toArray.map(_.asInstanceOf[JPath])
        .find(_.toString.endsWith(".parquet")).get
      Files.copy(part, src.resolve(name))
      Thread.sleep(1100)
    }
    // window t0: two kept docs (en, de) + an exact duplicate to dedup
    writeDocs("001.parquet", Seq((1L, good1, "en", t0),
      (3L, good2, "de", t0), (2L, good1, "en", t0 + 60)))
    // a second window 2h later; its arrival's watermark closes t0's.
    // The text must be UNIQUE: doc 3's fingerprint is still inside the
    // 1h dedup horizon at this batch's watermark, so reusing good2
    // here would silently drop the doc as a near-arrival duplicate
    writeDocs("002.parquet",
      Seq((5L, "the small a cat walks slow", "en", t0 + 7200)))
    // far-future sentinel: closes the second window in the final batch
    writeDocs("003.parquet", Seq((99L, sentinel, "en", t0 + 18000)))
    def ingest() = DocStreams.ingestPipeline(
      spark.readStream.schema(DocStreams.ingestSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src.toString))
    // run 1: die after the batch that emits window t0 commits
    val q1 = ingest().writeStream
      .outputMode("append")
      .option("checkpointLocation", cp.toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (storage.appendBatchIdempotent("corpus_stats", b, id).isEmpty)
          b.foreachPartition(
            (it: Iterator[org.apache.spark.sql.Row]) => it.foreach(_ => ()))
        if (id == 2) throw new RuntimeException("injected post-commit kill")
      }
      .trigger(Trigger.AvailableNow()).start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    def stats() = storage.readVersioned("corpus_stats").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // the killed run committed window t0 (en kept 1 of 2 after dedup)
    assert(stats() == Map((t0, "en") -> ((1L, 1L, 6L)),
      (t0, "de") -> ((1L, 1L, 6L))), s"run 1 must land window t0: ${stats()}")
    // a second sentinel lands before the restart: run 2 then has a
    // real data batch after the replayed one, whose start watermark
    // (t0+18000-3600) closes the t0+7200 window — and whose own event
    // time (t0+21000, watermark t0+17400) leaves both sentinel
    // windows open, so the expectation is batch-count-deterministic
    writeDocs("004.parquet", Seq((98L, sentinel, "en", t0 + 21000)))
    // run 2: the packaged sink replays batch 2 (skipped, drained),
    // then batch 3 closes and commits the second window
    Sinks.sinkVersionedExactlyOnce(ingest(), storage, "corpus_stats",
      cp.toString).awaitTermination(180000)
    assert(stats() == Map(
      (t0, "en") -> ((1L, 1L, 6L)),
      (t0, "de") -> ((1L, 1L, 6L)),
      (t0 + 7200, "en") -> ((1L, 1L, 6L))),
      s"window t0 must land exactly once, window t0+2h once: ${stats()}")
  }

  test("sink writer fence: a rebuilt-checkpoint stream fails loudly; explicit takeover resumes") {
    val src = Files.createTempDirectory("graft-fence-src-")
    val cpA = Files.createTempDirectory("graft-fence-cpA-")
    val cpB = Files.createTempDirectory("graft-fence-cpB-")
    val storage = new Storage(spark,
      Files.createTempDirectory("graft-fence-wh-").toString)
    writeBatchFile(src, "001.parquet", Seq(1L, 2L))
    writeBatchFile(src, "002.parquet", Seq(3L))
    Sinks.sinkVersionedExactlyOnce(stream(src), storage, "ft",
      cpA.toString).awaitTermination(180000)
    assert(storage.readVersioned("ft").count() == 3)
    // disaster scenario: checkpoint cpA is lost, an operator restarts
    // the stream with a FRESH checkpoint — its batch ids restart at 0
    // and every batch would be silently discarded by the replay check.
    // The fence turns that silent loss into a loud failure.
    val q = Sinks.sinkVersionedExactlyOnce(stream(src), storage, "ft",
      cpB.toString)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(m => m.contains("owned by stream writer") &&
        m.contains("takeOverVersioned"))),
      s"the stream must fail with the fence's actionable error: $e")
    assert(storage.readVersioned("ft").count() == 3,
      "nothing from the fenced stream may land (and nothing may be skipped)")
    // explicit handover: the new stream re-reads the source from
    // scratch (fresh checkpoint = fresh offsets) and its re-delivered
    // batches COMMIT under the new epoch — re-delivery after takeover
    // is the documented, deliberate semantics
    storage.takeOverVersioned("ft", cpB.toString)
    Sinks.sinkVersionedExactlyOnce(stream(src), storage, "ft",
      cpB.toString).awaitTermination(180000)
    assert(storage.readVersioned("ft").count() == 6)
    // and the new owner's own replay protection works across restarts
    Sinks.sinkVersionedExactlyOnce(stream(src), storage, "ft",
      cpB.toString).awaitTermination(180000)
    assert(storage.readVersioned("ft").count() == 6)
  }

  test("auto-maintenance sink: compacts/vacuums on schedule; kill across the boundary stays exactly-once") {
    val src = Files.createTempDirectory("graft-auto-src-")
    val cp = Files.createTempDirectory("graft-auto-cp-")
    val storage = new Storage(spark,
      Files.createTempDirectory("graft-auto-wh-").toString)
    (0 until 6).foreach(i =>
      writeBatchFile(src, f"$i%03d.parquet", Seq(i * 10L, i * 10L + 1L)))
    // run 1: the sink's own policy (compactEvery=2, vacuumKeep=2),
    // killed right AFTER batch 3's commit + auto-compaction but BEFORE
    // the checkpoint update — the replay then crosses a compaction
    // boundary, the exact interleaving the high-water header exists for
    val q1 = stream(src).writeStream
      .outputMode("append")
      .option("checkpointLocation", cp.toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        val committed = storage.appendBatchIdempotent("auto", b, id,
          writer = cp.toString)
        if (committed.nonEmpty && (id + 1) % 2 == 0) {
          // the table is fenced to this stream: maintenance passes the
          // owner's token, exactly as the packaged sink does
          storage.compactVersions("auto", writer = cp.toString)
          storage.vacuumVersions("auto", 2, writer = cp.toString)
        }
        if (id == 3) throw new RuntimeException("injected post-compaction kill")
      }
      .trigger(Trigger.AvailableNow()).start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    // run 2: the packaged sink with the same policy resumes; batch 3
    // replays (post-compaction!), must be skipped; batches 4..5 land
    // and trigger one more maintenance round
    Sinks.sinkVersionedExactlyOnce(stream(src), storage, "auto",
      cp.toString, compactEvery = 2, vacuumKeep = 2)
      .awaitTermination(180000)
    val got = storage.readVersioned("auto").collect().map(_.getLong(0))
      .sorted.toSeq
    assert(got == (0 until 6).flatMap(i => Seq(i * 10L, i * 10L + 1L)),
      s"every batch exactly once across auto-compactions: $got")
    // the maintenance actually ran: history is bounded by the vacuum
    // policy instead of growing one version per batch (+ maintenance)
    assert(storage.versions("auto").size <= 4,
      s"vacuum must bound history: ${storage.versions("auto")}")
    // replays of every batch id are still recognized post-vacuum
    (0 until 6).foreach { i =>
      assert(storage.appendBatchIdempotent("auto",
        Seq(Tuple1(999L)).toDF("x"), i.toLong, writer = cp.toString).isEmpty,
        s"batch $i must replay as a no-op")
    }
  }

  test("auto-maintenance catch: a lost CAS is skipped and retried; a genuine invariant failure fails the stream loudly") {
    // the failure-hiding regression this pins: the sink's maintenance
    // catch must swallow ONLY the retryable lost-CAS race
    // (ConcurrentCommitException), never a real defect inside
    // compact/vacuum — that would be silently discarded at every
    // boundary forever
    val srcA = Files.createTempDirectory("graft-casloss-src-")
    val cpA = Files.createTempDirectory("graft-casloss-cp-")
    val whA = Files.createTempDirectory("graft-casloss-wh-").toString
    var casLosses = 0
    val losing = new Storage(spark, whA) {
      override def compactVersions(name: String,
          expectedVersion: Option[Long], writer: String,
          force: Boolean): Long = {
        casLosses += 1
        throw new graft.sources.ConcurrentCommitException(
          "injected lost CAS")
      }
    }
    writeBatchFile(srcA, "001.parquet", Seq(1L, 2L))
    writeBatchFile(srcA, "002.parquet", Seq(3L))
    Sinks.sinkVersionedExactlyOnce(stream(srcA), losing, "cl",
      cpA.toString, compactEvery = 1).awaitTermination(180000)
    assert(casLosses == 2, "every boundary must have attempted maintenance")
    assert(losing.readVersioned("cl").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 2L, 3L),
      "a lost maintenance CAS must never fail the stream or lose data")

    val srcB = Files.createTempDirectory("graft-invfail-src-")
    val cpB = Files.createTempDirectory("graft-invfail-cp-")
    val whB = Files.createTempDirectory("graft-invfail-wh-").toString
    val broken = new Storage(spark, whB) {
      override def compactVersions(name: String,
          expectedVersion: Option[Long], writer: String,
          force: Boolean): Long =
        throw new IllegalStateException("injected invariant violation")
    }
    writeBatchFile(srcB, "001.parquet", Seq(7L))
    val q = Sinks.sinkVersionedExactlyOnce(stream(srcB), broken, "iv",
      cpB.toString, compactEvery = 1)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("injected invariant violation"))),
      s"a non-CAS maintenance failure must surface, not be swallowed: $e")
    // the batch itself committed before the maintenance blew up
    assert(broken.readVersioned("iv").collect().map(_.getLong(0))
      .toSeq == Seq(7L))
  }

  test("sinkWithHybridRefresh: the RAG corpus's continuous loop — lexical and dense arms pinned to one snapshot, kill included") {
    import org.apache.spark.sql.functions.col
    val src = Files.createTempDirectory("graft-hybloop-src-")
    val cp = Files.createTempDirectory("graft-hybloop-cp-")
    val storage = new Storage(spark,
      Files.createTempDirectory("graft-hybloop-wh-").toString)
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val e = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    def writeVecs(name: String, lo: Long, hi: Long): Unit = {
      val staging = Files.createTempDirectory("graft-hybloop-stage-")
      e.filter(col("vec_id") >= lo && col("vec_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = Files.list(staging).toArray.map(_.asInstanceOf[JPath])
        .find(_.toString.endsWith(".parquet")).get
      Files.copy(part, src.resolve(name))
      Thread.sleep(1100)
    }
    def vecStream() = spark.readStream.schema(e.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    // bootstrap: docs land whole (their own cadence), the initial
    // vector snapshot streams in, the hybrid index builds + saves
    storage.putVersioned("hldocs", docs.filter(col("doc_id") < n * 2 / 5))
    writeVecs("001.parquet", 0L, n * 2 / 5)
    Sinks.sinkVersionedExactlyOnce(vecStream(), storage, "hlvecs",
      cp.toString).awaitTermination(180000)
    val built = graft.api.Corpus.buildHybridIndex(
      storage.readVersioned("hldocs"), storage.readVersioned("hlvecs"))
    val pv1 = graft.api.Corpus.saveHybridIndex(built, storage, "hlidx",
      vectorsCorpusVersion = storage.versions("hlvecs").last)
    // day 1: the docs table grows, three vector batches arrive, and a
    // mid-run kill lands AFTER batch 1's table commit (the classic
    // duplicate window) — the loop must resume exactly-once
    storage.appendVersioned("hldocs", docs.filter(col("doc_id") >= n * 2 / 5))
    writeVecs("002.parquet", n * 2 / 5, n * 3 / 5)
    writeVecs("003.parquet", n * 3 / 5, n * 4 / 5)
    writeVecs("004.parquet", n * 4 / 5, n)
    val q1 = vecStream().writeStream
      .outputMode("append")
      .option("checkpointLocation", cp.toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (storage.appendBatchIdempotent("hlvecs", b, id,
            writer = cp.toString).isEmpty)
          b.foreachPartition(
            (it: Iterator[org.apache.spark.sql.Row]) => it.foreach(_ => ()))
        if (id == 1) throw new RuntimeException("injected post-commit kill")
      }
      .trigger(Trigger.AvailableNow()).start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    val passes0 = graft.operators.Similarity.trainingPasses.get()
    // the ONE verb resumes: batch 1 replays as a skip, batches 2..3
    // land, refresh fires at the id=1 (skipped — hook doesn't run) and
    // id=3 boundaries plus the catch-up at start; refresh-aware vacuum on
    graft.api.Corpus.sinkWithHybridRefresh(vecStream(), storage, "hlvecs",
      cp.toString, "hlidx", refreshEvery = 2, docsTable = "hldocs",
      vacuumKeep = 2).awaitTermination(180000)
    assert(graft.operators.Similarity.trainingPasses.get() == passes0,
      "the continuous hybrid loop must never retrain the dense arm")
    assert(storage.readVersioned("hlvecs").count() == n,
      "the kill-replayed ingest must land every vector exactly once")
    val idx = graft.api.Corpus.loadHybridIndex(storage, "hlidx")
    // BOTH arms serve the full corpus: every vector indexed, and the
    // postings cover docs appended after the bootstrap build
    assert(idx.ann.lists.count() == n,
      "every streamed vector must be indexed with zero manual refreshes")
    assert(idx.postings
      .join(docs.filter(col("doc_id") >= n * 2 / 5).select(col("doc_id")),
        "doc_id").count() > 0,
      "the lexical arm must have rebuilt over the grown docs table")
    // the arms are pinned to ONE generation: the hybrid pointer's dense
    // arm consumed exactly the vectors version the stream left behind
    assert(storage.versions("hlidx__hybrid").last > pv1)
    val hyb = storage.readVersioned("hlidx__hybrid").collect()(0)
    val densePtr = storage.readVersioned("hlidx__dense__ann",
      hyb.getAs[Long]("dense_version")).collect()(0)
    assert(densePtr.getAs[Long]("corpus_version") ==
      storage.versions("hlvecs").last,
      "dense arm must be caught up to the corpus head")
    // refresh-aware vacuum bounded history but never the consumed
    // version: the table still reads in full
    assert(storage.readVersioned("hlvecs").count() == n)
    Seq(built, idx).foreach(_.close())
  }

  test("sinkWithRankRefresh: the TextRank family's continuous loop — fold refresh across a kill equals a rebuild bit-for-bit") {
    import org.apache.spark.sql.functions.col
    val src = Files.createTempDirectory("graft-trloop-src-")
    val cp = Files.createTempDirectory("graft-trloop-cp-")
    val storage = new Storage(spark,
      Files.createTempDirectory("graft-trloop-wh-").toString)
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    def writeDocs(name: String, lo: Long, hi: Long): Unit = {
      val staging = Files.createTempDirectory("graft-trloop-stage-")
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = Files.list(staging).toArray.map(_.asInstanceOf[JPath])
        .find(_.toString.endsWith(".parquet")).get
      Files.copy(part, src.resolve(name))
      Thread.sleep(1100)
    }
    def docStream() = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    // bootstrap: the initial snapshot streams in, the model builds +
    // saves with its consumed docs version
    writeDocs("001.parquet", 0L, n * 2 / 5)
    Sinks.sinkVersionedExactlyOnce(docStream(), storage, "trdocs",
      cp.toString).awaitTermination(180000)
    val m0 = graft.api.Corpus.buildRankModel(storage.readVersioned("trdocs"))
    graft.api.Corpus.saveRankModel(m0, storage, "trm",
      docsCorpusVersion = storage.versions("trdocs").last)
    // three more batches; a kill lands AFTER batch 1's table commit
    // (the classic duplicate window) — the loop must resume exactly-once
    writeDocs("002.parquet", n * 2 / 5, n * 3 / 5)
    writeDocs("003.parquet", n * 3 / 5, n * 4 / 5)
    writeDocs("004.parquet", n * 4 / 5, n)
    val q1 = docStream().writeStream
      .outputMode("append")
      .option("checkpointLocation", cp.toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (storage.appendBatchIdempotent("trdocs", b, id,
            writer = cp.toString).isEmpty)
          b.foreachPartition(
            (it: Iterator[org.apache.spark.sql.Row]) => it.foreach(_ => ()))
        if (id == 1) throw new RuntimeException("injected post-commit kill")
      }
      .trigger(Trigger.AvailableNow()).start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    // the ONE verb resumes: batch 1 replays as a skip, 2..3 land, the
    // fold fires at the boundaries plus the catch-up at start
    graft.api.Corpus.sinkWithRankRefresh(docStream(), storage, "trdocs",
      cp.toString, "trm", refreshEvery = 2, vacuumKeep = 2)
      .awaitTermination(180000)
    assert(storage.readVersioned("trdocs").count() == n,
      "the kill-replayed ingest must land every doc exactly once")
    // the folded model equals a from-scratch build over the full
    // corpus, bit-for-bit (integer fixed-point end to end)
    val loaded = graft.api.Corpus.loadRankModel(storage, "trm")
    val rebuilt = graft.api.Corpus.buildRankModel(docs)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows(loaded.ranks) == rows(rebuilt.ranks) &&
      rows(loaded.ranks).nonEmpty,
      "the continuous fold must equal a rebuild over the full corpus")
    // the pointer consumed exactly the docs version the stream left
    assert(storage.readVersioned("trm__tr").collect()(0)
      .getAs[Long]("docs_version") == storage.versions("trdocs").last)
    // refresh-aware vacuum bounded history but never the consumed
    // version: the table still reads in full
    assert(storage.readVersioned("trdocs").count() == n)
    Seq(m0, loaded, rebuilt).foreach(_.close())
  }

  test("sinkWithPairMiningRefresh: aligned two-table ingest + base fold as one verb, kill between the paired appends included") {
    import org.apache.spark.sql.functions.col
    val src = Files.createTempDirectory("graft-pmloop-src-")
    val cp = Files.createTempDirectory("graft-pmloop-cp-")
    val storage = new Storage(spark,
      Files.createTempDirectory("graft-pmloop-wh-").toString)
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val e = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    // the aligned stream shape: one row = one doc WITH its embedding.
    // The id column is deliberately NON-canonical ("passage_id"): the
    // verb must normalize it into doc_id/vec_id on BOTH appends, or
    // the refresh's QA pass wedges at every boundary forever
    val joint = docs.join(e, docs("doc_id") === e("vec_id"))
      .select(col("doc_id").as("passage_id"), col("text"), col("embedding"))
    val n = joint.count()
    def writeJoint(name: String, lo: Long, hi: Long): Unit = {
      val staging = Files.createTempDirectory("graft-pmloop-stage-")
      joint.filter(col("passage_id") >= lo && col("passage_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = Files.list(staging).toArray.map(_.asInstanceOf[JPath])
        .find(_.toString.endsWith(".parquet")).get
      Files.copy(part, src.resolve(name))
      Thread.sleep(1100)
    }
    def jointStream() = spark.readStream.schema(joint.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    // bootstrap: the initial batch lands in BOTH tables through the
    // loop itself (no pointer yet -> build and save by hand after)
    writeJoint("001.parquet", 0L, n * 3 / 5)
    val qb = jointStream().writeStream
      .outputMode("append")
      .option("checkpointLocation", cp.toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        storage.appendBatchIdempotent("pldocs",
          b.drop("embedding").withColumnRenamed("passage_id", "doc_id"),
          id, writer = cp.toString)
        storage.appendBatchIdempotent("plvecs",
          b.select(col("passage_id").as("vec_id"), col("embedding")), id,
          writer = cp.toString)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    qb.awaitTermination(180000)
    val base = graft.api.Corpus.buildPairMiningBase(
      storage.readVersioned("pldocs"), storage.readVersioned("plvecs"))
    graft.api.Corpus.savePairMiningBase(base, storage, "plbase",
      docsVersion = storage.versions("pldocs").last,
      vectorsVersion = storage.versions("plvecs").last)
    // steady state: three more aligned batches; the kill lands BETWEEN
    // the docs append and the vectors append of batch 1 — the window
    // unique to the two-table shape. The replay must skip docs and
    // commit vectors: per-table exactly-once. (The catch-up refresh at
    // the next start sees MISALIGNED horizons and must skip — folding
    // the unpaired doc delta would orphan those docs' vectors forever.)
    writeJoint("002.parquet", n * 3 / 5, n * 7 / 10)
    writeJoint("003.parquet", n * 7 / 10, n * 4 / 5)
    writeJoint("004.parquet", n * 4 / 5, n)
    val q1 = jointStream().writeStream
      .outputMode("append")
      .option("checkpointLocation", cp.toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        storage.appendBatchIdempotent("pldocs",
          b.drop("embedding").withColumnRenamed("passage_id", "doc_id"),
          id, writer = cp.toString)
        if (id == 1) throw new RuntimeException(
          "injected kill between the paired appends")
        storage.appendBatchIdempotent("plvecs",
          b.select(col("passage_id").as("vec_id"), col("embedding")), id,
          writer = cp.toString)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    assert(storage.readVersioned("pldocs").count() >
      storage.readVersioned("plvecs").count(),
      "the kill must land between the paired appends for this fixture")
    val passes0 = graft.operators.Similarity.trainingPasses.get()
    graft.api.Corpus.sinkWithPairMiningRefresh(jointStream(), storage,
      "pldocs", "plvecs", cp.toString, "plbase", refreshEvery = 2,
      vacuumKeep = 4, id = "passage_id").awaitTermination(180000)
    assert(graft.operators.Similarity.trainingPasses.get() == passes0,
      "the continuous pair-mining loop must never retrain")
    // per-table exactly-once across the half-committed batch
    assert(storage.readVersioned("pldocs").count() == n,
      "every doc exactly once despite the half-committed batch replay")
    assert(storage.readVersioned("plvecs").count() == n,
      "every vector exactly once despite the half-committed batch replay")
    // the base folded everything: its fingerprints equal a from-scratch
    // QA pass over the full corpus, and every survivor's vector is
    // indexed under the frozen centroids
    val refreshed = graft.api.Corpus.loadPairMiningBase(storage, "plbase")
    val expectFps = graft.operators.Pipeline
      .qualityFp(storage.readVersioned("pldocs"))
      .select(col("fp")).distinct().count()
    assert(refreshed.fingerprints.count() == expectFps,
      "the folded base must hold one fingerprint per QA survivor")
    assert(refreshed.index.lists.count() == refreshed.fingerprints.count())
    // the pointer checkpointed both heads; mining a fresh batch against
    // the loaded base needs zero rebuilding (the loop's serving face)
    val ptr = storage.readVersioned("plbase__pmb").collect()(0)
    assert(ptr.getAs[Long]("docs_version") ==
      storage.versions("pldocs").last)
    assert(ptr.getAs[Long]("vectors_version") ==
      storage.versions("plvecs").last)
    Seq(base, refreshed).foreach(_.close())
  }

  test("stream -> versioned corpus -> incremental index refresh: the full ingest-to-serving loop, kill included") {
    // the production composition the storage verbs exist for: vectors
    // stream into a versioned table through the exactly-once sink (a
    // mid-run kill replays a batch), the nightly refreshAnnIndex then
    // consumes EXACTLY the streamed delta via the pointer's corpus
    // version, and the refreshed index serves every vector exactly once
    import org.apache.spark.sql.functions.col
    val src = Files.createTempDirectory("graft-loop-src-")
    val cp = Files.createTempDirectory("graft-loop-cp-")
    val storage = new Storage(spark,
      Files.createTempDirectory("graft-loop-wh-").toString)
    val e = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    val cut = n * 2 / 5
    val cut2 = n * 3 / 5
    val cut3 = n * 4 / 5
    def writeVecs(name: String, lo: Long, hi: Long): Unit = {
      val staging = Files.createTempDirectory("graft-loop-stage-")
      e.filter(col("vec_id") >= lo && col("vec_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = Files.list(staging).toArray.map(_.asInstanceOf[JPath])
        .find(_.toString.endsWith(".parquet")).get
      Files.copy(part, src.resolve(name))
      Thread.sleep(1100)
    }
    def vecStream() = spark.readStream.schema(e.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    // day 0: the base corpus streams in, the index trains and persists
    writeVecs("001.parquet", 0L, cut)
    Sinks.sinkVersionedExactlyOnce(vecStream(), storage, "svecs",
      cp.toString).awaitTermination(180000)
    val built = graft.api.Corpus.buildAnnIndex(storage.readVersioned("svecs"))
    graft.api.Corpus.saveAnnIndex(built, storage, "sidx",
      corpusVersion = storage.versions("svecs").last)
    // day 1: three more batches stream in; the query dies AFTER the
    // first one's table commit but before its checkpoint update
    writeVecs("002.parquet", cut, cut2)
    writeVecs("003.parquet", cut2, cut3)
    writeVecs("004.parquet", cut3, n)
    val q1 = vecStream().writeStream
      .outputMode("append")
      .option("checkpointLocation", cp.toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (storage.appendBatchIdempotent("svecs", b, id,
            writer = cp.toString).isEmpty)
          b.foreachPartition(
            (it: Iterator[org.apache.spark.sql.Row]) => it.foreach(_ => ()))
        if (id == 1) throw new RuntimeException("injected post-commit kill")
      }
      .trigger(Trigger.AvailableNow()).start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    // the resumed sink AUTO-COMPACTS (compactEvery=2 → a re-snapshot
    // lands between the index save and the refresh below — the exact
    // interplay the #base content-equal chain exists for; vacuumKeep
    // stays ABOVE the refresh interval, the documented retention
    // contract, so the pointer's consumed version remains diffable)
    Sinks.sinkVersionedExactlyOnce(vecStream(), storage, "svecs",
      cp.toString, compactEvery = 2, vacuumKeep = 8)
      .awaitTermination(180000)
    assert(storage.readVersioned("svecs").count() == n,
      "the kill-replayed ingest must land every vector exactly once")
    assert(storage.versionDirCount("svecs") <= 2,
      "the auto-compaction must have re-packed the corpus table")
    // the nightly refresh consumes the streamed delta — zero retraining
    val passes0 = graft.operators.Similarity.trainingPasses.get()
    graft.api.Corpus.refreshAnnIndex(storage, "sidx", "svecs")
    assert(graft.operators.Similarity.trainingPasses.get() == passes0)
    val idx = graft.api.Corpus.loadAnnIndex(storage, "sidx")
    assert(idx.lists.count() == n,
      "the refreshed index must hold one list row per streamed vector")
    assert(idx.lists.select(col("c_id")).distinct().count() == n)
    // streamed delta vectors are genuinely served
    val deltaQ = e.filter(col("vec_id") >= cut3).limit(2)
    val self = idx.topK(deltaQ, k = 1).collect()
    assert(self.length == 2 && self.forall(r => r.getLong(0) == r.getLong(2)),
      "each streamed vector must find itself in the refreshed index")
    Seq(built, idx).foreach(_.close())
  }

  test("sinkWithAnnRefresh: one verb runs ingestion AND periodic index refresh, no manual maintenance") {
    import org.apache.spark.sql.functions.col
    val src = Files.createTempDirectory("graft-cont-src-")
    val cp = Files.createTempDirectory("graft-cont-cp-")
    val storage = new Storage(spark,
      Files.createTempDirectory("graft-cont-wh-").toString)
    val e = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    def writeVecs(name: String, lo: Long, hi: Long): Unit = {
      val staging = Files.createTempDirectory("graft-cont-stage-")
      e.filter(col("vec_id") >= lo && col("vec_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = Files.list(staging).toArray.map(_.asInstanceOf[JPath])
        .find(_.toString.endsWith(".parquet")).get
      Files.copy(part, src.resolve(name))
      Thread.sleep(1100)
    }
    def vecStream() = spark.readStream.schema(e.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    // bootstrap: initial snapshot streams in, the index trains + saves
    writeVecs("001.parquet", 0L, n * 2 / 5)
    Sinks.sinkVersionedExactlyOnce(vecStream(), storage, "cvs",
      cp.toString).awaitTermination(180000)
    val built = graft.api.Corpus.buildAnnIndex(storage.readVersioned("cvs"))
    val pv1 = graft.api.Corpus.saveAnnIndex(built, storage, "cidx2",
      corpusVersion = storage.versions("cvs").last)
    // steady state: three more batches; the ONE verb ingests and
    // refreshes every 2 batches (at ids 1 and 3) — no manual calls
    writeVecs("002.parquet", n * 2 / 5, n * 3 / 5)
    writeVecs("003.parquet", n * 3 / 5, n * 4 / 5)
    writeVecs("004.parquet", n * 4 / 5, n)
    val passes0 = graft.operators.Similarity.trainingPasses.get()
    graft.api.Corpus.sinkWithAnnRefresh(vecStream(), storage, "cvs",
      cp.toString, "cidx2", refreshEvery = 2).awaitTermination(180000)
    assert(graft.operators.Similarity.trainingPasses.get() == passes0,
      "the continuous loop must never retrain")
    // two refresh boundaries fired: two new pointer generations, the
    // last one having consumed EVERYTHING (batch 2's rows ride the
    // id=3 boundary — each refresh consumes since the pointer, not
    // 'this batch')
    assert(storage.versions("cidx2__ann") == Seq(pv1, pv1 + 1, pv1 + 2))
    val idx = graft.api.Corpus.loadAnnIndex(storage, "cidx2")
    assert(idx.lists.count() == n,
      "every streamed vector must be indexed with zero manual refreshes")
    val ptr = storage.readVersioned("cidx2__ann").collect()(0)
    assert(ptr.getAs[Long]("corpus_version") ==
      storage.versions("cvs").last)
    Seq(built, idx).foreach(_.close())
  }

  test("sinkWithIvfPqRefresh: the flagship index's continuous loop — both quantizers frozen, refresh-aware vacuum") {
    import org.apache.spark.sql.functions.col
    val src = Files.createTempDirectory("graft-pqc-src-")
    val cp = Files.createTempDirectory("graft-pqc-cp-")
    val storage = new Storage(spark,
      Files.createTempDirectory("graft-pqc-wh-").toString)
    val e = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    def writeVecs(name: String, lo: Long, hi: Long): Unit = {
      val staging = Files.createTempDirectory("graft-pqc-stage-")
      e.filter(col("vec_id") >= lo && col("vec_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = Files.list(staging).toArray.map(_.asInstanceOf[JPath])
        .find(_.toString.endsWith(".parquet")).get
      Files.copy(part, src.resolve(name))
      Thread.sleep(1100)
    }
    def vecStream() = spark.readStream.schema(e.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    writeVecs("001.parquet", 0L, n * 2 / 5)
    Sinks.sinkVersionedExactlyOnce(vecStream(), storage, "pqc",
      cp.toString).awaitTermination(180000)
    val built = graft.api.Corpus.buildIvfPqIndex(
      storage.readVersioned("pqc"))
    graft.api.Corpus.saveIvfPqIndex(built, storage, "pqcidx",
      corpusVersion = storage.versions("pqc").last)
    writeVecs("002.parquet", n * 2 / 5, n * 3 / 5)
    writeVecs("003.parquet", n * 3 / 5, n * 4 / 5)
    writeVecs("004.parquet", n * 4 / 5, n)
    val passes0 = graft.operators.Similarity.trainingPasses.get()
    // refresh-aware vacuum ON (the trap the shared loop exists to
    // avoid: keep-last-K alone could reclaim the consumed version)
    graft.api.Corpus.sinkWithIvfPqRefresh(vecStream(), storage, "pqc",
      cp.toString, "pqcidx", refreshEvery = 2, vacuumKeep = 2)
      .awaitTermination(180000)
    assert(graft.operators.Similarity.trainingPasses.get() == passes0,
      "the continuous IVF-PQ loop must never retrain either quantizer")
    val idx = graft.api.Corpus.loadIvfPqIndex(storage, "pqcidx")
    assert(idx.ann.lists.count() == n)
    assert(idx.codes.count() == n * graft.operators.Similarity.PqM,
      "every streamed vector must be encoded with zero manual refreshes")
    // the refresh-aware vacuum freed old history but never the
    // consumed version: the table still reads, and the pointer's
    // consumed version is retained
    val ptr = storage.readVersioned("pqcidx__ivfpq").collect()(0)
    assert(storage.versions("pqc")
      .contains(ptr.getAs[Long]("corpus_version")))
    assert(storage.readVersioned("pqc").count() == n)
    Seq(built, idx).foreach(_.close())
  }

  test("sinkVersionedExactlyOnce lands each micro-batch as one atomic version and resumes across runs") {
    val src = Files.createTempDirectory("graft-sink2-src-")
    val cp = Files.createTempDirectory("graft-sink2-cp-")
    val storage = new Storage(spark,
      Files.createTempDirectory("graft-sink2-wh-").toString)
    writeBatchFile(src, "001.parquet", Seq(7L))
    writeBatchFile(src, "002.parquet", Seq(8L, 9L))
    Sinks.sinkVersionedExactlyOnce(stream(src), storage, "docs",
      cp.toString).awaitTermination(180000)
    assert(storage.readVersioned("docs").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(7L, 8L, 9L))
    // time travel: version 1 is exactly the first micro-batch
    assert(storage.readVersioned("docs", 1L).collect().map(_.getLong(0))
      .toSeq == Seq(7L))
    // a later run with the same checkpoint appends only the NEW file
    writeBatchFile(src, "003.parquet", Seq(100L))
    Sinks.sinkVersionedExactlyOnce(stream(src), storage, "docs",
      cp.toString).awaitTermination(180000)
    assert(storage.readVersioned("docs").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(7L, 8L, 9L, 100L))
    assert(storage.versions("docs") == Seq(1L, 2L, 3L))
  }
}
