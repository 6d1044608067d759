package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

class DocStreamsSpec extends SparkTestBase {
  import spark.implicits._

  private val A = "alpha beta gamma delta epsilon zeta"
  private val B = "one two three four five six seven"
  private val C = "completely different sentinel text pushing the watermark forward"

  /** One single-part parquet file of (doc_id, text, ts-seconds) docs —
    * a micro-batch for a maxFilesPerTrigger=1 stream.
    */
  private def writeBatch(dir: java.nio.file.Path, name: String,
      rows: Seq[(Long, String, Long)]): Unit = {
    val staging = Files.createTempDirectory("graft-doc-stage-")
    rows.toDF("doc_id", "text", "sec")
      .selectExpr("doc_id", "text", "timestamp_seconds(sec) AS ts")
      .coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = Files.list(staging).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.toString.endsWith(".parquet")).get
    Files.copy(part, dir.resolve(name))
    Thread.sleep(1100)
  }

  test("streaming near-dup drops band-colliding docs within the horizon and readmits after expiry") {
    val dir = Files.createTempDirectory("graft-neardup-")
    val t0 = 1704067200L
    val min = 60L
    // b1: first copy of A; a too-short doc
    writeBatch(dir, "001.parquet", Seq((1L, A, t0), (10L, "x y", t0)))
    // b2: exact near-dup of A (same band → dropped); fresh doc B (kept);
    //     another short doc (kept — shorts bypass the dedup)
    writeBatch(dir, "002.parquet",
      Seq((2L, A, t0 + 10 * min), (3L, B, t0 + 10 * min),
        (11L, "x y", t0 + 10 * min)))
    // b3: sentinel far in the future — advances the watermark past
    //     t0 + 1h
    writeBatch(dir, "003.parquet", Seq((99L, C, t0 + 300 * min)))
    // b4: second sentinel — state cleanup runs at end-of-batch with the
    //     advanced watermark, evicting A's bucket (an existing entry
    //     dedups regardless of expiry until the cleanup pass removes it)
    writeBatch(dir, "004.parquet",
      Seq((98L, "entirely unrelated second sentinel document text", t0 + 305 * min)))
    // b5: A again, after eviction → readmitted
    writeBatch(dir, "005.parquet", Seq((4L, A, t0 + 310 * min)))

    val docs = spark.readStream.schema(DocStreams.docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val q = DocStreams.streamingNearDup(docs)
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val kept = spark.table("neardup_out").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 10L, 3L, 11L, 99L, 98L, 4L))
  }

  test("voted near-dup: two chained stateful operators, streaming equals batch") {
    val dir = Files.createTempDirectory("graft-vote-")
    val t0 = 1704067200L
    val min = 60L
    // near-dup of A: one token changed → most (not all) shingles shared
    val aNear = "alpha beta gamma delta epsilon CHANGED"
    writeBatch(dir, "001.parquet", Seq((1L, A, t0), (10L, "x y", t0)))
    writeBatch(dir, "002.parquet",
      Seq((2L, A, t0 + min), (3L, aNear, t0 + min), (4L, B, t0 + min),
        (11L, "x y", t0 + min)))
    // sentinel pushes the watermark past the verdict windows
    writeBatch(dir, "003.parquet", Seq((99L, C, t0 + 300 * min)))

    val docs = spark.readStream.schema(DocStreams.docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val q = DocStreams.streamingNearDupVoted(docs)
      .writeStream.outputMode("append")
      .format("memory").queryName("vote_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.table("vote_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap

    // d1 first copy: kept; d2 exact copy: dup; d4 fresh: kept; shorts:
    // never dups (singleton buckets)
    assert(streamed((t0 / 600 * 600, 1L)) == false)
    assert(streamed(((t0 + min) / 600 * 600, 2L)) == true)
    assert(streamed(((t0 + min) / 600 * 600, 4L)) == false)
    assert(streamed((t0 / 600 * 600, 10L)) == false)
    assert(streamed(((t0 + min) / 600 * 600, 11L)) == false)
    // the one-token near-dup shares >= 1 of 16 bands with A
    assert(streamed(((t0 + min) / 600 * 600, 3L)) == true)

    // batch twin on the same rows (sentinel included: batch emits all
    // windows) agrees wherever streaming emitted
    val batchRows = Seq((1L, A, t0), (10L, "x y", t0),
      (2L, A, t0 + min), (3L, aNear, t0 + min), (4L, B, t0 + min),
      (11L, "x y", t0 + min), (99L, C, t0 + 300 * min))
      .toDF("doc_id", "text", "sec")
      .selectExpr("doc_id", "text", "timestamp_seconds(sec) AS ts")
    val batch = DocStreams.streamingNearDupVoted(batchRows).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    streamed.foreach { case (k, v) => assert(batch(k) == v, s"key $k") }
  }

  test("st_neardup gate matches a single-threaded re-derivation of the banded vote") {
    val horizonS = DocStreams.VoteHorizonMs / 1000
    val winS = DocStreams.VoteWindowSec
    val r = DocStreams.VoteRowsPerBand
    def tse(id: Long) = DocStreams.NeardupServeT0 + (id * 37) % 7200
    // engine signatures (certified elsewhere); the stateful vote is
    // what this spec re-derives independently
    val sigs = graft.operators.Dedup.minhashSignatures(
      graft.sources.Tables.documents(spark, sf0001))
      .collect()
      .map(row => row.getLong(0) -> row.getSeq[Long](1).toVector).toMap
    val allIds = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id").collect().map(_.getLong(0))
    val dupByDoc = scala.collection.mutable.Map.empty[Long, Boolean]
      .withDefaultValue(false)
    val buckets = scala.collection.mutable
      .Map.empty[(Int, Vector[Long]), scala.collection.mutable.ArrayBuffer[(Long, Long)]]
    for (id <- allIds; sig <- sigs.get(id)
         if sig.exists(_ != Long.MaxValue); b <- 0 until DocStreams.VoteBands)
      buckets.getOrElseUpdate(
        (b, sig.slice(b * r, b * r + r)),
        scala.collection.mutable.ArrayBuffer.empty) += ((tse(id), id))
    buckets.values.foreach { rows =>
      val sorted = rows.sorted
      sorted.zip(sorted.tail).foreach { case ((t1, _), (t2, id2)) =>
        if (t2 - t1 <= horizonS) dupByDoc(id2) = true
      }
    }
    val expected = allIds.map(id =>
      (tse(id) / winS * winS, id) -> dupByDoc(id)).toMap
    val got = DocStreams.stNeardup(spark, sf0001).collect()
      .map(row => (row.getLong(0), row.getLong(1)) -> row.getBoolean(2)).toMap
    assert(got == expected)
    assert(got.valuesIterator.exists(identity),
      "fixture exercises at least one near-dup flag")
  }

  test("voted near-dup state survives a restart; late docs below the watermark are dropped") {
    // the st_attr/st_bm25 restart pattern applied to BOTH chained
    // stateful operators: the first copy's band buckets AND its open
    // verdict window live only in the checkpoint at shutdown; after
    // the restart an exact copy must vote dup (bucket state) and both
    // verdicts must emit in the correct windows (window state)
    val dir = Files.createTempDirectory("graft-vote-restart-")
    val cp = Files.createTempDirectory("graft-vote-restart-cp-")
    val out = Files.createTempDirectory("graft-vote-restart-out-")
    val t0 = 1704067200L
    def run(): Unit = {
      val docs = spark.readStream.schema(DocStreams.docSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.toString)
      val q = DocStreams.streamingNearDupVoted(docs)
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp.toString)
        .format("parquet").option("path", out.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
    }
    // run 1: first copy of A only — nothing can emit (window open)
    writeBatch(dir, "001.parquet", Seq((1L, A, t0)))
    run()
    assert(spark.read.parquet(out.toString).isEmpty,
      "open window must not emit before the watermark passes")
    // run 2 (restart): exact copy + fresh doc, then a sentinel far
    // ahead closes every window
    writeBatch(dir, "002.parquet", Seq((2L, A, t0 + 60), (4L, B, t0 + 60)))
    writeBatch(dir, "003.parquet", Seq((99L, C, t0 + 300 * 60)))
    run()
    val got = spark.read.parquet(out.toString).collect()
      .filter(_.getLong(1) < 99)
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    val win = t0 / 600 * 600
    assert(got == Map((win, 1L) -> false, (win, 2L) -> true,
      (win, 4L) -> false),
      s"restart lost bucket or window state: $got")
    // run 3: a copy of A arriving below the advanced watermark — its
    // verdict window is closed; the downstream aggregation drops it
    writeBatch(dir, "004.parquet", Seq((5L, A, t0 + 30)))
    run()
    val after = spark.read.parquet(out.toString).collect()
      .filter(_.getLong(1) < 99)
    assert(after.length == 3 && !after.exists(_.getLong(1) == 5L),
      "sub-watermark doc was not dropped")
  }

  test("streaming ingestion: quality filter + in-horizon dedup + chunk stats, equals batch twin") {
    val dir = Files.createTempDirectory("graft-ingest-")
    val t0 = 1704067200L // window-aligned (t0 % 600 == 0)
    val min = 60L
    // stopword-bearing docs pass the 0.15 quality cut (2/6 stopwords
    // -> 0.18); the all-content doc scores ~0.008 and is filtered
    val good1 = "the quick a fox jumps over"
    val good2 = "the big a dog runs fast"
    val junk = "zzz qqq www"
    val sentinel = "the a of to in is and the a of the a"
    def writeIngest(name: String, rows: Seq[(Long, String, String, Long)]): Unit = {
      val staging = Files.createTempDirectory("graft-ingest-stage-")
      rows.toDF("doc_id", "text", "lang", "sec")
        .selectExpr("doc_id", "text", "lang", "timestamp_seconds(sec) AS ts")
        .coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = Files.list(staging).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      Files.copy(part, dir.resolve(name))
      Thread.sleep(1100)
    }
    writeIngest("001.parquet",
      Seq((1L, good1, "en", t0), (3L, good2, "de", t0), (4L, junk, "en", t0)))
    // exact duplicate of doc 1 in the same window -> deduped
    writeIngest("002.parquet", Seq((2L, good1, "en", t0 + min)))
    // far-future sentinel closes the t0 window
    writeIngest("003.parquet", Seq((99L, sentinel, "en", t0 + 300 * min)))

    val docs = spark.readStream.schema(DocStreams.ingestSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val q = DocStreams.ingestPipeline(docs)
      .writeStream.outputMode("append")
      .format("memory").queryName("ingest_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.table("ingest_out").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    // the t0 window: one en doc (1 kept; 2 deduped; 4 filtered), one de
    assert(streamed((t0, "en")) == ((1L, 1L, 6L)))
    assert(streamed((t0, "de")) == ((1L, 1L, 6L)))

    // batch twin on the same rows agrees wherever streaming emitted
    // (duplicates are exact copies, so arbitrary-member dedup choice
    // cannot change the stats)
    val batchRows = Seq((1L, good1, "en", t0), (3L, good2, "de", t0),
      (4L, junk, "en", t0), (2L, good1, "en", t0 + min),
      (99L, sentinel, "en", t0 + 300 * min))
      .toDF("doc_id", "text", "lang", "sec")
      .selectExpr("doc_id", "text", "lang", "timestamp_seconds(sec) AS ts")
    val batch = DocStreams.ingestPipeline(batchRows).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    streamed.foreach { case (k, v) => assert(batch(k) == v, s"window $k") }
    // batch also emits the sentinel's (open-in-streaming) window
    assert(batch(((t0 + 300 * min) / 600 * 600, "en"))._1 == 1L)
  }

  test("ingest scrubs PII before dedup: docs differing only in an email unify") {
    val dir = Files.createTempDirectory("graft-ingest-pii-")
    val t0 = 1704067200L
    val min = 60L
    // same text module the email; after [EMAIL] redaction the prefix
    // fingerprints match, so the second doc dedups against the first
    val withA = "the quick a fox jumps over bob@corp.io"
    val withB = "the quick a fox jumps over alice@example.org"
    def write(name: String, rows: Seq[(Long, String, String, Long)]): Unit = {
      val staging = Files.createTempDirectory("graft-ingest-pii-stage-")
      rows.toDF("doc_id", "text", "lang", "sec")
        .selectExpr("doc_id", "text", "lang", "timestamp_seconds(sec) AS ts")
        .coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = Files.list(staging).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      Files.copy(part, dir.resolve(name))
      Thread.sleep(1100)
    }
    write("001.parquet", Seq((1L, withA, "en", t0)))
    write("002.parquet", Seq((2L, withB, "en", t0 + min)))
    write("003.parquet",
      Seq((99L, "the a of to in is and the a of the a", "en", t0 + 300 * min)))

    val docs = spark.readStream.schema(DocStreams.ingestSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val q = DocStreams.ingestPipeline(docs)
      .writeStream.outputMode("append")
      .format("memory").queryName("ingest_pii_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.table("ingest_pii_out").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // one doc survives (7 tokens incl. the [EMAIL] placeholder)
    assert(streamed((t0, "en")) == ((1L, 1L, 7L)))
  }

  test("windowed heavy hitters: streaming sketch equals the batch twin on closed windows") {
    val dir = Files.createTempDirectory("graft-hh-")
    val t0 = 1704067200L
    val min = 60L
    val rows1 = Seq((1L, "alpha alpha beta", t0),
      (2L, "alpha gamma", t0 + min))
    val rows2 = Seq((3L, "beta beta beta delta", t0 + 2 * min))
    val sentinel = Seq((99L, "omega", t0 + 300 * min))
    def write(name: String, rows: Seq[(Long, String, Long)]): Unit = {
      val staging = Files.createTempDirectory("graft-hh-stage-")
      rows.toDF("doc_id", "text", "sec")
        .selectExpr("doc_id", "text", "timestamp_seconds(sec) AS ts")
        .coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = Files.list(staging).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      Files.copy(part, dir.resolve(name))
      Thread.sleep(1100)
    }
    write("001.parquet", rows1)
    write("002.parquet", rows2)
    write("003.parquet", sentinel)

    val docs = spark.readStream.schema(DocStreams.docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val q = DocStreams.windowedHeavyHitters(docs, k = 16)
      .writeStream.outputMode("append")
      .format("memory").queryName("hh_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val streamed = keyed(spark.table("hh_out").collect())
    // k=16 over a 5-term vocabulary: the sketch is the exact wordcount
    assert(streamed == Map(
      (t0, "alpha") -> ((3L, 0L)), (t0, "beta") -> ((4L, 0L)),
      (t0, "gamma") -> ((1L, 0L)), (t0, "delta") -> ((1L, 0L))))
    // batch twin agrees on the closed window (and also emits the open one)
    val batch = keyed(DocStreams.windowedHeavyHitters(
      (rows1 ++ rows2 ++ sentinel).toDF("doc_id", "text", "sec")
        .selectExpr("doc_id", "text", "timestamp_seconds(sec) AS ts"), k = 16)
      .collect())
    streamed.foreach { case (k0, v) => assert(batch(k0) == v, s"$k0") }
    assert(batch((t0 + 300 * min) / 600 * 600, "omega") == ((1L, 0L)))
  }

  test("streaming contamination against a static train set, equals the batch operator") {
    val dir = Files.createTempDirectory("graft-contam-")
    val t0 = 1704067200L
    val min = 60L
    // 10-token docs (8-gram shingles need >= 8 tokens)
    val trainDoc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val fresh = "one two three four five six seven eight nine ten"
    val sentinel = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    val train = Seq((100L, trainDoc)).toDF("doc_id", "text")

    def writeEval(name: String, rows: Seq[(Long, String, Long)]): Unit = {
      val staging = Files.createTempDirectory("graft-contam-stage-")
      rows.toDF("doc_id", "text", "sec")
        .selectExpr("doc_id", "text", "timestamp_seconds(sec) AS ts")
        .coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = Files.list(staging).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      Files.copy(part, dir.resolve(name))
      Thread.sleep(1100)
    }
    // doc 1 is a verbatim train copy (contamination 1.0); doc 2 fresh (0.0)
    writeEval("001.parquet", Seq((1L, trainDoc, t0), (2L, fresh, t0)))
    writeEval("002.parquet", Seq((99L, sentinel, t0 + 300 * min)))

    val evalStream = spark.readStream.schema(DocStreams.docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val q = DocStreams.streamingContamination(evalStream, train)
      .writeStream.outputMode("append")
      .format("memory").queryName("contam_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.table("contam_out").collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(streamed(1L) == ((3L, 3L, 1.0)), s"train copy fully contaminated: $streamed")
    assert(streamed(2L) == ((3L, 0L, 0.0)), s"fresh doc untouched: $streamed")

    // agrees with the oracle-gated batch operator on the same frames
    val evalBatch = Seq((1L, trainDoc), (2L, fresh)).toDF("doc_id", "text")
    val batch = graft.operators.Pipeline.contamination(train, evalBatch)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    Seq(1L, 2L).foreach(id => assert(batch(id) == streamed(id), s"doc $id"))
  }

  test("batch twin dedups on the same band key") {
    val batch = Seq((1L, A, 0L), (2L, A, 600L), (3L, B, 600L),
      (10L, "x y", 0L), (11L, "x y", 600L))
      .toDF("doc_id", "text", "sec")
      .selectExpr("doc_id", "text", "timestamp_seconds(sec) AS ts")
    val kept = DocStreams.streamingNearDup(batch)
      .collect().map(_.getLong(0)).toSet
    // exactly one of {1,2} survives; both shorts survive; B survives
    assert(kept.intersect(Set(1L, 2L)).size == 1)
    assert(Set(3L, 10L, 11L).subsetOf(kept))
    assert(kept.size == 4)
  }
}
