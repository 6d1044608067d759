package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.operators.TextAnalysis

/** Streaming BM25 serving: the batch twin must equal the gated
  * `ta_bm25` ranking, and the streaming execution (micro-batches,
  * watermark) must equal the batch twin.
  */
class Bm25ServeSpec extends SparkTestBase {

  private val t0 = DocStreams.Bm25ServeT0

  private def queryFrame = {
    val qrows = TextAnalysis.bm25Queries.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (id, ts) => (id, ts.map(_._2).mkString(" ")) }
    spark.createDataFrame(qrows).toDF("query_id", "qtext")
      .select(col("query_id"),
        expr(s"timestamp_seconds($t0 + query_id)").as("ts"),
        col("qtext").as("text"))
  }

  test("batch form of BM25 serving equals the gated ta_bm25 ranking") {
    val served = DocStreams.stBm25(spark, sf001).collect()
      .map(r => r.getInt(1) -> r.getString(2)).toMap
    val gated = TextAnalysis.taBm25(spark, sf001).collect()
      .groupBy(_.getInt(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getLong(1)).map(_.getLong(2)).mkString(",") }
    assert(served == gated && served.nonEmpty)
    // all queries land in one tumbling window
    val wins = DocStreams.stBm25(spark, sf001).collect()
      .map(_.getLong(0)).distinct
    assert(wins.length == 1)
  }

  test("streaming BM25 serving emits the same rankings as the batch form") {
    val corpus = graft.sources.Tables.documents(spark, sf001)
    val dir = Files.createTempDirectory("graft-bm25serve-")
    def writeBatch(name: String, ids: Seq[Int], sentinel: Boolean = false): Unit = {
      val staging = Files.createTempDirectory("graft-bm25serve-stage-")
      val rows =
        if (sentinel)
          // far-future query pushes the watermark past the t0 window so
          // append mode emits the real windows
          queryFrame.filter(col("query_id") === 1)
            .select(lit(99).as("query_id"),
              expr(s"timestamp_seconds($t0 + 999999)").as("ts"),
              col("text"))
        else queryFrame.filter(col("query_id").isInCollection(ids))
      rows.coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = Files.list(staging).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      Files.copy(part, dir.resolve(name))
    }
    writeBatch("001.parquet", Seq(1, 2))
    writeBatch("002.parquet", Seq(3))
    writeBatch("003.parquet", Seq.empty, sentinel = true)
    val stream = spark.readStream
      .schema(queryFrame.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val q = DocStreams.bm25Serve(stream, corpus)
      .writeStream.outputMode("append")
      .format("memory").queryName("bm25serve_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.table("bm25serve_out").collect()
      .filter(_.getInt(1) < 99)
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    val batch = DocStreams.bm25Serve(queryFrame, corpus).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(streamed == batch && streamed.size == 3)
  }

  test("BM25 serve state survives a restart and drops sub-watermark queries (served postings)") {
    // the st_attr restart pattern applied to the st_bm25 SERVE path: a
    // query whose window is still open at shutdown must rank from
    // checkpointed state after the restart, and a query arriving below
    // the advanced watermark must be dropped, not mis-ranked
    val corpus = graft.sources.Tables.documents(spark, sf0001)
    val postings = DocStreams.bm25Postings(corpus).localCheckpoint()
    val dir = Files.createTempDirectory("graft-bm25-restart-")
    val cp = Files.createTempDirectory("graft-bm25-restart-cp-")
    val out = Files.createTempDirectory("graft-bm25-restart-out-")
    def writeBatch(name: String, ids: Seq[Int], sentinel: Boolean = false): Unit = {
      val staging = Files.createTempDirectory("graft-bm25-restart-stage-")
      val rows =
        if (sentinel)
          queryFrame.filter(col("query_id") === 1)
            .select(lit(99).as("query_id"),
              expr(s"timestamp_seconds($t0 + 999999)").as("ts"),
              col("text"))
        else queryFrame.filter(col("query_id").isInCollection(ids))
      rows.coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = Files.list(staging).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      Files.copy(part, dir.resolve(name))
    }
    def run(): Unit = {
      val stream = spark.readStream
        .schema(queryFrame.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.toString)
      val q = DocStreams.bm25Serve(stream, corpus, postings = Some(postings))
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp.toString)
        .format("parquet").option("path", out.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
    }
    // run 1: query 1 alone — its window cannot finalize, so its term
    // state exists ONLY in the checkpoint at shutdown
    writeBatch("001.parquet", Seq(1))
    run()
    // run 2 (restart): query 2 lands in the SAME window, sentinel
    // closes it — the emitted rankings must equal the batch form over
    // both queries, which requires query 1's pre-restart state
    writeBatch("002.parquet", Seq(2))
    writeBatch("003.parquet", Seq.empty, sentinel = true)
    run()
    val got = spark.read.parquet(out.toString).collect()
      .filter(_.getInt(1) < 99)
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    val batch = DocStreams.bm25Serve(
      queryFrame.filter(col("query_id").isInCollection(Seq(1, 2))),
      corpus, postings = Some(postings)).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(got == batch && got.size == 2,
      "restart lost the open window's query state")
    // run 3: query 3 arrives at t0+3, far below the advanced watermark
    // (t0 + 999999 - 1h) — streaming-aggregation semantics DROP it;
    // its closed window must not re-emit or grow
    writeBatch("004.parquet", Seq(3))
    run()
    val after = spark.read.parquet(out.toString).collect()
      .filter(_.getInt(1) < 99)
    assert(after.length == 2 && !after.exists(_.getInt(1) == 3),
      "sub-watermark query was not dropped")
  }

  test("per-doc fold merges score runs exactly: a two-term doc sums in term order") {
    // tiny corpus where doc 1 matches both terms, doc 2 one term
    val docs = spark.createDataFrame(Seq(
      (1L, "x y a b"), (2L, "x c d e"), (3L, "f g h i")))
      .toDF("doc_id", "text")
    val queries = spark.createDataFrame(Seq((7, "x y")))
      .toDF("query_id", "qtext")
      .select(col("query_id"),
        expr(s"timestamp_seconds($t0)").as("ts"),
        col("qtext").as("text"))
    val served = DocStreams.bm25Serve(queries, docs).collect()
    assert(served.length === 1)
    val ids = served.head.getString(2)
    // doc 1 (two matching terms) must outrank doc 2 (one, same length)
    assert(ids.startsWith("1,"), s"got $ids")
    val batchRank = TextAnalysis.bm25TopDocs(docs,
      spark.createDataFrame(Seq((7, "x"), (7, "y"))).toDF("query_id", "term"),
      10).collect().sortBy(_.getLong(1)).map(_.getLong(2)).mkString(",")
    assert(ids === batchRank)
  }
}
