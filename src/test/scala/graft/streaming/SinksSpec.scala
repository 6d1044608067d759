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
