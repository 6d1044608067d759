package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.streaming.EventStreams.{readEventStream, windowedCounts}

class EventsReadSpec extends SparkTestBase {
  import spark.implicits._

  /** One fixed micro-corpus written under each `ts` schema variant the
    * corpus generator has produced so far. The regeneration changed
    * schema once (Long-nanos → TIMESTAMP µs) and silently broke the
    * streaming readers; this pins all variants to the same answer.
    */
  private val fixtureRows: Seq[(Long, Long, Long, String)] = {
    val t0 = 1704067200L * 1000000000L // 2024-01-01T00:00:00Z in ns
    val min = 60L * 1000000000L
    Seq(
      (1L, 1L, t0, "click"),
      (2L, 1L, t0 + min, "view"),
      (3L, 2L, t0 + 90L * min, "click"),
      (4L, 2L, t0 + 91L * min, "purchase"),
      (5L, 3L, t0 + 300L * min, "click"))
  }

  private def baseDf: DataFrame =
    fixtureRows.toDF("event_id", "user_id", "ts_ns", "event_type")
      .selectExpr("event_id", "ts_ns", "user_id", "event_type",
        "1.0 AS value", "'' AS props")

  /** Write the fixture with `ts` as a raw Long of nanos. */
  private def writeLongNanos(): String = {
    val dir = Files.createTempDirectory("graft-schema-ns-").toString
    baseDf.selectExpr("event_id", "ts_ns AS ts", "user_id", "event_type",
      "value", "props").write.mode("overwrite").parquet(dir)
    dir
  }

  /** Write the fixture with `ts` as TIMESTAMP (µs, with zone) — what a
    * standard engine writes, and what the driver corpus now is.
    */
  private def writeTimestampMicros(): String = {
    val dir = Files.createTempDirectory("graft-schema-us-").toString
    baseDf.selectExpr("event_id",
      "timestamp_micros(ts_ns DIV 1000) AS ts", "user_id", "event_type",
      "value", "props").write.mode("overwrite").parquet(dir)
    dir
  }

  /** Write the fixture with `ts` as TIMESTAMP_NTZ (µs, no zone; session
    * zone is pinned UTC so the reinterpretation is the identity).
    */
  private def writeTimestampNtz(): String = {
    val dir = Files.createTempDirectory("graft-schema-ntz-").toString
    baseDf.selectExpr("event_id",
      "CAST(timestamp_micros(ts_ns DIV 1000) AS TIMESTAMP_NTZ) AS ts",
      "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def streamWindowed(dir: String, sink: String): Map[(Long, String), Long] = {
    val q = windowedCounts(readEventStream(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    spark.table(sink).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
  }

  test("readEventStream yields identical windowed counts across Long-nanos, TIMESTAMP µs, and TIMESTAMP_NTZ schemas") {
    val fromNs = streamWindowed(writeLongNanos(), "schema_ns_out")
    val fromUs = streamWindowed(writeTimestampMicros(), "schema_us_out")
    val fromNtz = streamWindowed(writeTimestampNtz(), "schema_ntz_out")
    assert(fromNs.nonEmpty)
    assert(fromUs == fromNs)
    assert(fromNtz == fromNs)
    // window starts land in 2024, not 1970 — the 1000× failure mode
    assert(fromNs.keys.map(_._1).min >= 1704067200L)
  }

  test("batch Tables.events normalizes the same three schema variants identically") {
    val dirs = Seq(writeLongNanos(), writeTimestampMicros(), writeTimestampNtz())
    val got = dirs.map { d =>
      // Tables.events reads `$dir/events.parquet`; stage accordingly
      val parent = Files.createTempDirectory("graft-schema-batch-")
      val target = parent.resolve("events.parquet")
      Files.move(java.nio.file.Paths.get(d), target)
      graft.sources.Tables.events(spark, parent.toString)
        .selectExpr("event_id", "ts_ns").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(got(0).nonEmpty)
    assert(got(1) == got(0))
    assert(got(2) == got(0))
    assert(got(0).values.min == 1704067200L * 1000000000L)
  }
  test("events table (timestamp[ns]) is readable and ts semantics are sane") {
    val e = graft.sources.Tables.events(spark, sf0001)
    val r = e.selectExpr("min(ts_ns)", "max(ts_ns)", "count(*)").head()
    println(s"RANGE: ${r.get(0)} .. ${r.get(1)} n=${r.get(2)}")
    assert(r.getLong(2) > 0)
    // 2024-01-01..2024-01-31 in epoch nanos
    assert(r.getLong(0) > 1704000000L * 1000000000L)
    assert(r.getLong(1) < 1707000000L * 1000000000L)
  }
}
