package graft.streaming

import graft.SparkTestBase

class EventsReadSpec extends SparkTestBase {
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
