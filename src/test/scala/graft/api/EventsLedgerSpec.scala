package graft.api

import graft.SparkTestBase

/** The persisted growth ledger: refresh ≡ from-scratch rebuild
  * (per-user decomposability makes the incremental difference exact),
  * crash-idempotent appends, pointer-aware vacuum.
  */
class EventsLedgerSpec extends SparkTestBase {
  import spark.implicits._

  private val NsPerDay = 86400L * 1000000000L

  private def evFrame(rows: Seq[(Long, Long)]) =
    rows.zipWithIndex
      .map { case ((u, day), i) =>
        (u, day * NsPerDay + u * 1000L + i, i.toLong)
      }
      .toDF("user_id", "ts_ns", "event_id")

  private def freshStorage() = new graft.sources.Storage(spark,
    java.nio.file.Files.createTempDirectory("graft-ledger-").toString)

  private def ledgerRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))).toMap

  private def fromScratch(rows: Seq[(Long, Long)]) =
    ledgerRows(graft.operators.EventAnalytics.growthAccounting(
      rows.toDF("user_id", "day")))

  test("build + read serves exactly the from-scratch ledger") {
    val st = freshStorage()
    val base = Seq((1L, 10L), (1L, 11L), (2L, 11L))
    st.putVersioned("events", evFrame(base))
    Events.buildGrowthLedger(st, "events", "gl")
    assert(ledgerRows(Events.readGrowthLedger(st, "gl")) === fromScratch(base))
  }

  test("refresh folds a delta exactly: reclassifications, revivals, new users") {
    val st = freshStorage()
    val base = Seq((1L, 10L), (1L, 11L), (2L, 11L))
    st.putVersioned("events", evFrame(base))
    Events.buildGrowthLedger(st, "events", "gl")
    // the delta: user 1 resurrects at 13; user 2's day-12 activity
    // RECLASSIFIES their day-12 churn marker into retained; user 3 is
    // brand new at day 13 — every counter kind moves
    val delta = Seq((1L, 13L), (2L, 12L), (3L, 13L))
    st.appendVersioned("events", evFrame(delta))
    val p1 = Events.refreshGrowthLedger(st, "events", "gl")
    assert(ledgerRows(Events.readGrowthLedger(st, "gl"))
      === fromScratch(base ++ delta))
    // refresh is O(delta): the activity table grew by exactly the
    // delta's new (user, day) rows, appended — not rewritten
    val ptr = st.readVersioned("gl__gl").collect()(0)
    val act = st.readVersioned("gl__act", ptr.getAs[Long]("act_version"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(act.length === act.distinct.length, "no duplicate activity rows")
    assert(act.toSet === (base ++ delta).toSet)
    // no-op: nothing new — same pointer version comes back
    assert(Events.refreshGrowthLedger(st, "events", "gl") === p1)
    // a delta that only re-asserts known activity re-pins without
    // touching the artifact versions
    st.appendVersioned("events", evFrame(Seq((1L, 10L), (2L, 11L))))
    Events.refreshGrowthLedger(st, "events", "gl")
    val ptr2 = st.readVersioned("gl__gl").collect()(0)
    assert(ptr2.getAs[Long]("act_version") === ptr.getAs[Long]("act_version"))
    assert(ptr2.getAs[Long]("ledger_version")
      === ptr.getAs[Long]("ledger_version"))
    assert(ledgerRows(Events.readGrowthLedger(st, "gl"))
      === fromScratch(base ++ delta))
  }

  test("a refresh that crashed after its append re-runs without double-counting") {
    val st = freshStorage()
    val base = Seq((1L, 10L), (2L, 11L))
    st.putVersioned("events", evFrame(base))
    Events.buildGrowthLedger(st, "events", "gl")
    val delta = Seq((1L, 12L), (3L, 12L))
    st.appendVersioned("events", evFrame(delta))
    // simulate the crash: the night's activity append landed, but the
    // run died before its ledger write and pointer commit
    val ptr = st.readVersioned("gl__gl").collect()(0)
    val va = ptr.getAs[Long]("act_version")
    st.appendVersionedOnto("gl__act",
      Events.bucketedAct(delta.toDF("user_id", "day")), va)
    // the re-run must rebuild from the PINNED base — the orphan append
    // above must not be double-counted
    Events.refreshGrowthLedger(st, "events", "gl")
    assert(ledgerRows(Events.readGrowthLedger(st, "gl"))
      === fromScratch(base ++ delta))
    val ptr2 = st.readVersioned("gl__gl").collect()(0)
    val act = st.readVersioned("gl__act", ptr2.getAs[Long]("act_version"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(act.length === act.distinct.length,
      "the orphan append must not leak duplicate rows into the served version")
    assert(act.toSet === (base ++ delta).toSet)
  }

  test("a legacy unbucketed activity table refreshes without schema drift, staying legacy") {
    val st = freshStorage()
    val base = Seq((1L, 10L), (2L, 11L))
    st.putVersioned("events", evFrame(base))
    // hand-build the PRE-BUCKETING layout: 2-column activity table,
    // ledger, pointer — what a warehouse written by the previous
    // release holds
    val act = base.toDF("user_id", "day")
    val va = st.putVersioned("gl__act", act)
    val vl = st.putVersioned("gl__ledger",
      graft.operators.EventAnalytics.growthAccounting(act))
    st.putVersioned("gl__gl",
      Seq((va, vl, st.versions("events").last))
        .toDF("act_version", "ledger_version", "events_version"))
    val delta = Seq((1L, 12L), (3L, 13L))
    st.appendVersioned("events", evFrame(delta))
    // the refresh must read the legacy layout (no bucket prune) AND
    // append in the legacy layout (a bucket column would trip the
    // append schema gate and wedge every nightly refresh)
    Events.refreshGrowthLedger(st, "events", "gl")
    assert(ledgerRows(Events.readGrowthLedger(st, "gl"))
      === fromScratch(base ++ delta))
    assert(st.readVersioned("gl__act").columns.toSeq
      === Seq("user_id", "day"),
      "appends onto a legacy table must keep its layout")
  }

  test("the affected-user history read is bucket-pruned: bucket IN (…) reaches the parquet scan") {
    val st = freshStorage()
    // users spread across the bucket space, one day each
    val base = (1L to 200L).map(u => (u, 10L))
    st.putVersioned("events", evFrame(base))
    Events.buildGrowthLedger(st, "events", "gl")
    val va = st.readVersioned("gl__gl").collect()(0)
      .getAs[Long]("act_version")
    // a concentrated delta (one user) touches exactly one bucket
    val affected = Seq(7L).toDF("user_id")
    val read = Events.affectedActivity(st, "gl", va, affected)
    val p = read.queryExecution
      .explainString(org.apache.spark.sql.execution.SimpleMode)
    // a single-bucket set collapses In(bucket, …) to EqualTo(bucket, b)
    assert(p.contains("In(bucket") || p.contains("EqualTo(bucket"),
      "the bucket prune must reach the parquet scan as a pushed " +
        "filter:\n" + p)
    assert(read.columns.toSeq === Seq("user_id", "day"),
      "the layout column must not leak into the relational surface")
    // the prune is an optimization, never a semantics change: rows
    // equal the unpruned semi-join
    val full = st.readVersioned("gl__act", va).drop("bucket")
      .join(affected, Seq("user_id"), "left_semi")
    assert(read.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === full.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(read.count() === 1L)
  }

  test("describeIndexes reports the ledger family with consumed-vs-head lag") {
    val st = freshStorage()
    st.putVersioned("events", evFrame(Seq((1L, 10L))))
    Events.buildGrowthLedger(st, "events", "gl")
    def desc() = Corpus.describeIndexes(st, Map("gl" -> "events"))
      .collect().filter(_.getString(1) == "ledger")
      .map(r => r.getString(3) -> r).toMap
    val d0 = desc()
    assert(d0.keySet === Set("activity", "ledger", "events"))
    assert(d0("events").getLong(7) === 0L, "freshly built: lag 0")
    st.appendVersioned("events", evFrame(Seq((2L, 11L))))
    assert(desc()("events").getLong(7) === 1L, "one unconsumed version")
    Events.refreshGrowthLedger(st, "events", "gl")
    assert(desc()("events").getLong(7) === 0L, "refresh catches up")
  }

  test("vacuum keeps what retained pointers pin; the served ledger survives") {
    val st = freshStorage()
    st.putVersioned("events", evFrame(Seq((1L, 10L))))
    Events.buildGrowthLedger(st, "events", "gl")
    st.appendVersioned("events", evFrame(Seq((1L, 11L), (2L, 11L))))
    Events.refreshGrowthLedger(st, "events", "gl")
    st.appendVersioned("events", evFrame(Seq((2L, 13L))))
    Events.refreshGrowthLedger(st, "events", "gl")
    val before = st.versions("gl__ledger").length
    val (dirs, _) = Events.vacuumGrowthLedger(st, "gl", keepLastPointers = 1)
    assert(dirs > 0, "superseded ledger/activity versions must free")
    assert(st.versions("gl__gl").length === 1)
    assert(st.versions("gl__ledger").length < before)
    assert(ledgerRows(Events.readGrowthLedger(st, "gl")) === fromScratch(
      Seq((1L, 10L), (1L, 11L), (2L, 11L), (2L, 13L))))
  }
}
