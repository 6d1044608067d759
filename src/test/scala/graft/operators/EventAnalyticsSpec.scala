package graft.operators

import graft.SparkTestBase

/** Intent tests for the funnel/retention cores on hand-built event
  * sets — the DuckDB oracle certifies cross-engine equivalence of the
  * gated queries; these pin the SEMANTICS (ordering, horizon, repeat
  * visits) against hand-derived answers.
  */
class EventAnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private val H = 1000L // 1 ms horizon, timestamps in plain integers

  private def depths(rows: Seq[(Long, String, Long)],
      stages: Seq[String] = Seq("view", "click", "purchase")):
      Map[Long, Int] =
    EventAnalytics.funnelDepths(
      rows.zipWithIndex
        .map { case ((u, t, ts), i) => (u, t, ts, i.toLong) }
        .toDF("user_id", "event_type", "ts_us", "event_id"),
      stages, H)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("funnel counts only in-order stage sequences") {
    val d = depths(Seq(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      // user 2: purchase BEFORE the view/click chain — depth stops at 2
      (2L, "purchase", 50L), (2L, "view", 100L), (2L, "click", 200L),
      // user 3: click precedes the first view — only the view counts
      (3L, "click", 100L), (3L, "view", 200L),
      // user 4: no funnel events at all
      (4L, "error", 100L)))
    assert(d == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0))
  }

  test("funnel horizon: stages past the anchor window don't convert") {
    val d = depths(Seq(
      // click inside the horizon, purchase outside it → depth 2
      (1L, "view", 0L), (1L, "click", 500L), (1L, "purchase", 5000L),
      // whole chain inside → depth 3
      (2L, "view", 0L), (2L, "click", 400L), (2L, "purchase", 900L),
      // horizon anchors at the FIRST view: a later view does not re-arm
      (3L, "view", 0L), (3L, "view", 4800L), (3L, "click", 5000L)))
    assert(d == Map(1L -> 2, 2L -> 3, 3L -> 1))
  }

  test("funnel generalizes to more stages") {
    val d = depths(Seq(
      (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L), (1L, "d", 40L),
      // missing middle stage caps the depth
      (2L, "a", 10L), (2L, "c", 30L), (2L, "d", 40L)),
      stages = Seq("a", "b", "c", "d"))
    assert(d == Map(1L -> 4, 2L -> 1))
  }

  test("retention triangle counts distinct users per cohort/offset") {
    val tri = EventAnalytics.retentionTriangle(Seq(
      // cohort day 10: users 1, 2; user 1 returns day 11 twice (counted
      // once), user 2 returns day 12
      (1L, 10L), (1L, 11L), (1L, 11L), (2L, 10L), (2L, 12L),
      // cohort day 11: user 3 only ever active once
      (3L, 11L)).toDF("user_id", "day"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(tri == Map(
      (10L, 0L) -> 2L, (10L, 1L) -> 1L, (10L, 2L) -> 1L, (11L, 0L) -> 1L))
  }

  test("rate anomalies: a burst flags, warmup and steady noise do not") {
    // 30 hours of one event per hour... except hour 20 bursts to 40
    // events and hour 25 has two (deviation from a then-constant base)
    def nAt(h: Int) = if (h == 20) 40 else if (h == 25) 2 else 1
    val ev = (0 until 30).flatMap { h =>
      (0 until nAt(h)).map(i => ("click", h * 3600L + i))
    }.toDF("event_type", "ts_s")
    val rows = EventAnalytics.rateAnomalies(ev).collect()
      .map(r => r.getLong(1) / 3600 -> ((r.getLong(3), r.getBoolean(7),
        Option(r.get(6)).map(_.asInstanceOf[Double])))).toMap
    assert(rows.size == 30)
    // warmup: first AnomalyMinPrev hours can never flag
    (0 until EventAnalytics.AnomalyMinPrev.toInt).foreach { h =>
      assert(!rows(h.toLong)._2, s"hour $h flagged during warmup")
    }
    // steady constant baseline: zero variance, zero deviation, no flag
    assert(!rows(15L)._2 && rows(15L)._3.isEmpty)
    // the burst: trailing window is all-constant, any deviation flags
    assert(rows(20L)._2)
    // hour 25's trail contains the burst hour, variance is huge: 2 vs
    // mean ~4.25 is nowhere near 3 sigma
    assert(!rows(25L)._2)
    // hour 21+ judge against a trail CONTAINING the burst — sanity:
    // count 1 with one 40 in the trail stays within 3 sigma
    assert(!rows(21L)._2)
  }

  test("lastTouchAttribution: credits the last in-horizon touch, else direct") {
    val h = 3600L * 1000000 // one hour in µs
    val ev = Seq(
      // user 1: view then an in-horizon purchase, then one 26h later
      (1L, "view", 1L, 0.0, 0L),
      (1L, "purchase", 2L, 10.5, 1 * h),
      (1L, "purchase", 3L, 5.0, 26 * h),
      // user 2: click superseded by a later view
      (2L, "click", 4L, 0.0, 0L),
      (2L, "view", 5L, 0.0, 1000L),
      (2L, "purchase", 6L, 3.2, 2000L),
      // user 3: no touch at all
      (3L, "purchase", 7L, 7.0, 0L),
      // user 4: two purchases off one click (click outranks older view)
      (4L, "view", 8L, 0.0, 0L),
      (4L, "click", 9L, 0.0, 10L),
      (4L, "purchase", 10L, 1.0, 20L),
      (4L, "purchase", 11L, 2.0, 30L))
      .toDF("user_id", "event_type", "event_id", "value", "ts_us")
    val out = EventAnalytics.lastTouchAttribution(ev).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // floor(3.2*100) = 320 (the double product is 320.0000...06)
    assert(out("view") === ((2L, 2L, 1050L + 320L)))
    assert(out("direct") === ((2L, 2L, 500L + 700L)),
      "the 26h-stale view and the touchless user both fall to direct")
    assert(out("click") === ((2L, 1L, 100L + 200L)))
    assert(out.keySet === Set("view", "direct", "click"))
  }

  test("topPaths: trigram journeys, counted across users, never across a user boundary") {
    val ev = Seq(
      (1L, "a", 1L, 10L), (1L, "b", 2L, 20L), (1L, "c", 3L, 30L),
      (1L, "d", 4L, 40L),
      (2L, "a", 5L, 5L), (2L, "b", 6L, 6L), (2L, "c", 7L, 7L))
      .toDF("user_id", "event_type", "event_id", "ts_us")
    val out = EventAnalytics.topPaths(ev).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((1, "a>b>c", 2L), (2, "b>c>d", 1L)),
      "a>b>c seen by both users; no path crosses from user 1 into user 2")
  }

  test("transitionMatrix: per-user consecutive pairs, rows sum to probability 1") {
    // user 1: a -> b -> a;  user 2: a -> b   (no cross-user pair 'a after b of u1')
    val ev = Seq(
      (1L, "a", 1L, 10L), (1L, "b", 2L, 20L), (1L, "a", 3L, 30L),
      (2L, "a", 4L, 5L), (2L, "b", 5L, 6L))
      .toDF("user_id", "event_type", "event_id", "ts_us")
    val out = EventAnalytics.transitionMatrix(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(("a", "b")) === ((2L, 2L, 1.0)))
    assert(out(("b", "a")) === ((1L, 1L, 1.0)))
    assert(out.size === 2, "no transition crosses a user boundary")

    // corpus sanity: each from-row's probabilities sum to 1
    val m = EventAnalytics.evMarkov(spark, sf0001).collect()
    val byFrom = m.groupBy(_.getString(0))
    byFrom.foreach { case (f, rows) =>
      val pSum = rows.map(_.getDouble(4)).sum
      assert(math.abs(pSum - 1.0) < 1e-9, s"from $f: p sums to $pSum")
      assert(rows.map(_.getLong(2)).sum === rows.head.getLong(3))
    }
  }

  test("scd2: same-value runs collapse, changes open intervals, open interval is current") {
    val ev = Seq(
      // user 1: view,view,click,view — the repeated view must NOT
      // fragment (real SCD2: only a CHANGE opens an interval), and the
      // final view is a NEW interval (value returned after a change)
      (1L, "view", 1L, 100L), (1L, "view", 2L, 200L),
      (1L, "click", 3L, 300L), (1L, "view", 4L, 400L),
      // user 2: a single event is one open interval
      (2L, "error", 5L, 50L))
      .toDF("user_id", "event_type", "event_id", "ts_us")
    val out = EventAnalytics.scd2Intervals(ev)
      .orderBy("user_id", "valid_from_us").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4),
        r.getBoolean(5)))
    assert(out.toSeq === Seq(
      (1L, "view", 100L, 300L, 2L, false),
      (1L, "click", 300L, 400L, 1L, false),
      (1L, "view", 400L, -1L, 1L, true),
      (2L, "error", 50L, -1L, 1L, true)))
  }

  test("growthAccounting: new/retained/resurrected/churned on a hand ledger") {
    // user 1: days 10, 11, 13   (new@10, retained@11, churn@12, resurrected@13, churn@14)
    // user 2: day 11 only       (new@11, churn@12)
    // duplicate activity rows must not double-count
    val out = EventAnalytics.growthAccounting(Seq(
      (1L, 10L), (1L, 10L), (1L, 11L), (1L, 13L), (2L, 11L))
      .toDF("user_id", "day"))
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      //  day active new retained resurrected churned
      (10L, 1L, 1L, 0L, 0L, 0L),
      (11L, 2L, 1L, 1L, 0L, 0L),
      (12L, 0L, 0L, 0L, 0L, 2L),
      (13L, 1L, 0L, 0L, 1L, 0L),
      (14L, 0L, 0L, 0L, 0L, 1L)))
  }

  test("growth ledger on the corpus: the accounting identity holds every day") {
    val rows = EventAnalytics.evLifecycle(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (d, (active, nu, ret, res, chu)) =>
      val prevActive = rows.get(d - 1).map(_._1).getOrElse(0L)
      assert(active === prevActive + nu + res - chu,
        s"day $d: $active != $prevActive + $nu + $res - $chu")
      assert(active === nu + ret + res, s"day $d: statuses must tile actives")
    }
    // every user is new exactly once, so new sums to the user count
    val nUsers = graft.sources.Tables.events(spark, sf0001)
      .select("user_id").distinct().count()
    assert(rows.values.map(_._2).sum === nUsers)
  }

  test("slidingActives: trailing-window distinct matches brute force") {
    // user 1 active days 10,11; user 2 day 12; user 3 day 20 (isolated)
    val act = Seq((1L, 10L), (1L, 11L), (1L, 11L), (2L, 12L), (3L, 20L))
    val out = EventAnalytics.slidingActives(
      act.toDF("user_id", "day"), windowDays = 3)
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // brute force: wau(d) = distinct users with an active day in [d-2, d]
    val dedup = act.distinct
    def brute(d: Long) =
      dedup.filter { case (_, ad) => ad >= d - 2 && ad <= d }.map(_._1)
        .distinct.size.toLong
    val expected = dedup.map(_._2).distinct.sorted.map { d =>
      val dau = dedup.count(_._2 == d).toLong
      (d, dau, brute(d), dau.toDouble / brute(d))
    }
    assert(out.toSeq === expected,
      "only days with actual activity appear; wau is the 3-day trailing distinct")
    assert(out.map(_._1).toSeq === Seq(10L, 11L, 12L, 20L))
    assert(out.find(_._1 == 12L).get._3 === 2L,
      "day 12's trailing window sees users 1 and 2 — user 1 counted once")
  }

  test("stickiness on the corpus: dau <= wau, ratio in (0,1], window exact") {
    val rows = EventAnalytics.evStickiness(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val act = graft.sources.Tables.events(spark, sf0001)
      .selectExpr("user_id", "(ts_ns DIV 1000) DIV 86400000000 AS day")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.foreach { case (d, dau, wau, st) =>
      assert(dau >= 1L && dau <= wau, s"day $d: dau $dau > wau $wau")
      assert(st > 0.0 && st <= 1.0)
      val bruteWau =
        act.filter(a => a._2 >= d - 6 && a._2 <= d).map(_._1).distinct.length
      assert(wau === bruteWau.toLong, s"day $d: wau $wau != brute $bruteWau")
    }
  }

  test("stickiness HLL arm: estimates in bounds, exact columns identical to the exact arm") {
    val exact = EventAnalytics.evStickiness(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val hll = EventAnalytics.evStickinessHll(spark, sf0001).collect()
    assert(hll.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      === exact.toSeq,
      "the sketch arm must carry the exact ledger unchanged")
    hll.foreach(r => assert(r.getBoolean(4),
      s"day ${r.getLong(0)}: HLL estimate outside the certified bound"))
    // estimate QUALITY is pinned here, at the FIXED corpus, to the
    // tighter 3-sigma bound the gated row used to certify in-plan
    // (the gate itself now asserts ~6 sigma so it cannot flake on new
    // corpora — a fixed dataset either passes 3 sigma forever or not)
    import org.apache.spark.sql.functions._
    val est = graft.sources.Tables.events(spark, sf0001)
      .selectExpr("user_id", "(ts_ns DIV 1000) DIV 86400000000 AS day")
      .distinct()
      .groupBy(col("day")).agg(hll_sketch_agg(col("user_id")).as("sk"))
      .select(col("sk"),
        explode(sequence(col("day"), col("day") + 6)).as("day"))
      .groupBy(col("day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("wau_est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (d, _, wau, _) =>
      val e = est(d)
      assert(math.abs(e - wau) * 100 <= 5 * wau + 100,
        s"day $d: estimate $e drifted past 3 sigma of exact $wau")
    }
  }

  test("scd2 on the corpus: intervals tile each user's history exactly") {
    val rows = EventAnalytics.evScd2(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) Long.MaxValue else r.getLong(3), r.getLong(4),
        r.getBoolean(5)))
    val byUser = rows.groupBy(_._1)
    val evCounts = graft.sources.Tables.events(spark, sf0001)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byUser.keySet === evCounts.keySet)
    byUser.foreach { case (u, ivs) =>
      val sorted = ivs.sortBy(_._2)
      // contiguous: each interval closes exactly where the next opens
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 === b._2,
          s"user $u: interval ending ${a._3} != next start ${b._2}")
        case _ =>
      }
      // exactly one open (current) interval per user, and it is the last
      assert(ivs.count(_._5) === 1, s"user $u: one current interval")
      assert(sorted.last._5 && sorted.last._3 === Long.MaxValue)
      // every event is accounted for in exactly one interval
      assert(sorted.map(_._4).sum === evCounts(u),
        s"user $u: n_events must sum to the changelog length")
    }
  }
}
