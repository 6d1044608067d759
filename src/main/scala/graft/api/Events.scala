package graft.api

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.operators.{AsOfJoin, EventAnalytics}
import graft.streaming.{DocStreams, EventStreams}

/** DataFrame/Dataset-first event-stream API: the engine's temporal
  * operators over ANY frames with the right columns, batch or
  * streaming. Thin, documented delegates to the same cores the gated
  * queries run — no second implementation.
  */
object Events {

  /** As-of (nearest-prior) join: for every probe row, attach the build
    * row with the greatest `buildTs <= probeTs` within the same key
    * (inner semantics). One shuffle on the key, one per-group sort, no
    * range explosion — see [[graft.operators.AsOfJoin.join]].
    */
  def asOfJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, probeTs: String, buildTs: String): DataFrame =
    AsOfJoin.join(probe, build, probeKey, buildKey, probeTs, buildTs)

  /** The same as-of join through the custom sorted-merge physical
    * operator ([[graft.plans.AsOf.join]]): two co-partitioned sorted
    * children and one merge pass — no union padding; output columns are
    * flat `probe ++ build` instead of an `asof` struct.
    */
  def asOfJoinMerge(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, probeTs: String, buildTs: String): DataFrame =
    graft.plans.AsOf.join(probe, build, probeKey, buildKey, probeTs, buildTs)

  /** Batch sessionization (30-min gap) of a typed event Dataset —
    * [[graft.streaming.EventStreams.sessionize]].
    */
  def sessionize(events: Dataset[EventStreams.Event])
      : Dataset[EventStreams.SessionOut] =
    EventStreams.sessionize(events)

  /** STREAMING sessionizer with event-time timeouts (open sessions
    * merge across micro-batches, emit when the watermark passes
    * end+gap) — [[graft.streaming.EventStreams.sessionizeStream]].
    */
  def sessionizeStream(events: Dataset[EventStreams.EventWithTs])
      : Dataset[EventStreams.SessionOut] =
    EventStreams.sessionizeStream(events)

  /** Watermark-bounded streaming exact dedup on `event_id` —
    * [[graft.streaming.EventStreams.streamingDedup]].
    */
  def streamingDedup(events: DataFrame): DataFrame =
    EventStreams.streamingDedup(events)

  /** Watermark-bounded streaming NEAR-dup dedup of a `(doc_id, text,
    * ts)` document stream via one MinHash band —
    * [[graft.streaming.DocStreams.streamingNearDup]]; the 16-band voted
    * verdict variant is
    * [[graft.streaming.DocStreams.streamingNearDupVoted]].
    */
  def streamingNearDup(docs: DataFrame): DataFrame =
    DocStreams.streamingNearDup(docs)

  /** Streaming as-of enrichment (latest same-user view at-or-before
    * each purchase, 1-hour lookback): stream-stream interval join
    * chained into a windowed max_by; batch frames give the same rows —
    * [[graft.streaming.EventStreams.latestViewBeforePurchase]].
    */
  def latestViewBeforePurchase(events: DataFrame): DataFrame =
    EventStreams.latestViewBeforePurchase(events)

  /** LEFT OUTER stream-stream interval join: every purchase appears,
    * with null view columns when its 1-hour lookback holds no same-user
    * view — unmatched rows emit once the watermark proves no match can
    * arrive. [[graft.streaming.EventStreams.purchaseViewJoinOuter]];
    * the inner form backs the gated join queries.
    */
  def purchaseViewJoinOuter(events: DataFrame): DataFrame =
    EventStreams.purchaseViewJoinOuter(events)

  /** CDC latest-by-key compaction (batch): one row per `key` holding
    * the lexicographic max of `cols` — put the event-time / version
    * columns first with a unique tiebreaker; trailing payload columns
    * ride along. Map-side partial max, one shuffle on the key —
    * [[graft.streaming.EventStreams.latestByKey]].
    */
  def latestByKey(df: DataFrame, key: String, cols: Seq[String]): DataFrame =
    EventStreams.latestByKey(df, key, cols)

  /** Continuously-maintained CDC snapshot: one state row per key holding
    * the latest event by (ts, id); update-mode re-emission on every
    * touched key — [[graft.streaming.EventStreams.latestByKeyStream]].
    * The batch aggregate form is the gated `st_latest_by_key`.
    */
  def latestByKeyStream(events: Dataset[EventStreams.Event])
      : Dataset[EventStreams.LatestOut] =
    EventStreams.latestByKeyStream(events)

  /** Per-user ordered-funnel depth over an arbitrary stage list
    * (chained running-window minima; the whole funnel must complete
    * within `horizonUs` of the user's first anchor event). Input needs
    * (user_id, event_type, ts_us, event_id); one shuffle on user_id —
    * [[graft.operators.EventAnalytics.funnelDepths]]. The gated 3-stage
    * histogram is `ev_funnel`.
    */
  def funnelDepths(events: DataFrame, stages: Seq[String],
      horizonUs: Long = EventAnalytics.FunnelHorizonUs): DataFrame =
    EventAnalytics.funnelDepths(events, stages, horizonUs)

  /** Cohort-retention triangle over `(user_id, day)` rows: users
    * grouped by first-activity day, counted on each later active day —
    * [[graft.operators.EventAnalytics.retentionTriangle]]. The gated
    * form is `ev_retention`.
    */
  def retentionTriangle(events: DataFrame): DataFrame =
    EventAnalytics.retentionTriangle(events)

  /** Hourly rate anomalies over `(event_type, ts_s)` rows: each hour's
    * count z-scored against its trailing 24 clock-hours, flagged at
    * |z| ≥ `zThresh` in exact integer arithmetic —
    * [[graft.operators.EventAnalytics.rateAnomalies]]. Gated form:
    * `ev_anomaly`.
    */
  def rateAnomalies(events: DataFrame,
      minPrev: Long = EventAnalytics.AnomalyMinPrev,
      zThresh: Long = EventAnalytics.AnomalyZ): DataFrame =
    EventAnalytics.rateAnomalies(events, minPrev, zThresh)

  /** Last-touch conversion attribution over `(user_id, event_type,
    * event_id, value, ts_us)` rows: each `convType` event credits the
    * user's most recent preceding touch within `horizonUs`, else
    * `direct`; one channel row with conversions, distinct buyers, and
    * revenue in integer cents —
    * [[graft.operators.EventAnalytics.lastTouchAttribution]]. Gated
    * form: `ev_attribution`.
    */
  def lastTouchAttribution(events: DataFrame,
      touchTypes: Seq[String] = EventAnalytics.TouchTypes,
      convType: String = "purchase",
      horizonUs: Long = EventAnalytics.AttributionHorizonUs): DataFrame =
    EventAnalytics.lastTouchAttribution(events, touchTypes, convType, horizonUs)

  /** STREAMING last-touch attribution: each conversion emits exactly
    * once — when the watermark passes its event time, at which point no
    * in-watermark touch can change the answer — with the same channel
    * the batch [[graft.operators.EventAnalytics.attributedPurchases]]
    * assigns. State per user is watermark-bounded (pending conversions
    * + in-flight touches collapsed behind the watermark) —
    * [[graft.streaming.EventStreams.attributionStream]].
    */
  def attributionStream(events: Dataset[EventStreams.EventWithTs],
      touchTypes: Seq[String] = EventAnalytics.TouchTypes,
      convType: String = "purchase",
      horizonNs: Long = EventAnalytics.AttributionHorizonUs * 1000L)
      : Dataset[EventStreams.AttrOut] =
    EventStreams.attributionStream(events, touchTypes, convType, horizonNs)

  /** First-order event-type transition matrix over `(user_id,
    * event_type, event_id, ts_us)` rows: per-user consecutive pairs
    * counted into `(from_type, to_type, n, n_from, p)` —
    * [[graft.operators.EventAnalytics.transitionMatrix]]. Gated form:
    * `ev_markov`.
    */
  def transitionMatrix(events: DataFrame): DataFrame =
    EventAnalytics.transitionMatrix(events)

  /** Top-k most-traveled length-3 event-type paths (user journeys)
    * over the same input shape —
    * [[graft.operators.EventAnalytics.topPaths]]. Gated form:
    * `ev_path`.
    */
  def topPaths(events: DataFrame,
      k: Int = EventAnalytics.PathTopK): DataFrame =
    EventAnalytics.topPaths(events, k)

  /** STREAMING anomaly scoring: watermarked hourly counts per event
    * type scored statelessly against a broadcast static baseline
    * (train the baseline batch-side with
    * [[graft.streaming.EventStreams.hourlyBaseline]] over history).
    * Same exact-integer z as [[rateAnomalies]]; batch twin gated as
    * `st_anomaly`.
    */
  def anomalyScoreStream(events: DataFrame, baseline: DataFrame,
      zThresh: Long = EventAnalytics.AnomalyZ): DataFrame =
    EventStreams.anomalyScoreStream(events, baseline, zThresh)

  /** STREAMING funnel: per-user depth emitted exactly when the
    * watermark proves the conversion window closed (event-time
    * timeout); state is one anchor + the still-qualifiable stage
    * events, watermark-bounded —
    * [[graft.streaming.EventStreams.funnelStream]].
    *
    * Pre-anchor eras are SILENT (no depth-0 rows): a user emits
    * exactly one row — the anchored era's depth, always ≥ 1 — so
    * append-mode consumers can count rows directly, matching
    * [[funnelDepths]] for every ANCHORED user whose events the
    * watermark admits. Users whose events never anchor emit nothing
    * (their depth 0 is only decidable at stream end; the batch form
    * reports them). A second anchor arriving more than a horizon
    * after the first era closed opens a fresh era and emits again —
    * bounded state cannot remember all past anchors.
    */
  def funnelStream(events: Dataset[EventStreams.EventWithTs],
      stages: Seq[String], horizonNs: Long)
      : Dataset[EventStreams.FunnelOut] =
    EventStreams.funnelStream(events, stages, horizonNs)
}
