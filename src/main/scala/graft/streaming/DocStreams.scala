package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.functions.{tokens, MinHashSig, WordShingleHashesExpr, WordShinglesExpr}
import graft.operators.{Pii, Pipeline, TextAnalysis}

/** Streaming operators over a document stream (`doc_id`, `text`, `ts`)
  * — the continuous-ingestion face of the batch dedup family in
  * [[graft.operators.Dedup]].
  *
  * The reference has no streaming at all (SURVEY.md §2e); this module
  * extends the corpus pipeline to arriving data: new documents dedup
  * against everything seen within the event-time horizon, with state
  * bounded by the watermark, not the stream length.
  */
object DocStreams {

  /** Rows of the dedup band: the first `BandRows` rows of the 64-row
    * MinHash signature form the bucket key.
    */
  val BandRows = 4

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts", TimestampType)))

  val ingestSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("ts", TimestampType)))

  val IngestWindowSec = 600L

  /** Streaming corpus ingestion: the continuous form of the batch
    * [[graft.operators.Pipeline.pipeE2e]] assembly — PII scrub first
    * ([[Pii.redacted]], stateless, so nothing downstream of ingest
    * ever sees a raw entity; identity on PII-free text, which is why
    * the batch oracle needs no mirror), then quality filter
    * (same [[TextAnalysis.qualityScore]] formula and threshold), exact
    * prefix-fingerprint dedup against everything inside the watermark
    * horizon (`dropDuplicatesWithinWatermark`: one state entry per
    * distinct in-horizon fingerprint, evicted with the watermark), then
    * context-window chunking (same [[Pipeline]] chunk geometry) and
    * per-(tumbling-window, lang) corpus stats, emitted once the
    * watermark closes each window.
    *
    * Two chained stateful operators (dedup → windowed agg) — a
    * supported chain in Spark 4's multi-stateful-operator model since
    * both run on event time with the same watermark. `n_docs` counts
    * chunk 0 of each kept doc instead of `countDistinct` (unsupported
    * in streaming) — every kept doc emits exactly one chunk 0.
    * The batch form (first-arrival dedup, windows all emit) matches
    * streaming ONLY for duplicates within one watermark horizon of
    * each other: streaming evicts a fingerprint when the watermark
    * passes it and re-admits a later copy, while batch dedups
    * globally (keeping the min-(ts, doc_id) member — the deterministic
    * analog of streaming's first arrival). Batch-vs-stream comparisons
    * therefore need duplicates arriving within one horizon — the
    * spec's fixture does.
    */
  def ingestPipeline(docs: DataFrame): DataFrame = {
    val toksCol = tokens(col("text"))
    val fp = md5(concat_ws(" ", slice(toksCol, 1, 10)))
    val filtered = docs
      .withColumn("text", Pii.redacted(col("text")))
      .withWatermark("ts", "1 hour")
      .filter(size(toksCol) > 0 &&
        TextAnalysis.qualityScore(toksCol) >= Pipeline.QualityMin)
      .select(col("doc_id"), col("lang"), col("ts"),
        toksCol.as("t"), fp.as("fp"))
    // batch twin: FIRST-ARRIVAL survivor per fingerprint (min (ts,
    // doc_id) — the deterministic analog of streaming's first-seen
    // rule, where dropDuplicates would keep an arbitrary member), as a
    // partial-aggregated struct-min so a mega-duplicate group never
    // lands in one task
    val deduped =
      if (filtered.isStreaming) filtered.dropDuplicatesWithinWatermark("fp")
      else filtered
        .groupBy(col("fp"))
        .agg(min(struct(col("ts"), col("doc_id"), col("lang"), col("t")))
          .as("k"))
        .select(col("k.doc_id").as("doc_id"), col("k.lang").as("lang"),
          col("k.ts").as("ts"), col("k.t").as("t"))
    deduped
      .withColumn("chunk_idx", Pipeline.chunkIdxCol("t"))
      .select(col("lang"), col("ts"), col("chunk_idx"),
        size(Pipeline.chunkSliceCol("t", col("chunk_idx"))).as("chunk_tokens"))
      .groupBy(window(col("ts"), s"$IngestWindowSec seconds"), col("lang"))
      .agg(
        sum(when(col("chunk_idx") === 0, 1L).otherwise(0L)).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("chunk_tokens").cast(LongType)).as("sum_chunk_tokens"))
      .select(unix_timestamp(col("window.start")).as("win_start_s"),
        col("lang"), col("n_docs"), col("n_chunks"), col("sum_chunk_tokens"))
  }

  private val bandCols = (0 until BandRows).map(i => s"__b$i")

  /** Streaming near-dup dedup via one MinHash LSH band: a document is
    * DROPPED when a document with the identical band signature arrived
    * within the watermark horizon — one stateful operator
    * (`dropDuplicatesWithinWatermark` on the band columns), state = one
    * entry per distinct in-horizon band key, evicted as the watermark
    * passes.
    *
    * Semantics: exact duplicates always share the band; a near-dup pair
    * with shingle-Jaccard j collides with probability j^r (r=4: 0.66 at
    * j=0.9, 0.96 at j=0.99). The batch 16-band union (`dd_minhash_lsh`)
    * gets ~0.99 at j=0.8 but needs a per-band vote — a second stateful
    * aggregation downstream of the first, which Structured Streaming
    * does not admit in one query; the single-band form trades recall
    * for a plan with ONE bounded state store. Documents too short to
    * shingle (< 3 tokens) bypass the dedup unfiltered (their degenerate
    * signature would otherwise collapse them all into one bucket).
    *
    * Works identically on a batch frame (plain `dropDuplicates`), which
    * is how the spec oracles it.
    */
  def streamingNearDup(docs: DataFrame): DataFrame = {
    // null text → empty string → no shingles → the bypass branch (a
    // bare null would satisfy NEITHER size predicate and silently
    // vanish from the output)
    val withSh = docs
      .withWatermark("ts", "1 hour")
      .withColumn("__sh",
        WordShinglesExpr.wordShinglesNative(
          coalesce(col("text"), lit("")), 3))
    val shingled = withSh.filter(size(col("__sh")) > 0)
    val sigCols = {
      val sig = MinHashSig.minhashSig(col("__sh"))
      bandCols.zipWithIndex.map { case (name, i) =>
        element_at(sig, i + 1).as(name)
      }
    }
    val keyed = shingled.select(
      col("doc_id") +: col("text") +: col("ts") +: sigCols: _*)
    val deduped =
      if (keyed.isStreaming)
        keyed.dropDuplicatesWithinWatermark(bandCols)
      else keyed.dropDuplicates(bandCols)
    deduped.select(col("doc_id"), col("text"), col("ts"))
      .unionByName(
        withSh.filter(size(col("__sh")) === 0)
          .select(col("doc_id"), col("text"), col("ts")))
  }

  /** Per-window heavy-hitter terms over the document stream: the
    * space-saving sketch ([[graft.functions.SpaceSavingTopK]]) as a
    * watermarked event-time window aggregation — its partials live in
    * the streaming state store (≤ `k` counters per open window, NOT
    * the window's vocabulary), merge across micro-batches by the
    * mergeable-summaries rule, and each window's sketch emits once the
    * watermark closes it. One row per (window, counter):
    * `(win_start_s, term, est, err)`, est desc within a window. Works
    * identically on a batch frame (windows all emit) — with capacity
    * above the window's vocabulary both modes are the exact wordcount,
    * which is how the spec pins streaming == batch without
    * arrival-order variance.
    */
  def windowedHeavyHitters(docs: DataFrame,
      k: Int = graft.operators.HeavyHitters.Capacity): DataFrame =
    graft.functions.SpaceSaving.unpacked(
      docs
        .withWatermark("ts", "1 hour")
        .select(col("ts"), explode(tokens(col("text"))).as("term"))
        .groupBy(window(col("ts"), s"$IngestWindowSec seconds"))
        .agg(graft.functions.SpaceSaving.topK(col("term"), k).as("sk"))
        .select(unix_timestamp(col("window.start")).as("win_start_s"),
          col("sk")),
      "win_start_s")

  /** Streaming decontamination: eval documents arrive as a stream and
    * are checked against a STATIC train corpus — the nightly-eval-
    * against-frozen-training-snapshot shape. The train side collapses
    * once to its distinct 8-gram shingle-hash set; each arriving doc
    * explodes to its per-doc-distinct hashes (`array_distinct` on the
    * hash array — map-side, replacing the batch form's post-explode
    * distinct shuffle), left-joins the train set (stream-STATIC joins
    * are stateless — no watermark state for the join), and a windowed
    * per-doc aggregation reassembles `contamination = hits/shingles`
    * once the watermark closes the window. Same hash family and gram
    * width as the oracle-gated [[graft.operators.Pipeline.contamination]];
    * the spec runs both on the same rows. Docs too short to shingle
    * produce no rows (as in the batch form). Works identically on a
    * batch eval frame (windows all emit).
    */
  def streamingContamination(evalDocs: DataFrame, train: DataFrame,
      gram: Int = graft.operators.Pipeline.ContamGram): DataFrame = {
    val trainSh = train
      .select(explode(WordShingleHashesExpr
        .wordShingleHashesNative(col("text"), gram)).as("s"))
      .distinct()
      .withColumn("__hit", lit(1L))
    val evalSh = evalDocs
      .withWatermark("ts", "1 hour")
      .select(col("doc_id"), col("ts"),
        explode(array_distinct(WordShingleHashesExpr
          .wordShingleHashesNative(col("text"), gram))).as("s"))
    evalSh.join(trainSh, Seq("s"), "left")
      .groupBy(window(col("ts"), s"$IngestWindowSec seconds"), col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"))
      .select(unix_timestamp(col("window.start")).as("win_start_s"),
        col("doc_id"), col("n_shingles"), col("n_contaminated"),
        (col("n_contaminated").cast("double") / col("n_shingles"))
          .as("contamination"))
  }

  // ---------------------------------------------------------------------
  // Full 16-band voted near-dup — two chained stateful operators.
  // ---------------------------------------------------------------------

  val VoteBands = 16
  val VoteRowsPerBand: Int = MinHashSig.NumHashes / VoteBands
  val VoteHorizonMs: Long = 60L * 60 * 1000 // bucket lifetime: 1 hour
  val VoteWindowSec = 600L                  // verdict tumbling window

  final case class BandRow(doc_id: Long, ts: java.sql.Timestamp,
      band: Int, k0: Long, k1: Long, k2: Long, k3: Long)
  final case class BucketState(firstDoc: Long, lastMs: Long)
  final case class BandVerdict(doc_id: Long, ts: java.sql.Timestamp,
      dup: Boolean)

  /** Full-recall streaming near-dup: the 16-band MinHash LSH vote as ONE
    * streaming query with two chained stateful operators — legal because
    * `flatMapGroupsWithState` runs in Append mode (only update-mode
    * fMGWS is barred from downstream aggregation):
    *
    *   1. explode each doc into its 16 band keys (map-side);
    *   2. fMGWS keyed by (band, key rows): a bucket's state is the
    *      first-seen doc; every later arrival in that bucket emits a
    *      per-band dup verdict. `EventTimeTimeout` evicts buckets one
    *      horizon after their last sighting — state is bounded by the
    *      horizon, as in the batch LSH where the corpus is bounded;
    *   3. a watermarked tumbling-window aggregation ORs the 16 verdicts
    *      per doc (a doc's bands all travel in its own micro-batch, so
    *      the vote is complete within one window) and emits once the
    *      watermark passes the window.
    *
    * A doc is a near-dup iff ANY band bucket had seen a doc before it —
    * collision probability 1-(1-j^r)^16 (~0.99 at j=0.8, r=4), the same
    * union [[graft.operators.Dedup.ddMinhashLsh]] uses in batch. Docs
    * too short to shingle vote `dup = false` through a sentinel band -1
    * (their degenerate signature must not bucket them together).
    * Output: `(win_start_s, doc_id, is_dup)`. Works identically on a
    * batch frame (state starts empty per group; watermarks no-op),
    * which is how the spec oracles it.
    */
  def streamingNearDupVoted(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Spark's global-watermark correctness check conservatively rejects
    // ANY stateful op feeding another, because a state function COULD
    // emit rows older than the watermark (late for the downstream
    // store). This one cannot: every verdict carries the event time of
    // the row that produced it, in the same micro-batch the row was
    // admitted — so emissions are never below the watermark and the
    // downstream window aggregation never discards them.
    // NOTE: the flag is session-scoped (Spark has no per-query form) and
    // must still be false when the query STARTS, so it cannot be
    // save-restored here; calling this function opts the session into
    // chained-stateful queries — other streaming queries on the session
    // lose the analysis-time guard and must be validated on their own.
    spark.conf.set(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val horizonMs = VoteHorizonMs
    val sig = MinHashSig.minhashSig(
      WordShinglesExpr.wordShinglesNative(coalesce(col("text"), lit("")), 3))
    val withSig = docs.withWatermark("ts", "1 hour").withColumn("__sig", sig)
    // (band, r signature rows) per table; band -1 keys on doc_id so
    // short docs occupy singleton buckets (never dups, never colliding)
    val keyCols = (0 until VoteRowsPerBand).map(i =>
      when(col("band") >= 0,
        element_at(col("__sig"), col("band") * VoteRowsPerBand + i + 1))
        .otherwise(col("doc_id")).as(s"k$i"))
    val bands = withSig
      .select(col("doc_id"), col("ts"), col("__sig"),
        explode(
          when(size(expr("filter(__sig, x -> x != 9223372036854775807)")) === 0,
            array(lit(-1)))
            .otherwise(array((0 until VoteBands).map(lit(_)): _*))).as("band"))
      .select(col("doc_id") +: col("ts") +: col("band").cast("int").as("band") +: keyCols: _*)
      .as[BandRow]
    // plain Boolean: referencing the Dataset itself inside the state
    // function would capture it into the closure → Task not serializable
    val streaming = bands.isStreaming
    val verdicts = bands
      .groupByKey(r => (r.band, r.k0, r.k1, r.k2, r.k3))
      .flatMapGroupsWithState[BucketState, BandVerdict](
        OutputMode.Append,
        if (streaming) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (_: (Int, Long, Long, Long, Long), it: Iterator[BandRow],
            state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val rows = it.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            if (rows.isEmpty) Iterator.empty
            else {
              val out = scala.collection.mutable.ArrayBuffer[BandVerdict]()
              var st = state.getOption
              rows.foreach { r =>
                st match {
                  // horizon enforced IN the verdict, not only by lazy
                  // timeout eviction: a doc more than one horizon after
                  // the bucket's last sighting opens a fresh bucket, so
                  // the answer is a pure function of event times — not
                  // of which micro-batch happened to fire the timeout —
                  // and batch mode gets the same horizon semantics
                  case Some(s) if r.ts.getTime - s.lastMs <= horizonMs =>
                    out += BandVerdict(r.doc_id, r.ts, dup = true)
                    st = Some(s.copy(lastMs = math.max(s.lastMs, r.ts.getTime)))
                  case _ =>
                    out += BandVerdict(r.doc_id, r.ts, dup = false)
                    st = Some(BucketState(r.doc_id, r.ts.getTime))
                }
              }
              state.update(st.get)
              // timeouts exist only under EventTimeTimeout (streaming)
              if (streaming)
                state.setTimeoutTimestamp(st.get.lastMs + horizonMs)
              out.iterator
            }
          }
      }
    verdicts.toDF()
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), s"$VoteWindowSec seconds"), col("doc_id"))
      .agg(max(col("dup")).as("is_dup"))
      .select(unix_timestamp(col("window.start")).as("win_start_s"),
        col("doc_id"), col("is_dup"))
  }

  // ---------------------------------------------------------------------
  // Streaming BM25 serving — the lexical twin of VecStreams.annServe.
  // ---------------------------------------------------------------------

  val Bm25WindowSec = 600L

  /** Deterministic arrival epoch for the gated batch twin. */
  val Bm25ServeT0 = 1700000000L

  /** Streaming BM25 retrieval: a stream of text queries answered
    * against a STATIC corpus — the sparse-retrieval serving path next
    * to [[VecStreams.annServe]]'s dense one, with the same topology
    * (every stage before the one aggregation is STATELESS):
    *
    *  1. each arriving query tokenizes and explodes to its DISTINCT
    *     terms map-side;
    *  2. a stream-static equi-join on `term` attaches the corpus
    *     postings — `(term, doc_id, sc)` rows carrying the full
    *     per-(doc, term) BM25 score ([[TextAnalysis.bm25TermScore]],
    *     the ONE formula definition), precomputed on the static side
    *     exactly like a served inverted index (at scale the postings
    *     relation is materialized term-partitioned, the lexical analog
    *     of the checkpointed IVF lists);
    *  3. TWO chained watermarked tumbling-window aggregations (the
    *     multi-stateful-operator pattern): per-(window, query, doc)
    *     the term parts fold in TERM order inside a doc-sized array —
    *     the same pinned fold order as the batch
    *     [[TextAnalysis.bm25TopDocs]], so scores are bit-identical —
    *     then per-(window, query) a comparator sort by (score desc,
    *     doc_id) and `slice` keep the top k over ONE row per
    *     candidate. (A single aggregation merging per-doc runs inside
    *     one corpus-sized array was quadratic in candidates —
    *     SCALING.md records the measurement.) State the watermark
    *     evicts on both levels.
    *
    * Works identically on a batch frame (watermark no-ops, the window
    * still groups), which is how the gated twin oracles it. Output:
    * `(win_start_s, query_id, topk_ids)` — neighbor doc ids
    * comma-joined in rank order.
    */
  /** The static-side postings index of [[bm25Serve]]: `(term, doc_id,
    * sc)` rows carrying the full per-(doc, term) BM25 score — the
    * build artifact a serving deployment materializes ONCE
    * (term-partitioned at scale) and every query window joins against.
    */
  def bm25Postings(corpus: DataFrame): DataFrame = {
    val toksC = tokens(col("text"))
    val withDl = corpus.select(col("doc_id"), size(toksC).as("dl"),
      toksC.as("t"))
    val stats = withDl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tf = withDl
      .select(col("doc_id"), col("dl"), explode(col("t")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(max(col("dl")).as("dl"), count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // dl rides along (4th column, after the serve triple): the
    // persisted-hybrid save derives its frozen sum_dl from the
    // committed postings instead of re-tokenizing the corpus
    tf.join(df, "term").crossJoin(broadcast(stats))
      .select(col("term"), col("doc_id"),
        TextAnalysis.bm25TermScore(col("tf"), col("df"), col("dl"),
          col("n_docs"), col("sum_dl")).as("sc"), col("dl"))
  }

  /** The O(delta) append form of [[bm25Postings]]: postings for
    * `newDocs` ONLY, scored under FROZEN corpus statistics — the
    * per-term document frequencies `dfRel` (`(term, df)`) and global
    * `(nDocs, sumDl)` captured at the last exact recalc. Appending
    * under stale idf/avgdl bounds the nightly lexical refresh to the
    * delta (where the honest alternative, a full postings rebuild, is
    * O(corpus) forever); the drift is bounded — unchanged docs keep
    * their EXACT scores (their postings are untouched), delta docs
    * score as if the corpus had not grown since the recalc, and a
    * term the frozen snapshot never saw takes df = 0 (the highest
    * idf the formula admits — the honest reading of "the frozen
    * corpus contained no such doc"). The slow-cadence exact rebuild
    * ([[graft.api.Corpus.rebuildHybridPostings]]) restores exactness
    * and re-freezes the stats. The df join is left to the optimizer:
    * the delta side is O(batch) and the frozen df side vocabulary-
    * sized, so AQE broadcasts it at any realistic scale.
    */
  def bm25PostingsFrozen(newDocs: DataFrame, dfRel: DataFrame,
      nDocs: Long, sumDl: Long): DataFrame = {
    val toksC = tokens(col("text"))
    val tf = newDocs
      .select(col("doc_id"), size(toksC).as("dl"), toksC.as("t"))
      .select(col("doc_id"), col("dl"), explode(col("t")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(max(col("dl")).as("dl"), count(lit(1)).as("tf"))
    tf.join(dfRel.select(col("term"), col("df")), Seq("term"), "left")
      .select(col("term"), col("doc_id"),
        TextAnalysis.bm25TermScore(col("tf"),
          coalesce(col("df"), lit(0L)), col("dl"),
          lit(nDocs), lit(sumDl)).as("sc"), col("dl"))
  }

  /** Session cache of [[bm25Postings]] per corpus dir — the
    * build-once/serve-many split every other served index here gets
    * (IVF lists, PQ codes): without it the gated serve re-paid the
    * linear postings build per execution (measured 36 s at the 100×
    * probe corpus vs ~1 s serve-only).
    */
  private val postingsCache =
    new graft.operators.RelCache[(SparkSession, String)](_._1, _._2)
  private[graft] def cachedPostings(s: SparkSession,
      d: String): DataFrame =
    postingsCache.getOrBuild((s, d))(
      bm25Postings(graft.sources.Tables.documents(s, d)).localCheckpoint())

  def bm25Serve(queries: DataFrame, corpus: DataFrame,
      k: Int = TextAnalysis.Bm25TopDocs,
      postings: Option[DataFrame] = None): DataFrame = {
    val post = postings.getOrElse(bm25Postings(corpus))
    val qt = queries.withWatermark("ts", "1 hour")
      .select(col("query_id"), col("ts"),
        explode(array_distinct(tokens(col("text")))).as("term"))
    val scored = qt.join(post, Seq("term"))
      .select(col("query_id"), col("ts"), col("doc_id"), col("term"),
        col("sc"))
    // TWO chained windowed aggregations (the multi-stateful-operator
    // pattern the voted near-dup stream also uses): first the
    // per-(window, query, doc) score — each doc's term parts fold in
    // TERM order inside a doc-sized array, the batch form's exact
    // fold — then the per-(window, query) top-k over one (doc, score)
    // row per candidate. The previous single-aggregation form merged
    // per-doc runs inside ONE corpus-sized array per query, where any
    // immutable-array accumulation is quadratic in candidate count —
    // measured ~8-9 s for the 30-query gate at the 5000-doc sf0.1
    // corpus vs ~1 s for this form; scores are bit-identical (same
    // per-doc addition sequence).
    val byScore = (a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column) =>
      when(a.getField("score") > b.getField("score"), -1)
        .when(a.getField("score") < b.getField("score"), 1)
        .otherwise(signum(a.getField("doc_id") - b.getField("doc_id"))
          .cast("int"))
    scored
      .groupBy(window(col("ts"), s"$Bm25WindowSec seconds"),
        col("query_id"), col("doc_id"))
      .agg(collect_list(struct(col("term"), col("sc"))).as("tparts"))
      .select(col("window"), col("query_id"), col("doc_id"),
        aggregate(array_sort(col("tparts")), lit(0.0),
          (acc, p) => acc + p.getField("sc")).as("score"))
      .groupBy(col("window"), col("query_id"))
      .agg(collect_list(struct(col("doc_id"), col("score"))).as("docs"))
      .select(
        unix_timestamp(col("window.start")).as("win_start_s"),
        col("query_id"),
        concat_ws(",", transform(
          slice(array_sort(col("docs"), byScore), 1, k),
          x => x.getField("doc_id").cast("string"))).as("topk_ids"))
  }

  /** Gated batch twin of [[bm25Serve]]: the benchmark queries arrive at
    * deterministic timestamps and the serving plan runs in batch mode —
    * certifying the postings scoring, per-doc fold, and array-space
    * top-k against a DuckDB mirror of the whole chain (the
    * [[TextAnalysis.bm25CtesSql]] CTEs regrouped per window). The
    * streaming execution of the SAME plan is verified in
    * `Bm25ServeSpec`.
    */
  def stBm25(s: SparkSession, d: String): DataFrame = {
    val qrows = TextAnalysis.bm25Queries.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (id, ts) => (id, ts.map(_._2).mkString(" ")) }
    val q = s.createDataFrame(qrows).toDF("query_id", "qtext")
      .select(col("query_id"),
        expr(s"timestamp_seconds($Bm25ServeT0 + query_id)").as("ts"),
        col("qtext").as("text"))
    bm25Serve(q, graft.sources.Tables.documents(s, d),
      postings = Some(cachedPostings(s, d)))
      .orderBy(col("query_id"))
  }

  val stBm25Sql: String = {
    val k = TextAnalysis.Bm25TopDocs
    s"""WITH ${TextAnalysis.bm25CtesSql},
       |ranked AS (
       |  SELECT query_id, doc_id, score,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id) AS rank
       |  FROM agg),
       |top AS (
       |  SELECT query_id, list(doc_id ORDER BY rank) AS ids
       |  FROM ranked WHERE rank <= $k GROUP BY query_id)
       |SELECT CAST(((CAST($Bm25ServeT0 AS BIGINT) + query_id) // $Bm25WindowSec)
       |         * $Bm25WindowSec AS BIGINT) AS win_start_s,
       |  query_id,
       |  array_to_string(list_transform(ids, x -> CAST(x AS VARCHAR)), ',')
       |    AS topk_ids
       |FROM top
       |ORDER BY query_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // st_drift — per-window corpus drift vs a static baseline.
  // ---------------------------------------------------------------------

  val DriftWindowSec = 600L
  val DriftT0 = 1700000000L
  val DriftWindows = 4 // synthetic windows for the gated batch twin

  /** Streaming corpus-drift monitor: each tumbling window's term
    * distribution compared against a STATIC baseline corpus by total
    * variation distance — the continuous QA check that catches a
    * changed upstream crawler, a new spam template, or a language
    * shift the moment a window closes, instead of after a full batch
    * profile.
    *
    * Exactness (the [[graft.operators.EventAnalytics]] integer-moments
    * discipline): with window counts `c_t` (N_w total) and baseline
    * counts `b_t` (N_b total),
    * `TV = Σ_t |c_t/N_w − b_t/N_b| / 2` is computed as the EXACT
    * integer `Σ_t |c_t·N_b − b_t·N_w|` — terms absent from the window
    * contribute `(N_b − Σ_{t∈w} b_t)·N_w` in closed form, so only the
    * window's own terms are ever enumerated — over `2·N_w·N_b` in ONE
    * final exact-rounded division. Batch, streaming, and the DuckDB
    * oracle agree bit-for-bit where a floating ratio accumulation
    * would drift.
    *
    * Topology (the [[bm25Serve]] pattern): tokenize + explode
    * map-side; a stream-static LEFT join attaches each term's baseline
    * count (null → 0: a NEW term); two CHAINED watermarked windowed
    * aggregations (the multi-stateful-operator pattern) — per-(window,
    * term) counts first, then one order-free integer fold over the
    * distinct-term rows for the drift sums. State per window is the
    * window's distinct-term runs, evicted by the watermark; at 100 TB
    * the baseline join restricts to the top-V heavy-hitter vocabulary
    * (tail terms pool into the closed-form remainder, same identity),
    * and the `c_t·N_b` cross-products widen to Decimal(38,0) exactly
    * as [[graft.operators.EventAnalytics]]'s anomaly moments do — at
    * gate scale `2·N_w·N_b < 2⁵³` keeps every Long and its double
    * cast exact.
    *
    * `N_b` is a driver-side scalar of the STATIC baseline (the
    * [[graft.operators.Similarity]] `e.count()` precedent — an
    * index-build-time constant, never a per-batch action).
    */
  def driftMonitor(docs: DataFrame, baseline: DataFrame,
      windowSec: Long = DriftWindowSec): DataFrame =
    driftMonitorFromToks(
      docs.withWatermark("ts", "1 hour")
        .select(col("ts"), explode(tokens(col("text"))).as("term")),
      baseline.select(explode(tokens(col("text"))).as("term")),
      windowSec)

  /** [[driftMonitor]] from pre-exploded `(ts, term)` stream-side and
    * `(term)` baseline token relations — the gated batch twin passes
    * both views of the session-cached tokenized corpus, so the corpus
    * is tokenized once instead of three times (baseline counts,
    * baseline total, stream side).
    */
  private def driftMonitorFromToks(stTok: DataFrame, bTok: DataFrame,
      windowSec: Long): DataFrame = {
    val bRel = bTok.groupBy(col("term")).agg(count(lit(1)).as("b0"))
    val nB = bTok.count()
    val st = stTok
      .join(bRel, Seq("term"), "left")
      .select(col("ts"), col("term"), coalesce(col("b0"), lit(0L)).as("b"))
    // per-term window counts come from a FIRST windowed aggregation
    // (chained-stateful, like bm25Serve): the earlier form collected
    // every token occurrence into one per-window array and run-merged
    // it with an immutable-array fold — quadratic in the window's
    // distinct-term count (measured ~3 s at the sf0.1 gate, unbounded
    // at scale). Here the runs relation arrives pre-counted, and the
    // remaining array folds are order-free integer sums over one row
    // per distinct term (`b` is constant per term; `max` is just
    // "the" value).
    st.groupBy(window(col("ts"), s"$windowSec seconds"), col("term"))
      .agg(count(lit(1)).as("c"), max(col("b")).as("b"))
      .groupBy(col("window"))
      .agg(collect_list(struct(col("term"), col("c"), col("b")))
        .as("runs"),
        sum(col("c")).as("n_tokens"))
      .withColumn("sum_abs", aggregate(col("runs"), lit(0L), (acc, r) =>
        acc + abs(r.getField("c") * lit(nB) -
          r.getField("b") * col("n_tokens"))))
      .withColumn("sum_bw", aggregate(col("runs"), lit(0L), (acc, r) =>
        acc + r.getField("b")))
      .select(
        unix_timestamp(col("window.start")).as("win_start_s"),
        col("n_tokens"),
        size(filter(col("runs"), r => r.getField("b") === lit(0L)))
          .cast("long").as("n_new_terms"),
        ((col("sum_abs") + (lit(nB) - col("sum_bw")) * col("n_tokens"))
          .cast("double") /
          (lit(2.0) * col("n_tokens").cast("double") * lit(nB.toDouble)))
          .as("drift"))
  }

  /** Gated batch twin of [[driftMonitor]]: the corpus streams against
    * ITSELF as baseline, documents spread deterministically over
    * [[DriftWindows]] synthetic windows (`ts = T0 + (doc_id mod 4) ·
    * window`). Each window's slice drifts from the full-corpus
    * distribution by exactly the amount the oracle recomputes; a
    * window matching the corpus mix scores near 0. The streaming
    * execution of the SAME plan is verified in `DriftSpec`.
    */
  def stDrift(s: SparkSession, d: String): DataFrame = {
    // both sides read the session-cached tokenized corpus (same token
    // expression over the same scan — identical term rows), so the
    // gate's plan tokenizes the corpus zero times instead of three
    val tokRel = graft.operators.TextAnalysis.cachedTokRel(s, d)
    val stTok = tokRel.select(
      expr(s"timestamp_seconds($DriftT0 + (doc_id % $DriftWindows) * $DriftWindowSec)")
        .as("ts"),
      explode(col("t")).as("term"))
      .withWatermark("ts", "1 hour")
    driftMonitorFromToks(stTok, tokRel.select(explode(col("t")).as("term")),
      DriftWindowSec).orderBy(col("win_start_s"))
  }

  val stDriftSql: String =
    s"""WITH toksrel AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |tok AS (SELECT doc_id, unnest(t) AS term FROM toksrel),
       |b AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS b FROM tok GROUP BY term),
       |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_b FROM tok),
       |wtok AS (SELECT (doc_id % $DriftWindows) AS w, term FROM tok),
       |wc AS (SELECT w, term, CAST(COUNT(*) AS BIGINT) AS c FROM wtok GROUP BY w, term),
       |wn AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w FROM wtok GROUP BY w),
       |agg AS (
       |  SELECT j.w,
       |    CAST(SUM(abs(j.c * nb.n_b - j.b * wn.n_w)) AS BIGINT) AS sum_abs,
       |    CAST(SUM(j.b) AS BIGINT) AS sum_bw,
       |    CAST(SUM(CASE WHEN j.b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
       |  FROM (SELECT wc.w, wc.c, COALESCE(b.b, 0) AS b
       |        FROM wc LEFT JOIN b USING (term)) j
       |  JOIN wn ON j.w = wn.w CROSS JOIN nb
       |  GROUP BY j.w)
       |SELECT
       |  CAST(((CAST($DriftT0 AS BIGINT) + a.w * $DriftWindowSec) // $DriftWindowSec)
       |    * $DriftWindowSec AS BIGINT) AS win_start_s,
       |  wn.n_w AS n_tokens,
       |  a.n_new AS n_new_terms,
       |  CAST(a.sum_abs + (nb.n_b - a.sum_bw) * wn.n_w AS DOUBLE) /
       |    (2.0 * CAST(wn.n_w AS DOUBLE) * CAST(nb.n_b AS DOUBLE)) AS drift
       |FROM agg a JOIN wn ON a.w = wn.w CROSS JOIN nb
       |ORDER BY win_start_s""".stripMargin

  /** Deterministic arrival epoch for [[stNeardup]]; the 37-step spread
    * puts the corpus across two [[VoteHorizonMs]]-sized hours (chain
    * resets exercised) and twelve [[VoteWindowSec]] verdict windows.
    */
  val NeardupServeT0 = 1700000000L

  /** Gated batch twin of [[streamingNearDupVoted]] — the full 16-band
    * MinHash LSH vote, run through the REAL two-stateful-operator plan
    * (`flatMapGroupsWithState` + windowed vote; batch mode starts
    * every bucket's state empty and the watermark no-ops). Documents
    * arrive at `ts = T0 + (doc_id · 37) mod 7200`.
    *
    * Oracle-able because the verdict is a pure function of event
    * times: within a band bucket rows are processed in (ts, doc_id)
    * order and a row is a dup iff its gap to the PREVIOUS sighting is
    * ≤ the horizon (the state's lastMs always holds exactly the
    * previous row's time) — `LAG` over the bucket in SQL. The vote is
    * then a per-(window, doc) boolean OR across the 16 bands. Docs too
    * short to shingle take the singleton band — never dups.
    */
  def stNeardup(s: SparkSession, d: String): DataFrame = {
    val docs = graft.sources.Tables.documents(s, d).select(
      col("doc_id"),
      col("text"),
      expr(s"timestamp_seconds($NeardupServeT0 + (doc_id * 37) % 7200)")
        .as("ts"))
    streamingNearDupVoted(docs).orderBy(col("win_start_s"), col("doc_id"))
  }

  /** DuckDB mirror of [[stNeardup]]: the shared minhash signature
    * chain, 16 band rows per signed doc, the LAG-per-bucket dup rule,
    * and the windowed boolean vote; shingle-less docs append as
    * never-dup rows.
    */
  val stNeardupSql: String = {
    val horizonS = VoteHorizonMs / 1000
    val keys = (0 until VoteRowsPerBand).map(i =>
      s"sig[band * $VoteRowsPerBand + ${i + 1}] AS k$i").mkString(", ")
    val keyCols = (0 until VoteRowsPerBand).map(i => s"k$i").mkString(", ")
    s"""WITH ${graft.operators.Dedup.minhashCtesSql},
       |arr AS (
       |  SELECT doc_id, $NeardupServeT0 + (doc_id * 37) % 7200 AS tse
       |  FROM documents),
       |bandrows AS (
       |  SELECT s.doc_id, a.tse, band, $keys
       |  FROM sig s JOIN arr a USING (doc_id)
       |  CROSS JOIN range($VoteBands) r(band)),
       |verd AS (
       |  SELECT doc_id, tse,
       |    (lag_t IS NOT NULL AND tse - lag_t <= $horizonS) AS dup
       |  FROM (
       |    SELECT doc_id, tse,
       |      LAG(tse) OVER (PARTITION BY band, $keyCols
       |                     ORDER BY tse, doc_id) AS lag_t
       |    FROM bandrows) z),
       |voted AS (
       |  SELECT CAST((tse // $VoteWindowSec) * $VoteWindowSec AS BIGINT)
       |      AS win_start_s,
       |    doc_id, bool_or(dup) AS is_dup
       |  FROM verd GROUP BY 1, 2
       |  UNION ALL
       |  SELECT CAST((tse // $VoteWindowSec) * $VoteWindowSec AS BIGINT),
       |    doc_id, false
       |  FROM arr WHERE doc_id NOT IN (SELECT doc_id FROM sig))
       |SELECT win_start_s, doc_id, is_dup
       |FROM voted
       |ORDER BY win_start_s, doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_bm25"    -> stBm25 _,
    "st_drift"   -> stDrift _,
    "st_neardup" -> stNeardup _,
  )

  val oracles: Map[String, String] = Map(
    "st_bm25"    -> stBm25Sql,
    "st_drift"   -> stDriftSql,
    "st_neardup" -> stNeardupSql,
  )
}
