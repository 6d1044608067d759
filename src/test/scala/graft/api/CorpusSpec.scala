package graft.api

import graft.SparkTestBase

/** The DataFrame-first facade must agree with the gated query registry
  * wherever they overlap — same Catalyst expressions underneath.
  */
class CorpusSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = graft.sources.Tables.documents(spark, sf0001)

  test("facade near-dup pairs equal the gated dd_minhash_lsh pairs") {
    val api = Corpus.nearDupPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val gated = graft.operators.Dedup.ddMinhashLsh(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(api == gated)
    assert(api.nonEmpty)
  }

  test("facade chunking equals the gated ta_chunk rows") {
    val api = Corpus.chunked(docs)
      .select($"doc_id", $"chunk_idx", $"chunk_text", $"chunk_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getInt(3))).toMap
    val gated = graft.operators.Pipeline.taChunk(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getInt(3))).toMap
    assert(api == gated)
  }

  test("facade bpeApplied (in-plan training) equals the gated ta_bpe_apply rows") {
    val api = Corpus.bpeApplied(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val gated = graft.operators.TextAnalysis.taBpeApply(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(api == gated)
    assert(api.nonEmpty)
  }

  test("tokenizePacked composes scrub, dedup, BPE and packing on a hand corpus") {
    val merges = Seq(("l", "o"), ("lo", "w"))
    val hand = Seq(
      (0L, "low low low"),
      (1L, "low low low"),                 // exact dup of doc 0 → dropped
      (205L, "see http://ex5.org/p205 low"), // URL redacted → no BPE token
      (206L, "low low")                    // same shard as 205
    ).toDF("doc_id", "text")
    val got = Corpus.tokenizePacked(hand, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    assert(!got.contains(1L), "exact duplicate must be dropped")
    // "low" = l o w → lo w → low = 1 token; "see" = s e e = 3 tokens
    assert(got(0L) == ((0L, 3L, 0L, 0L, false)))
    assert(got(205L) == ((2L, 4L, 0L, 0L, false)),
      "the redacted [URL] token must not count as a BPE token")
    assert(got(206L) == ((2L, 2L, 4L, 0L, false)),
      "doc 206 must start after doc 205's 4 tokens in shard 2")
  }

  test("fluent ops compose: dedup then quality then chunk") {
    import Corpus.implicits._
    val out = docs.exactDeduped().qualityScored().chunked()
    assert(out.columns.contains("quality_score"))
    assert(out.count() > 0)
    // dedup keeps the lowest doc_id per fingerprint
    val ids = docs.exactDeduped().select("doc_id").collect().map(_.getLong(0)).toSet
    val fps = docs.select($"doc_id",
      graft.functions.fingerprintMd5($"text").as("fp")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = fps.groupBy(_._2).map(_._2.map(_._1).min).toSet
    assert(ids == expect)
  }

  test("contamination facade: an eval doc copied from train is fully contaminated") {
    import org.apache.spark.sql.functions._
    val train = docs.limit(50)
    // eval: one exact copy of a train doc (id-shifted) + one fresh doc
    val copied = train.limit(1)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
    val fresh = Seq((2000000L,
      "completely novel words nowhere else repeated ever in any train document at all"))
      .toDF("doc_id", "text")
    val got = Corpus.contamination(train, copied.unionByName(fresh))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got.size == 2)
    assert(got.exists { case (id, rate) => id >= 1000000L && id < 2000000L && rate == 1.0 })
    assert(got(2000000L) == 0.0)
  }

  test("cosineTopK without self-exclusion ranks each query's own vector first") {
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val top1 = Corpus.cosineTopK(e, e.filter($"vec_id" < 5), k = 1,
      excludeSelfIds = false)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(top1 == (0L until 5L).map(i => i -> i).toMap)
  }

  test("nearDupPairs rejects thresholds below the banding's recall floor") {
    intercept[IllegalArgumentException] {
      Corpus.nearDupPairs(docs, minJaccard = 0.1)
    }
  }

  test("bookkeeping facades equal the gated cp_* queries on the test corpus") {
    import org.apache.spark.sql.functions._
    val d = graft.sources.Tables.documents(spark, sf0001)
    val split = Corpus.hashSplit(d)
      .select($"doc_id", $"bucket", $"split").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    val gatedSplit = graft.operators.CorpusOps.cpSplit(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(split == gatedSplit)

    val pos = Corpus.shuffled(d).select($"doc_id", $"pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gatedPos = graft.operators.CorpusOps.cpShuffle(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pos == gatedPos)

    val strat = Corpus.stratifiedSampled(d).select($"doc_id").collect()
      .map(_.getLong(0)).toSet
    val gatedStrat = graft.operators.CorpusOps.cpStratified(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(strat == gatedStrat)
  }

  test("mixtureSampled: rate-1.0 keeps all, rate-0 drops all, rates apply per domain") {
    import org.apache.spark.sql.functions._
    val d = graft.sources.Tables.documents(spark, sf0001)
    val n = d.count()
    assert(Corpus.mixtureSampled(d, Map.empty).count() == n)
    val sources = d.select($"source").distinct().collect()
      .map(_.getString(0)).sorted
    val zeroed = sources.head
    val out = Corpus.mixtureSampled(d, Map(zeroed -> 0.0))
    assert(out.filter($"source" === zeroed).count() == 0)
    assert(out.count() ==
      n - d.filter($"source" === zeroed).count())
  }

  test("repetitionScored and quantizedI8 facades equal the gated queries, every column") {
    import org.apache.spark.sql.functions._
    def repKey(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), Option(r.get(5)).map(_.asInstanceOf[Double]))
    val rep = Corpus.repetitionScored(
      graft.sources.Tables.documents(spark, sf0001))
      .select($"doc_id", $"n_words", $"n_distinct_words",
        $"dup_word_frac", $"n_grams", $"top_gram_frac")
      .collect().map(repKey).toMap
    val gatedRep = graft.operators.TextAnalysis.taRepetition(spark, sf0001)
      .collect().map(repKey).toMap
    assert(rep == gatedRep)

    def qKey(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getString(3))
    val q = Corpus.quantizedI8(graft.sources.Tables.embeddings(spark, sf0001))
      .select($"vec_id", $"absmax", $"scale", $"q8").collect()
      .map(qKey).toMap
    val gatedQ = graft.operators.Similarity.embQuantize(spark, sf0001)
      .collect().map(qKey).toMap
    assert(q == gatedQ)
  }

  test("duplicatedSpans facade equals the gated dd_spans rows (unlimited form)") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))
    val api = Corpus.duplicatedSpans(docs).collect().map(key).toMap
    // gated form is the top-100 view of the same spans
    val gated = graft.operators.Dedup2.ddSpans(spark, sf0001)
      .collect().map(key).toMap
    assert(gated.nonEmpty)
    assert(gated.forall { case (k, v) => api.get(k).contains(v) })
  }

  test("spansRemoved facade equals the gated dd_spans_apply rows") {
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
    val api = Corpus.spansRemoved(docs).collect().map(key).toMap
    val gated = graft.operators.Dedup2.ddSpansApply(spark, sf0001)
      .collect().map(key).toMap
    assert(api == gated && api.nonEmpty)
  }

  test("dupClustersExactFirst facade equals the gated dd_cluster_xf rows") {
    val facade = Corpus.dupClustersExactFirst(docs).collect()
    val gated = graft.operators.Dedup2.ddClusterXf(spark, sf0001).collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))
    assert(facade.map(key).toSet == gated.map(key).toSet && facade.nonEmpty)
  }

  test("dupClusters facade equals clusterize over the gated LSH edges") {
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))
    val api = Corpus.dupClusters(docs).collect().map(key).toMap
    val gated = graft.operators.Dedup2.ddClusterLsh(spark, sf0001)
      .collect().map(key).toMap
    assert(api == gated)
    assert(api.nonEmpty)
  }

  test("tfidfTopTerms facade equals the gated ta_tfidf rows") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))
    val api = Corpus.tfidfTopTerms(docs).collect().map(key).toMap
    val gated = graft.operators.TextAnalysis.taTfidf(spark, sf0001)
      .collect().map(key).toMap
    assert(api == gated)
    assert(api.nonEmpty)
  }

  test("heavyHitters facade: exact below capacity, and its entries match exact counts") {
    import org.apache.spark.sql.functions._
    val exact = docs
      .select(explode(graft.functions.tokens($"text")).as("term"))
      .groupBy($"term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sk = Corpus.heavyHitters(docs, k = exact.size + 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // capacity above the vocabulary: sketch IS the exact wordcount
    assert(sk == exact.map { case (t, c) => t -> ((c, 0L)) })
  }

  test("unigramScored facade equals the gated query and a hand computation") {
    import org.apache.spark.sql.functions._
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))
    val api = Corpus.unigramScored(docs).collect().map(key).toMap
    val gated = graft.operators.TextAnalysis.taUnigramScore(spark, sf0001)
      .collect().map(key).toMap
    assert(api == gated && api.nonEmpty)
    // hand-compute on the collected corpus
    val texts = docs.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> graft.operators.MapReduce.fields(r.getString(1)))
    val freq = texts.flatMap(_._2).groupBy(identity).map { case (t, xs) =>
      t -> xs.length.toLong }
    texts.filter(_._2.nonEmpty).foreach { case (id, ts) =>
      val fs = ts.map(freq).sum
      assert(api(id) == ((ts.length.toLong, fs,
        fs.toDouble / ts.length.toDouble)), s"doc $id")
    }
  }

  test("ta_diversity matches a hand-computed Simpson index and its identities") {
    val gated = graft.operators.TextAnalysis.taDiversity(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val texts = docs.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> graft.operators.MapReduce.fields(r.getString(1)))
    texts.filter(_._2.nonEmpty).foreach { case (id, ts) =>
      val counts = ts.groupBy(identity).values.map(_.length.toLong)
      val n = counts.sum
      val sumSq = counts.map(c => c * c).sum
      val (gn, gs, simpson, eff) = gated(id)
      assert((gn, gs) == ((n, sumSq)), s"doc $id moments")
      assert(simpson == 1.0 - sumSq.toDouble / (n * n).toDouble, s"doc $id simpson")
      assert(eff == (n * n).toDouble / sumSq.toDouble, s"doc $id eff_vocab")
    }
    assert(gated.size == texts.count(_._2.nonEmpty))
  }

  test("pqTopK facade returns exact-refined ordered neighbors with useful recall") {
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val q = e.filter($"vec_id" < 5)
    val pq = Corpus.pqTopK(e, q, k = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
    // shape: 10 ordered rows per query, no self
    assert(pq.length == 50)
    assert(pq.forall { case ((qid, _), (cid, _)) => qid != cid })
    // refined scores are EXACT cosines: every returned pair's score must
    // equal the brute-force score for that pair
    val brute = Corpus.cosineTopK(e, q, k = 499).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    pq.foreach { case ((qid, _), (cid, cos)) =>
      assert(brute((qid, cid)) == cos, s"pair ($qid,$cid)") }
    // recall vs the true top-10 matches the gated sim_pq row
    val true10 = Corpus.cosineTopK(e, q, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = pq.count { case ((qid, _), (cid, _)) => true10((qid, cid)) }
    val gated = graft.operators.Similarity.simPq(spark, sf0001)
      .collect()(0).getLong(1)
    assert(hits.toLong == gated)
  }

  test("cosine top-k facade equals the gated brute-force query") {
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val api = Corpus.cosineTopK(e, e.filter($"vec_id" < 5), k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val gated = graft.operators.Similarity.simTopkBrute(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(api == gated)
  }

  test("kNN-join facade equals the gated sim_knn_join") {
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))
    // the facade's default (corpus-derived cell count, lowest-id seed,
    // Lloyd-trained) coincides with the gated query's trained index on
    // this dense-id corpus
    val api = Corpus.knnJoin(e).collect().map(key).toMap
    val gated = graft.operators.Similarity.simKnnJoin(spark, sf0001)
      .collect().map(key).toMap
    assert(api == gated)
    assert(api.nonEmpty)
  }

  test("dedupAgainst drops exact re-crawls of a seen corpus, keeps novel docs") {
    val seen = docs.limit(30)
    // new batch: 5 exact re-crawls (id-shifted, same text) + 2 novel
    val recrawls = seen.limit(5)
      .select(($"doc_id" + 5000000L).as("doc_id"), $"text")
    val novel = Seq(
      (9000001L, "genuinely new content the old corpus never saw"),
      (9000002L, "another fresh document with novel words"))
      .toDF("doc_id", "text")
    val batch = recrawls.unionByName(novel)
    val kept = Corpus.dedupAgainst(batch, seen)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(9000001L, 9000002L))
    // the original columns survive the anti join untouched
    assert(Corpus.dedupAgainst(batch, seen).columns.toSeq ==
      Seq("doc_id", "text"))
    // the bloom-prefiltered plan is result-identical, columns included
    val bloomed = Corpus.dedupAgainst(batch, seen, bloomPrefilter = true)
    assert(bloomed.columns.toSeq == Seq("doc_id", "text"))
    assert(bloomed.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(9000001L, 9000002L))
  }

  test("lengthTails facade flags the same docs as the gated ta_length_tails") {
    val api = Corpus.lengthTails(docs)
      .select("doc_id", "tail").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val gated = graft.operators.TextAnalysis.taLengthTails(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(api == gated && api.nonEmpty)
  }

  test("importance facade equals the gated cp_importance on the test corpus") {
    import org.apache.spark.sql.functions.col
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))
    val api = Corpus.importanceScored(docs, col("lang") === "en")
      .collect().map(key).toMap
    val gated = graft.operators.CorpusOps.cpImportance(spark, sf0001)
      .collect().map(key).toMap
    assert(api == gated && api.nonEmpty)
  }

  test("boilerplate and containment facades equal their gated queries") {
    val apiB = Corpus.boilerplateScored(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val gatedB = graft.operators.TextAnalysis.taBoilerplate(spark, sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(apiB == gatedB && apiB.nonEmpty)
    val apiC = Corpus.containmentPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val gatedC = graft.operators.Dedup.containmentPairs(
      graft.sources.Tables.documents(spark, sf0001)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(apiC == gatedC)
  }

  test("rate-anomaly facade equals the gated ev_anomaly rows") {
    import org.apache.spark.sql.functions.{col, expr}
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getBoolean(7)))
    val api = Events.rateAnomalies(
      graft.sources.Tables.events(spark, sf0001)
        .select(col("event_type"), expr("ts_ns DIV 1000000000").as("ts_s")))
      .collect().map(key).toMap
    val gated = graft.operators.EventAnalytics.evAnomaly(spark, sf0001)
      .collect().map(key).toMap
    assert(api == gated && api.nonEmpty)
  }

  test("latest-by-key facade compacts a changelog to its per-key maxima") {
    val events = Events.latestByKey(
      Seq((1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"), (1L, 20L, 99L, "c"),
        (2L, 5L, 50L, "d"))
        .toDF("k", "ts", "ver", "payload"),
      "k", Seq("ts", "ver", "payload"))
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // key 1: ts ties at 20 → ver breaks it; payload rides along
    assert(events == Map(1L -> ((20L, 101L, "b")), 2L -> ((5L, 50L, "d"))))
  }

  test("round-7 facades equal their gated queries") {
    import org.apache.spark.sql.functions.{col, concat_ws, md5, slice}
    // domain cap
    val capApi = Corpus.domainCapped(docs).collect()
      .map(_.getLong(0)).toSet
    val capGated = graft.operators.CorpusOps.cpDomainCap(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    assert(capApi === capGated && capApi.nonEmpty)
    // duplicate-aware sampling (facade takes the pre-keyed frame)
    val keyed = docs.select(col("doc_id"),
      md5(concat_ws(" ", slice(graft.functions.tokens(col("text")), 1, 10)))
        .as("fp"))
    val dsApi = Corpus.dupSampled(keyed).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val dsGated = graft.operators.CorpusOps.cpDupSample(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(dsApi === dsGated && dsApi.nonEmpty)
    // bigram coherence
    val bgApi = Corpus.bigramScored(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val bgGated = graft.operators.TextAnalysis.taBigramScore(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(bgApi === bgGated && bgApi.nonEmpty)
    // attribution + transition matrix
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("value"), org.apache.spark.sql.functions.expr("ts_ns DIV 1000").as("ts_us"))
    val atApi = Events.lastTouchAttribution(ev).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val atGated = graft.operators.EventAnalytics.evAttribution(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(atApi === atGated && atApi.nonEmpty)
    val tmApi = Events.transitionMatrix(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val tmGated = graft.operators.EventAnalytics.evMarkov(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(tmApi === tmGated && tmApi.nonEmpty)
  }

  test("crossModalPairs facade mines disjoint-id pairs with exact re-scored cosines") {
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val images = e.filter($"vec_id" % 3 === 0)
    val texts = e.filter($"vec_id" % 3 =!= 0)
    val mined = Corpus.crossModalPairs(images, texts, k = 3, minCos = 0.0)
      .collect()
    assert(mined.nonEmpty)
    mined.foreach { r =>
      assert(r.getLong(0) % 3 == 0 && r.getLong(2) % 3 != 0)
    }
    // re-scored cosines are exact: equal to brute force on shared pairs
    val brute = Corpus.cosineTopK(texts, images, k = 3,
      excludeSelfIds = false).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val overlap = mined.filter(r => brute.contains((r.getLong(0), r.getLong(2))))
    assert(overlap.nonEmpty)
    overlap.foreach(r =>
      assert(brute((r.getLong(0), r.getLong(2))) == r.getDouble(3)))
  }

  test("hybridTopK facade reproduces the gated sim_hybrid's lexical arm shape") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val ids = (0L until graft.operators.Similarity.NumQueryVectors)
    val out = Corpus.hybridTopK(docs, e, ids).collect()
    assert(out.nonEmpty)
    val byQuery = out.groupBy(_.getLong(0))
    assert(byQuery.keySet == ids.toSet)
    byQuery.values.foreach { rows =>
      assert(rows.length <= graft.operators.Similarity.HybridTopK)
      rows.foreach { r =>
        assert(r.getLong(2) != r.getLong(0), "no self matches")
        val lex = if (r.isNullAt(3)) None else Some(r.getLong(3))
        val dense = if (r.isNullAt(4)) None else Some(r.getLong(4))
        val expected =
          lex.map(v => 1.0 / (60.0 + v)).getOrElse(0.0) +
            dense.map(v => 1.0 / (60.0 + v)).getOrElse(0.0)
        assert(r.getDouble(5) == expected)
      }
    }
    // the facade now runs the gated sim_hybrid's plan on BOTH arms
    // (postings-served lexical + IVF-served dense), so on the gate's
    // query set the full fused rows must match exactly
    def rowKey(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getDouble(5))
    val gated = graft.operators.Similarity.simHybrid(spark, sf0001)
      .collect().map(rowKey).toSet
    assert(out.map(rowKey).toSet == gated)
  }

  test("hybridTopK served from a prebuilt HybridIndex: path equality, zero retraining") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val ids = (0L until graft.operators.Similarity.NumQueryVectors)
    val idx = Corpus.buildHybridIndex(docs, e)
    val inPlan = Corpus.hybridTopK(docs, e, ids).collect()
    val passesBefore = graft.operators.Similarity.trainingPasses.get()
    val served = Corpus.hybridTopK(docs, e, ids, index = Some(idx)).collect()
    // the served call must not start a single Lloyd pass — the
    // deterministic "second call is cheap" (training either ran or not)
    assert(graft.operators.Similarity.trainingPasses.get() == passesBefore,
      "served hybridTopK retrained the IVF index")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(served.map(key).toSet == inPlan.map(key).toSet && served.nonEmpty)
  }

  test("saveHybridIndex/loadHybridIndex: both arms serve identically at the pinned snapshot") {
    val storage = new graft.sources.Storage(spark,
      java.nio.file.Files.createTempDirectory("graft-hybsave-").toString)
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val ids = (0L until graft.operators.Similarity.NumQueryVectors)
    val built = Corpus.buildHybridIndex(docs, e)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    val expect = Corpus.hybridTopK(docs, e, ids, index = Some(built))
      .collect().map(key).toSet
    Corpus.saveHybridIndex(built, storage, "hyb")
    val passesBefore = graft.operators.Similarity.trainingPasses.get()
    val loaded = Corpus.loadHybridIndex(storage, "hyb")
    val got = Corpus.hybridTopK(docs, e, ids, index = Some(loaded))
      .collect().map(key).toSet
    assert(graft.operators.Similarity.trainingPasses.get() == passesBefore,
      "loading a persisted hybrid index must not retrain")
    assert(got == expect && got.nonEmpty)
    Seq(built, loaded).foreach(_.close())
  }

  test("minePairsIncremental over a prebuilt base equals the gated pipe_pairs_upsert") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
    val thr = graft.operators.Similarity.upsertThreshold(docs.count())
    val base = Corpus.buildPairMiningBase(
      docs.filter($"doc_id" < thr), vecs)
    val passesBefore = graft.operators.Similarity.trainingPasses.get()
    val mined = Corpus.minePairsIncremental(
      docs.filter($"doc_id" >= thr), vecs, base).collect()
    assert(graft.operators.Similarity.trainingPasses.get() == passesBefore,
      "incremental mining retrained the base index")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))
    val gated = graft.operators.Pipeline.pipePairsUpsert(spark, sf0001)
      .collect().map(key).toSet
    assert(mined.map(key).toSet == gated && mined.nonEmpty)
  }

  test("crossModalPairs served from a prebuilt AnnIndex: path equality, zero retraining") {
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val images = e.filter($"vec_id" % 3 === 0)
    val texts = e.filter($"vec_id" % 3 =!= 0)
    val idx = Corpus.buildAnnIndex(texts)
    val inPlan = Corpus.crossModalPairs(images, texts, k = 3, minCos = 0.0)
      .collect()
    val passesBefore = graft.operators.Similarity.trainingPasses.get()
    val served = Corpus.crossModalPairs(images, texts, k = 3, minCos = 0.0,
      index = Some(idx)).collect()
    assert(graft.operators.Similarity.trainingPasses.get() == passesBefore,
      "served crossModalPairs retrained the IVF index")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))
    assert(served.map(key).toSet == inPlan.map(key).toSet && served.nonEmpty)
  }

  test("mmrTopKServed from a prebuilt AnnIndex equals the gated sim_mmr_served, zero retraining") {
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val idx = Corpus.buildAnnIndex(e)
    val queries = e.filter(
      $"vec_id" < graft.operators.Similarity.NumQueryVectors)
    val passesBefore = graft.operators.Similarity.trainingPasses.get()
    val served = Corpus.mmrTopKServed(queries, idx).collect()
    assert(graft.operators.Similarity.trainingPasses.get() == passesBefore,
      "handle rerank retrained the IVF index")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2),
        math.round(r.getDouble(4) * 1e9))
    val gated = graft.operators.Similarity.simMmrServed(spark, sf0001)
      .collect().map(key).toSet
    assert(served.map(key).toSet == gated && served.nonEmpty)
    idx.close()
  }

  test("saveAnnIndex/loadAnnIndex: a persisted index serves identically across handles and pins versions") {
    val storage = new graft.sources.Storage(spark,
      java.nio.file.Files.createTempDirectory("graft-annsave-").toString)
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val built = Corpus.buildAnnIndex(e)
    val queries = e.filter($"vec_id" < 8)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e9))
    val expect = built.topK(queries, k = 5, excludeSelf = true)
      .collect().map(key).toSet
    val v1 = Corpus.saveAnnIndex(built, storage, "embidx")
    // rehydrated handle: identical serves, ZERO retraining
    val passesBefore = graft.operators.Similarity.trainingPasses.get()
    val loaded = Corpus.loadAnnIndex(storage, "embidx")
    val got = loaded.topK(queries, k = 5, excludeSelf = true)
      .collect().map(key).toSet
    assert(graft.operators.Similarity.trainingPasses.get() == passesBefore,
      "loading a persisted index must not retrain")
    assert(got == expect && got.nonEmpty)
    // a re-save publishes a NEW pointer version; the old one still
    // loads the original consistent centroids/lists pair (time travel)
    val built2 = Corpus.buildAnnIndex(e.filter($"vec_id" % 2 === 0))
    val v2 = Corpus.saveAnnIndex(built2, storage, "embidx")
    assert(v2 == v1 + 1)
    val old = Corpus.loadAnnIndex(storage, "embidx", version = v1)
    assert(old.topK(queries, k = 5, excludeSelf = true)
      .collect().map(key).toSet == expect,
      "version-pinned load must serve the ORIGINAL index")
    val latest = Corpus.loadAnnIndex(storage, "embidx")
    assert(latest.lists.count() == built2.lists.count(),
      "default load must resolve the newest pointer")
    // loaded handles own their blocks: close frees them
    Seq(built, built2, loaded, old, latest).foreach(_.close())
  }

  test("refreshHybridIndex: O(delta) on BOTH arms — frozen-stats postings append, exact recalc verb restores exactness") {
    import org.apache.spark.sql.functions.{col, count, lit, size, sum}
    val storage = new graft.sources.Storage(spark,
      java.nio.file.Files.createTempDirectory("graft-hybrefresh-").toString)
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val cut = docs.count() * 4 / 5
    storage.putVersioned("hdocs", docs.filter($"doc_id" < cut))
    storage.putVersioned("hvecs", e.filter($"vec_id" < cut))
    val built = Corpus.buildHybridIndex(
      storage.readVersioned("hdocs"), storage.readVersioned("hvecs"))
    // the FULL save freezes the lexical stats (df + n_docs/sum_dl) and
    // checkpoints the consumed docs version — arming the O(delta) path
    Corpus.saveHybridIndex(built, storage, "hyb2",
      vectorsCorpusVersion = storage.versions("hvecs").last,
      docs = storage.readVersioned("hdocs"),
      docsCorpusVersion = storage.versions("hdocs").last)
    def postKey(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))
    val beforePost = built.postings.collect().map(postKey).toSet
    storage.appendVersioned("hdocs", docs.filter($"doc_id" >= cut))
    storage.appendVersioned("hvecs", e.filter($"vec_id" >= cut))
    val nDelta = docs.filter($"doc_id" >= cut).count()
    val passesBefore = graft.operators.Similarity.trainingPasses.get()
    Corpus.refreshHybridIndex(storage, "hyb2", "hdocs", "hvecs")
    assert(graft.operators.Similarity.trainingPasses.get() == passesBefore,
      "a hybrid refresh must never run a training pass (both arms " +
        "append under frozen artifacts: centroids and idf/avgdl)")
    val loaded = Corpus.loadHybridIndex(storage, "hyb2")
    val afterPost = loaded.postings.collect().map(postKey).toSet
    // UNCHANGED docs keep their EXACT scores: the refreshed postings
    // restricted to the pre-append corpus are byte-identical to the
    // build's — the frozen-stats contract's load-bearing half
    assert(afterPost.filter(_._2 < cut) == beforePost,
      "stale-stats refresh must not touch unchanged docs' postings")
    // DELTA docs score under the FROZEN stats: equal to the
    // bm25PostingsFrozen twin fed the build-time df/n_docs/sum_dl
    val docsOld = docs.filter($"doc_id" < cut)
    val g = docsOld.agg(count(lit(1)).cast("long").as("n"),
      sum(size(graft.functions.tokens(col("text")))).cast("long").as("s"))
      .collect()(0)
    val twinDelta = graft.streaming.DocStreams.bm25PostingsFrozen(
      docs.filter($"doc_id" >= cut),
      built.postings.groupBy($"term").agg(count(lit(1)).as("df")),
      g.getLong(0), g.getLong(1)).collect().map(postKey).toSet
    assert(afterPost.filter(_._2 >= cut) == twinDelta && twinDelta.nonEmpty,
      "delta docs must score under the frozen idf/avgdl")
    // the dense arm consumed its delta too
    assert(loaded.ann.lists.count() == e.count())
    // staleness is observable: the pointer accumulates the delta doc
    // count, and describeIndexes surfaces it on the lexstats row
    val ptr1 = storage.readVersioned("hyb2__hybrid").collect()(0)
    assert(ptr1.getAs[Long]("stale_docs") == nDelta)
    val lexRow = Corpus.describeIndexes(storage).collect()
      .filter(r => r.getString(0) == "hyb2" && r.getString(3) == "lexstats")
    assert(lexRow.length == 1 &&
      lexRow(0).getAs[Long]("stale_rows") == nDelta,
      s"describeIndexes must surface the frozen-stats drift: " +
        s"${lexRow.toSeq}")
    // the slow-cadence EXACT recalc: postings equal a from-scratch
    // bm25Postings over the grown corpus, staleness resets, the dense
    // arm's pinned pointer version carries over untouched
    val denseBefore = ptr1.getAs[Long]("dense_version")
    Corpus.rebuildHybridPostings(storage, "hyb2", "hdocs")
    val rebuilt = Corpus.loadHybridIndex(storage, "hyb2")
    val exact = graft.streaming.DocStreams.bm25Postings(docs)
      .collect().map(postKey).toSet
    assert(rebuilt.postings.collect().map(postKey).toSet == exact,
      "the exact recalc must equal a from-scratch postings build")
    val ptr2 = storage.readVersioned("hyb2__hybrid").collect()(0)
    assert(ptr2.getAs[Long]("stale_docs") == 0L &&
      ptr2.getAs[Long]("dense_version") == denseBefore)
    // a refresh with no new docs AND no new vectors is a true no-op:
    // nothing commits (a quiet nightly loop must not grow the pointer
    // table one content-identical version per night)
    val postV = ptr2.getAs[Long]("postings_version")
    val ptrVersions = storage.versions("hyb2__hybrid")
    Corpus.refreshHybridIndex(storage, "hyb2", "hdocs", "hvecs")
    assert(storage.versions("hyb2__hybrid") == ptrVersions,
      "a fully-caught-up refresh must commit nothing")
    assert(storage.readVersioned("hyb2__hybrid").collect()(0)
      .getAs[Long]("postings_version") == postV)
    Seq(built, loaded, rebuilt).foreach(_.close())
  }

  test("refreshHybridIndex self-heals when docs retention reclaimed the consumed version") {
    import org.apache.spark.sql.functions.col
    val storage = new graft.sources.Storage(spark,
      java.nio.file.Files.createTempDirectory("graft-hybheal-").toString)
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val cut = docs.count() * 3 / 5
    storage.putVersioned("sdocs", docs.filter($"doc_id" < cut))
    storage.putVersioned("svecs", e)
    val built = Corpus.buildHybridIndex(
      storage.readVersioned("sdocs"), storage.readVersioned("svecs"))
    Corpus.saveHybridIndex(built, storage, "shy",
      vectorsCorpusVersion = storage.versions("svecs").last,
      docs = storage.readVersioned("sdocs"),
      docsCorpusVersion = storage.versions("sdocs").last)
    // the docs side's OWN pipeline appends twice and vacuums by its
    // own keep-last policy, reclaiming the version this family pinned
    storage.appendVersioned("sdocs",
      docs.filter($"doc_id" >= cut && $"doc_id" < cut + 100))
    storage.appendVersioned("sdocs", docs.filter($"doc_id" >= cut + 100))
    storage.vacuumVersions("sdocs", keepLast = 1)
    assert(!storage.versions("sdocs").contains(1L),
      "fixture must actually reclaim the pinned docs version")
    // the refresh must NOT wedge: it self-heals with one exact
    // rebuild, re-freezing the stats at the current snapshot
    Corpus.refreshHybridIndex(storage, "shy", "sdocs", "svecs")
    val healed = Corpus.loadHybridIndex(storage, "shy")
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))
    assert(healed.postings.collect().map(key).toSet ==
      graft.streaming.DocStreams.bm25Postings(docs).collect()
        .map(key).toSet,
      "the self-heal must serve exact postings over the grown corpus")
    val ptr = storage.readVersioned("shy__hybrid").collect()(0)
    assert(ptr.getAs[Long]("stale_docs") == 0L &&
      ptr.getAs[Long]("docs_version") == storage.versions("sdocs").last)
    Seq(built, healed).foreach(_.close())
  }

  test("refreshAnnIndex: CDC delta upsert equals a lists rebuild under the frozen centroids, zero retraining") {
    val storage = new graft.sources.Storage(spark,
      java.nio.file.Files.createTempDirectory("graft-annrefresh-").toString)
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val n = e.count()
    // "yesterday's" corpus version and today's appended delta
    storage.putVersioned("cvecs", e.filter($"vec_id" < n * 4 / 5))
    val built = Corpus.buildAnnIndex(storage.readVersioned("cvecs"))
    val pv1 = Corpus.saveAnnIndex(built, storage, "ridx",
      corpusVersion = storage.versions("cvecs").last)
    storage.appendVersioned("cvecs", e.filter($"vec_id" >= n * 4 / 5))
    val passesBefore = graft.operators.Similarity.trainingPasses.get()
    val pv2 = Corpus.refreshAnnIndex(storage, "ridx", "cvecs")
    assert(graft.operators.Similarity.trainingPasses.get() == passesBefore,
      "an incremental refresh must never run a full-corpus training pass")
    assert(pv2 == pv1 + 1)
    // the pointer records the consumed corpus version and the SAME
    // centroids version (frozen — nothing was retrained)
    val ptr = storage.readVersioned("ridx__ann").collect()(0)
    assert(ptr.getAs[Long]("corpus_version") ==
      storage.versions("cvecs").last)
    assert(ptr.getAs[Long]("centroids_version") ==
      storage.readVersioned("ridx__ann", pv1).collect()(0)
        .getAs[Long]("centroids_version"))
    // quantizer-drift observable: the save starts at 0, the refresh
    // accumulates the rows assigned under the frozen centroids
    assert(storage.readVersioned("ridx__ann", pv1).collect()(0)
      .getAs[Long]("stale_rows") == 0L)
    assert(ptr.getAs[Long]("stale_rows") == n - n * 4 / 5,
      "stale_rows must count the delta assigned under frozen centroids")
    // serve equality: the refreshed index answers exactly like lists
    // REBUILT from scratch over the grown corpus under the same frozen
    // centroids (assignment is per-vector, so upsert == rebuild)
    val refreshed = Corpus.loadAnnIndex(storage, "ridx")
    val rebuilt = AnnIndex(refreshed.centroids,
      graft.operators.Similarity.kernelProbeCells(
        e.select($"vec_id", $"embedding"), refreshed.centroids, 1,
        "c_id", "cv_c", "cn_c").localCheckpoint())
    val queries = e.filter($"vec_id" < 8)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e9))
    val got = refreshed.topK(queries, k = 5, excludeSelf = true)
      .collect().map(key).toSet
    assert(got == rebuilt.topK(queries, k = 5, excludeSelf = true)
      .collect().map(key).toSet && got.nonEmpty)
    // the delta's vectors are actually served (a query's own delta
    // vector ranks first without self-exclusion)
    val deltaQ = e.filter($"vec_id" >= n * 4 / 5).limit(2)
    val deltaHits = refreshed.topK(deltaQ, k = 3).collect()
      .filter(r => r.getLong(0) == r.getLong(2))
    assert(deltaHits.length == 2 &&
      deltaHits.forall(r => math.abs(r.getDouble(3) - 1.0) < 1e-9),
      "each upserted vector must find ITSELF in the refreshed index")
    // corpus unchanged -> no-op refresh returns the current pointer
    assert(Corpus.refreshAnnIndex(storage, "ridx", "cvecs") == pv2)
    // corpus advanced by MAINTENANCE only (a compaction): nothing to
    // index — the refresh re-pins the consumed version without
    // committing a junk empty lists version
    val listsVersions = storage.versions("ridx__lists")
    val compactedCorpus = storage.compactVersions("cvecs")
    val pv3 = Corpus.refreshAnnIndex(storage, "ridx", "cvecs")
    assert(pv3 == pv2 + 1)
    assert(storage.versions("ridx__lists") == listsVersions,
      "a maintenance-only corpus advance must not grow the lists lineage")
    assert(storage.readVersioned("ridx__ann").collect()(0)
      .getAs[Long]("corpus_version") == compactedCorpus)
    assert(Corpus.refreshAnnIndex(storage, "ridx", "cvecs") == pv3,
      "after the re-pin the refresh is a no-op again")
    // a pointer saved without a corpus version refuses with guidance
    Corpus.saveAnnIndex(built, storage, "ridx0")
    val err = intercept[IllegalArgumentException] {
      Corpus.refreshAnnIndex(storage, "ridx0", "cvecs")
    }
    assert(err.getMessage.contains("corpus version"), err.getMessage)
    Seq(built, refreshed, rebuilt).foreach(_.close())
  }

  test("refreshAnnIndex re-run after a crash between the lists append and the pointer commit never double-indexes") {
    val storage = new graft.sources.Storage(spark,
      java.nio.file.Files.createTempDirectory("graft-anncrash-").toString)
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val n = e.count()
    storage.putVersioned("xvecs", e.filter($"vec_id" < n * 4 / 5))
    val built = Corpus.buildAnnIndex(storage.readVersioned("xvecs"))
    Corpus.saveAnnIndex(built, storage, "cidx",
      corpusVersion = storage.versions("xvecs").last)
    storage.appendVersioned("xvecs", e.filter($"vec_id" >= n * 4 / 5))
    // simulate the CRASHED refresh's first half: the delta lists land
    // (base-pinned, as the verb writes them) but the pointer commit
    // never happens — the orphan lists version the old latest-attached
    // append would have stacked today's delta on top of
    val ptr = storage.readVersioned("cidx__ann").collect()(0)
    val cent = storage.readVersioned("cidx__centroids",
      ptr.getAs[Long]("centroids_version"))
    val delta = storage.readVersionedSince("xvecs",
      ptr.getAs[Long]("corpus_version"))
      .select($"vec_id", $"embedding")
    storage.appendVersionedOnto("cidx__lists",
      graft.operators.Similarity.kernelProbeCells(delta, cent, 1,
        "c_id", "cv_c", "cn_c"),
      ptr.getAs[Long]("lists_version"))
    // the re-run (the operator's retry after the crash)
    Corpus.refreshAnnIndex(storage, "cidx", "xvecs")
    val refreshed = Corpus.loadAnnIndex(storage, "cidx")
    // every corpus vector is indexed EXACTLY once — the delta did not
    // stack onto the orphan
    assert(refreshed.lists.count() == n,
      s"lists must hold one row per corpus vector, got " +
        s"${refreshed.lists.count()} for $n vectors")
    assert(refreshed.lists.select($"c_id").distinct().count() == n)
    Seq(built, refreshed).foreach(_.close())
  }

  test("IvfPqIndex lifecycle: save/load/refresh/compact/vacuum — both quantizers frozen, serves exact across every verb") {
    val storage = new graft.sources.Storage(spark,
      java.nio.file.Files.createTempDirectory("graft-ivfpq-").toString)
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val n = e.count()
    storage.putVersioned("qvecs", e.filter($"vec_id" < n * 3 / 5))
    val built = Corpus.buildIvfPqIndex(storage.readVersioned("qvecs"))
    val pv1 = Corpus.saveIvfPqIndex(built, storage, "qidx",
      corpusVersion = storage.versions("qvecs").last)
    val queries = e.filter($"vec_id" < 6)
    def serve(idx: IvfPqIndex) = idx.topK(queries, k = 5,
        excludeSelf = true).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e9))).toSet
    // load serves identically to the built handle, zero training
    val passes0 = graft.operators.Similarity.trainingPasses.get()
    val loaded = Corpus.loadIvfPqIndex(storage, "qidx")
    val expect1 = serve(built)
    assert(serve(loaded) == expect1 && expect1.nonEmpty)
    assert(graft.operators.Similarity.trainingPasses.get() == passes0,
      "loading and serving a persisted IVF-PQ index must not retrain")
    // two nightly deltas fold in under FROZEN centroids and codebooks
    storage.appendVersioned("qvecs",
      e.filter($"vec_id" >= n * 3 / 5 && $"vec_id" < n * 4 / 5))
    Corpus.refreshIvfPqIndex(storage, "qidx", "qvecs")
    storage.appendVersioned("qvecs", e.filter($"vec_id" >= n * 4 / 5))
    Corpus.refreshIvfPqIndex(storage, "qidx", "qvecs")
    assert(graft.operators.Similarity.trainingPasses.get() == passes0,
      "an incremental IVF-PQ refresh must never retrain either quantizer")
    val refreshed = Corpus.loadIvfPqIndex(storage, "qidx")
    // refresh ≡ rebuild-under-frozen-everything: re-assign and
    // re-encode the WHOLE grown corpus under the same artifacts
    val full = e.select($"vec_id", $"embedding")
    val twin = IvfPqIndex(
      AnnIndex(refreshed.ann.centroids,
        graft.operators.Similarity.kernelProbeCells(full,
          refreshed.ann.centroids, 1, "c_id", "cv_c", "cn_c")
          .localCheckpoint()),
      refreshed.codebooks,
      graft.operators.Similarity.kernelEncodePq(full,
        refreshed.codebooks).localCheckpoint())
    val expect2 = serve(twin)
    assert(serve(refreshed) == expect2 && expect2.nonEmpty)
    // both nightly deltas accumulated in the drift observable (the
    // nested coarse pointer mirrors it)
    assert(storage.readVersioned("qidx__ivfpq").collect()(0)
      .getAs[Long]("stale_rows") == n - n * 3 / 5,
      "stale_rows must count vectors encoded under the frozen quantizers")
    // every corpus vector is present EXACTLY once in both artifacts
    assert(refreshed.ann.lists.count() == n)
    assert(refreshed.codes.count() ==
      n * graft.operators.Similarity.PqM)
    // an upserted vector is genuinely served (self-hit at cosine 1)
    val deltaQ = e.filter($"vec_id" >= n * 4 / 5).limit(2)
    val hits = refreshed.topK(deltaQ, k = 1).collect()
    assert(hits.length == 2 && hits.forall(r =>
      r.getLong(0) == r.getLong(2) &&
        math.abs(r.getDouble(3) - 1.0) < 1e-9))
    // compaction: serve-identical, one directory per artifact
    Corpus.compactIvfPqIndex(storage, "qidx")
    val compacted = Corpus.loadIvfPqIndex(storage, "qidx")
    assert(serve(compacted) == expect2)
    assert(storage.versionDirCount("qidx__codes") == 1 &&
      storage.versionDirCount("qidx__coarse__lists") == 1)
    // retention: unpinned generations free, the survivor serves
    val (vm, vd) = Corpus.vacuumIvfPqIndex(storage, "qidx",
      keepLastPointers = 1)
    assert(vm > 0 && vd > 0)
    val survivor = Corpus.loadIvfPqIndex(storage, "qidx")
    assert(serve(survivor) == expect2)
    intercept[IllegalArgumentException] {
      Corpus.loadIvfPqIndex(storage, "qidx", version = pv1)
    }
    // fences: direct coarse-arm refresh refuses (codes would go stale);
    // a versionless save refuses refresh with guidance
    val coarseErr = intercept[IllegalArgumentException] {
      Corpus.refreshAnnIndex(storage, "qidx__coarse", "qvecs")
    }
    assert(coarseErr.getMessage.contains("corpus version"))
    Corpus.saveIvfPqIndex(built, storage, "qidx0")
    intercept[IllegalArgumentException] {
      Corpus.refreshIvfPqIndex(storage, "qidx0", "qvecs")
    }
    Seq(built, loaded, refreshed, twin, compacted, survivor)
      .foreach(_.close())
  }

  test("savePairMiningBase/loadPairMiningBase/refreshPairMiningBase: nightly fold, first-arrival fps, zero retraining") {
    val storage = new graft.sources.Storage(spark,
      java.nio.file.Files.createTempDirectory("graft-pmbsave-").toString)
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val cut = docs.count() * 4 / 5
    storage.putVersioned("pdocs", docs.filter($"doc_id" < cut))
    storage.putVersioned("pvecs", e.filter($"vec_id" < cut))
    val base = Corpus.buildPairMiningBase(
      storage.readVersioned("pdocs"), storage.readVersioned("pvecs"))
    val pv1 = Corpus.savePairMiningBase(base, storage, "pmb",
      docsVersion = storage.versions("pdocs").last,
      vectorsVersion = storage.versions("pvecs").last)
    // a LOADED base mines identically to the in-session one, with
    // zero rebuild/training work
    val passes0 = graft.operators.Similarity.trainingPasses.get()
    val loaded = Corpus.loadPairMiningBase(storage, "pmb")
    val batchDocs = docs.filter($"doc_id" >= cut)
    val batchVecs = e.filter($"vec_id" >= cut)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e9))
    val mined = Corpus.minePairsIncremental(batchDocs, batchVecs, loaded)
      .collect().map(key).toSet
    assert(mined == Corpus.minePairsIncremental(batchDocs, batchVecs, base)
      .collect().map(key).toSet && mined.nonEmpty)
    assert(graft.operators.Similarity.trainingPasses.get() == passes0,
      "loading and mining against a persisted base must not retrain")
    // fold the batch into the base: append to the tables, refresh
    storage.appendVersioned("pdocs", batchDocs)
    storage.appendVersioned("pvecs", batchVecs)
    val pv2 = Corpus.refreshPairMiningBase(storage, "pmb", "pdocs", "pvecs")
    assert(pv2 == pv1 + 1)
    assert(graft.operators.Similarity.trainingPasses.get() == passes0,
      "an incremental base refresh must never retrain")
    val refreshed = Corpus.loadPairMiningBase(storage, "pmb")
    // FIRST-ARRIVAL fingerprints: base survivors stay canonical, the
    // delta contributes only fingerprints the base never saw
    def fpsOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"fp", $"vec_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    val deltaKeptTwin = graft.operators.Pipeline.qualityFp(batchDocs)
      .groupBy($"fp")
      .agg(org.apache.spark.sql.functions.min($"doc_id").as("vec_id"))
      .join(base.fingerprints.select($"fp"), Seq("fp"), "left_anti")
    assert(fpsOf(refreshed.fingerprints) ==
      fpsOf(base.fingerprints) ++ fpsOf(deltaKeptTwin))
    // every kept doc's vector indexed exactly once, under the SAME
    // frozen centroids
    assert(refreshed.index.lists.count() == refreshed.fingerprints.count())
    assert(fpsOf(refreshed.fingerprints).size >
      fpsOf(base.fingerprints).size,
      "the delta must contribute new survivors for this fixture")
    // neither table advanced -> no-op returns the current pointer
    assert(Corpus.refreshPairMiningBase(storage, "pmb", "pdocs", "pvecs")
      == pv2)
    // a base saved without corpus versions refuses refresh with guidance
    Corpus.savePairMiningBase(base, storage, "pmb0")
    val err = intercept[IllegalArgumentException] {
      Corpus.refreshPairMiningBase(storage, "pmb0", "pdocs", "pvecs")
    }
    assert(err.getMessage.contains("corpus versions"), err.getMessage)
    // retention: keep the newest pointer generation only
    val (vm, vd) = Corpus.vacuumPairMiningBase(storage, "pmb",
      keepLastPointers = 1)
    assert(vm > 0 && vd >= 0)
    assert(storage.versions("pmb__pmb") == Seq(pv2))
    val afterVac = Corpus.loadPairMiningBase(storage, "pmb")
    assert(afterVac.fingerprints.count() == refreshed.fingerprints.count())
    intercept[IllegalArgumentException] {
      Corpus.loadPairMiningBase(storage, "pmb", version = pv1)
    }
    Seq(base, loaded, refreshed, afterVac).foreach(_.close())
  }

  test("vacuumAnnIndex: pointer-pinned artifact versions survive, unpinned history frees, retained pointers serve") {
    val storage = new graft.sources.Storage(spark,
      java.nio.file.Files.createTempDirectory("graft-annvac-").toString)
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val n = e.count()
    storage.putVersioned("vvecs", e.filter($"vec_id" < n * 4 / 5))
    val builtA = Corpus.buildAnnIndex(storage.readVersioned("vvecs"))
    val pv1 = Corpus.saveAnnIndex(builtA, storage, "vidx",
      corpusVersion = storage.versions("vvecs").last)
    storage.appendVersioned("vvecs", e.filter($"vec_id" >= n * 4 / 5))
    val pv2 = Corpus.refreshAnnIndex(storage, "vidx", "vvecs")
    val builtB = Corpus.buildAnnIndex(storage.readVersioned("vvecs"))
    val pv3 = Corpus.saveAnnIndex(builtB, storage, "vidx",
      corpusVersion = storage.versions("vvecs").last)
    val (m, d) = Corpus.vacuumAnnIndex(storage, "vidx", keepLastPointers = 1)
    assert(m > 0 && d > 0,
      s"two pointer generations plus their unpinned artifacts should free " +
        s"bytes, got ($m manifests, $d dirs)")
    assert(storage.versions("vidx__ann") == Seq(pv3))
    // the artifact tables hold ONLY what the retained pointer pins
    // (plus latest, which coincides): save A's centroids and the
    // refresh lineage's lists are gone
    assert(storage.versions("vidx__centroids") == Seq(2L))
    assert(storage.versions("vidx__lists") == Seq(3L))
    // the survivor loads and serves; vacuumed pointers refuse
    val loaded = Corpus.loadAnnIndex(storage, "vidx")
    assert(loaded.topK(e.filter($"vec_id" < 4), k = 3).count() > 0)
    intercept[IllegalArgumentException] {
      Corpus.loadAnnIndex(storage, "vidx", version = pv2)
    }
    intercept[IllegalArgumentException] {
      Corpus.loadAnnIndex(storage, "vidx", version = pv1)
    }
    Seq(builtA, builtB, loaded).foreach(_.close())
  }

  test("compactAnnIndex: serve-identical one-directory re-snapshot; vacuum then reclaims the night deltas; refresh continues") {
    val storage = new graft.sources.Storage(spark,
      java.nio.file.Files.createTempDirectory("graft-anncomp-").toString)
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val n = e.count()
    // base 2/5, two nightly deltas of 1/5, one post-compaction delta
    storage.putVersioned("ovecs", e.filter($"vec_id" < n * 2 / 5))
    val built = Corpus.buildAnnIndex(storage.readVersioned("ovecs"))
    Corpus.saveAnnIndex(built, storage, "oidx",
      corpusVersion = storage.versions("ovecs").last)
    storage.appendVersioned("ovecs",
      e.filter($"vec_id" >= n * 2 / 5 && $"vec_id" < n * 3 / 5))
    Corpus.refreshAnnIndex(storage, "oidx", "ovecs")
    storage.appendVersioned("ovecs",
      e.filter($"vec_id" >= n * 3 / 5 && $"vec_id" < n * 4 / 5))
    Corpus.refreshAnnIndex(storage, "oidx", "ovecs")
    val queries = e.filter($"vec_id" < 6)
    def serve(idx: AnnIndex) = idx.topK(queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        math.round(r.getDouble(3) * 1e9))).toSet
    val before = Corpus.loadAnnIndex(storage, "oidx")
    val expect = serve(before)
    // compact: same rows, one fresh directory, new pointer
    assert(storage.versionDirCount("oidx__lists") == 3,
      "two refreshes must have accreted two delta directories")
    Corpus.compactAnnIndex(storage, "oidx")
    val compacted = Corpus.loadAnnIndex(storage, "oidx")
    assert(serve(compacted) == expect, "compaction must be serve-identical")
    assert(storage.versionDirCount("oidx__lists") == 1,
      "the compacted lists snapshot must be one directory")
    // NOW retention actually reclaims the night deltas: the retained
    // pointer's manifest references only the compacted directory
    val (m, d) = Corpus.vacuumAnnIndex(storage, "oidx",
      keepLastPointers = 1)
    assert(m > 0 && d >= 3,
      s"the base + two delta directories must free after compaction, " +
        s"got ($m, $d)")
    val after = Corpus.loadAnnIndex(storage, "oidx")
    assert(serve(after) == expect, "vacuum must not touch the pinned serve")
    // the nightly loop continues on the compacted lineage
    storage.appendVersioned("ovecs", e.filter($"vec_id" >= n * 4 / 5))
    Corpus.refreshAnnIndex(storage, "oidx", "ovecs")
    val grown = Corpus.loadAnnIndex(storage, "oidx")
    assert(grown.lists.count() == n)
    Seq(built, before, compacted, after, grown).foreach(_.close())
  }

  test("compactHybridIndex/compactPairMiningBase: nested snapshots compact at their PINNED versions, serves unchanged") {
    val storage = new graft.sources.Storage(spark,
      java.nio.file.Files.createTempDirectory("graft-famcomp-").toString)
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val cut = docs.count() * 4 / 5
    storage.putVersioned("cdocs", docs.filter($"doc_id" < cut))
    storage.putVersioned("cvex", e.filter($"vec_id" < cut))
    // hybrid: save + refresh + compact, serve equality across
    val hb = Corpus.buildHybridIndex(
      storage.readVersioned("cdocs"), storage.readVersioned("cvex"))
    Corpus.saveHybridIndex(hb, storage, "chyb",
      vectorsCorpusVersion = storage.versions("cvex").last)
    storage.appendVersioned("cdocs", docs.filter($"doc_id" >= cut))
    storage.appendVersioned("cvex", e.filter($"vec_id" >= cut))
    Corpus.refreshHybridIndex(storage, "chyb", "cdocs", "cvex")
    def hserve(idx: HybridIndex) =
      Corpus.hybridTopK(docs, e, Seq(0L, 1L, 2L), index = Some(idx))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    val hBefore = Corpus.loadHybridIndex(storage, "chyb")
    val hExpect = hserve(hBefore)
    Corpus.compactHybridIndex(storage, "chyb")
    val hAfter = Corpus.loadHybridIndex(storage, "chyb")
    assert(hserve(hAfter) == hExpect && hExpect.nonEmpty)
    assert(storage.versionDirCount("chyb__dense__lists") == 1,
      "the dense lists must compact to one directory")
    // pair-mining base: save + refresh + compact, mining unchanged
    val base = Corpus.buildPairMiningBase(
      storage.readVersioned("cdocs", 1L), storage.readVersioned("cvex", 1L))
    Corpus.savePairMiningBase(base, storage, "cpmb",
      docsVersion = 1L, vectorsVersion = 1L)
    Corpus.refreshPairMiningBase(storage, "cpmb", "cdocs", "cvex")
    val pBefore = Corpus.loadPairMiningBase(storage, "cpmb")
    val batch = docs.filter($"doc_id" >= cut)
    val batchV = e.filter($"vec_id" >= cut)
    def mine(b: PairMiningBase) =
      Corpus.minePairsIncremental(batch, batchV, b).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          math.round(r.getDouble(3) * 1e9))).toSet
    val pExpect = mine(pBefore)
    Corpus.compactPairMiningBase(storage, "cpmb")
    val pAfter = Corpus.loadPairMiningBase(storage, "cpmb")
    assert(mine(pAfter) == pExpect)
    assert(pAfter.fingerprints.count() == pBefore.fingerprints.count())
    assert(pAfter.index.lists.count() == pBefore.index.lists.count())
    hb.close(); hBefore.close(); hAfter.close()
    base.close(); pBefore.close(); pAfter.close()
  }

  test("vacuumTokenizer and vacuumHybridIndex: nested pins respected, survivors load") {
    val storage = new graft.sources.Storage(spark,
      java.nio.file.Files.createTempDirectory("graft-famvac-").toString)
    // tokenizer family: two saves, keep the newest
    val docs = graft.sources.Tables.documents(spark, sf0001).limit(200)
      .select($"doc_id", $"text").localCheckpoint()
    val tokA = Corpus.buildTokenizer(docs, n = 4)
    Corpus.saveTokenizer(tokA, storage, "tk")
    val tokB = Corpus.buildTokenizer(docs, n = 6)
    val tv2 = Corpus.saveTokenizer(tokB, storage, "tk")
    val (tm, _) = Corpus.vacuumTokenizer(storage, "tk", keepLastPointers = 1)
    assert(tm > 0)
    assert(storage.versions("tk__tok") == Seq(tv2))
    val tok = Corpus.loadTokenizer(storage, "tk")
    assert(tok.applied(docs).count() == docs.count())
    intercept[IllegalArgumentException] {
      Corpus.loadTokenizer(storage, "tk", version = tv2 - 1)
    }
    // hybrid family: the nested dense pointers vacuum too
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val hA = Corpus.buildHybridIndex(docs, e)
    Corpus.saveHybridIndex(hA, storage, "hx")
    val hB = Corpus.buildHybridIndex(docs, e)
    val hv2 = Corpus.saveHybridIndex(hB, storage, "hx")
    val (hm, hd) = Corpus.vacuumHybridIndex(storage, "hx",
      keepLastPointers = 1)
    assert(hm > 0 && hd > 0)
    assert(storage.versions("hx__hybrid") == Seq(hv2))
    assert(storage.versions("hx__dense__ann").length == 1,
      "the unpinned dense POINTER generation must vacuum with its family")
    val hLoaded = Corpus.loadHybridIndex(storage, "hx")
    assert(Corpus.hybridTopK(docs, e, Seq(0L, 1L),
      index = Some(hLoaded)).count() > 0)
    intercept[IllegalArgumentException] {
      Corpus.loadHybridIndex(storage, "hx", version = hv2 - 1)
    }
    Seq(tokA, tokB).foreach(_.close())
    Seq(hA, hB, hLoaded).foreach(_.close())
  }

  test("saveTokenizer/loadTokenizer: loaded chunked apply is byte-identical with zero training passes") {
    val storage = new graft.sources.Storage(spark,
      java.nio.file.Files.createTempDirectory("graft-toksave-").toString)
    // a vocabulary-rich fixture (260 distinct 10-char words, each
    // occurring twice) so the trainer learns PAST the 64-merge chunk
    // size — the apply path then exercises its chunked replace chain
    val words = (for (a <- 'a' to 'z'; b <- 'a' to 'j')
      yield s"$a${b}quantify").toIndexedSeq
    val fixture = words.zipWithIndex.map { case (w, i) =>
      (i.toLong, s"$w ${words((i + 7) % words.size)} common shared tail")
    }.toDF("doc_id", "text")
    val tok = Corpus.buildTokenizer(fixture, n = 80)
    assert(tok.mergePairs.size > graft.operators.TextAnalysis.BpeMaxMergesPerRound,
      s"fixture must train past one chunk, got ${tok.mergePairs.size} merges")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val expect = tok.applied(fixture).collect().map(key).toSeq
    val v1 = Corpus.saveTokenizer(tok, storage, "bpe")
    // rehydrate: byte-identical apply, ZERO training passes
    val passesBefore = graft.operators.TextAnalysis.bpeTrainingPasses.get()
    val loaded = Corpus.loadTokenizer(storage, "bpe")
    val got = loaded.applied(fixture).collect().map(key).toSeq
    assert(graft.operators.TextAnalysis.bpeTrainingPasses.get() == passesBefore,
      "loading a persisted tokenizer must not retrain")
    assert(got == expect && got.nonEmpty)
    assert(loaded.mergePairs == tok.mergePairs,
      "rank order must survive the round trip exactly")
    // the persisted-vocab serve equals the in-plan-vocab apply
    val inPlan = graft.operators.TextAnalysis.bpeAppliedWith(
      fixture, loaded.mergePairs).collect().map(key).toSeq
    assert(got == inPlan)
    // time travel: a re-save publishes a new version, the old pointer
    // still reproduces the ORIGINAL counts bit-for-bit
    val tok2 = Corpus.buildTokenizer(fixture, n = 10)
    val v2 = Corpus.saveTokenizer(tok2, storage, "bpe")
    assert(v2 == v1 + 1)
    assert(Corpus.loadTokenizer(storage, "bpe", version = v1)
      .applied(fixture).collect().map(key).toSeq == expect)
    // a corpus the saved vocabulary does not cover fails LOUDLY (the
    // coverage guard), never undercounts
    intercept[Exception] {
      loaded.applied(Seq((1L, "neverseenword alpha"))
        .toDF("doc_id", "text")).collect()
    }
    Seq(tok, tok2, loaded).foreach(_.close())
  }

  test("describeIndexes: one frame over all five families — lag 0 -> n -> 0 across append/refresh, dir counts telegraph compaction") {
    val storage = new graft.sources.Storage(spark,
      java.nio.file.Files.createTempDirectory("graft-descr-").toString)
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val cut = docs.count() * 4 / 5
    storage.putVersioned("ddocs", docs.filter($"doc_id" < cut))
    storage.putVersioned("dvecs", e.filter($"vec_id" < cut))
    def dv = storage.versions("dvecs").last
    // one saved instance of every persisted family
    val ann = Corpus.buildAnnIndex(storage.readVersioned("dvecs"))
    Corpus.saveAnnIndex(ann, storage, "dann", corpusVersion = dv)
    val hyb = Corpus.buildHybridIndex(
      storage.readVersioned("ddocs"), storage.readVersioned("dvecs"))
    Corpus.saveHybridIndex(hyb, storage, "dhyb", vectorsCorpusVersion = dv)
    val pq = Corpus.buildIvfPqIndex(storage.readVersioned("dvecs"))
    Corpus.saveIvfPqIndex(pq, storage, "dpq", corpusVersion = dv)
    val pmb = Corpus.buildPairMiningBase(
      storage.readVersioned("ddocs"), storage.readVersioned("dvecs"))
    Corpus.savePairMiningBase(pmb, storage, "dpmb",
      docsVersion = storage.versions("ddocs").last, vectorsVersion = dv)
    val tok = Corpus.buildTokenizer(storage.readVersioned("ddocs"), n = 10)
    Corpus.saveTokenizer(tok, storage, "dtok")
    val corpusMap = Map("dann" -> "dvecs", "dhyb" -> "dvecs",
      "dhyb/docs" -> "ddocs",
      "dpq" -> "dvecs", "dpmb/docs" -> "ddocs", "dpmb/vectors" -> "dvecs")
    def describe() = Corpus.describeIndexes(storage, corpusMap).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(3)) ->
        ((Option(r.get(7)).map(_.asInstanceOf[Long]),
          Option(r.get(8)).map(_.asInstanceOf[Long]))))
      .toMap // (index, family, role) -> (lag, dir_count)
    val d0 = describe()
    // every saved family reports, nested arms under their parent only
    assert(d0.keys.map(_._2).toSet ==
      Set("ann", "hybrid", "ivfpq", "pmb", "tok"))
    assert(d0.keys.map(_._1).toSet ==
      Set("dann", "dhyb", "dpq", "dpmb", "dtok"),
      "nested pointer tables must not surface as standalone families")
    // freshly saved: every corpus row is caught up, every arm pinned
    // at its head, every artifact one directory
    assert(d0.forall { case (_, (lag, _)) => lag.contains(0L) },
      s"fresh save must show zero lag everywhere: $d0")
    assert(d0((("dann", "ann", "lists"))) == ((Some(0L), Some(1L))))
    assert(d0.contains(("dpq", "ivfpq", "codes")) &&
      d0.contains(("dpq", "ivfpq", "coarse.lists")) &&
      d0.contains(("dhyb", "hybrid", "postings")) &&
      d0.contains(("dhyb", "hybrid", "dense.lists")) &&
      d0.contains(("dpmb", "pmb", "fps")) &&
      d0.contains(("dtok", "tok", "merges")))
    // the corpora advance: every family's corpus row shows the lag
    storage.appendVersioned("ddocs", docs.filter($"doc_id" >= cut))
    storage.appendVersioned("dvecs", e.filter($"vec_id" >= cut))
    val d1 = describe()
    Seq(("dann", "ann", "corpus"), ("dhyb", "hybrid", "corpus"),
      ("dpq", "ivfpq", "corpus"), ("dpmb", "pmb", "docs"),
      ("dpmb", "pmb", "vectors")).foreach { k =>
      assert(d1(k)._1.contains(1L),
        s"$k must show one unconsumed corpus version: ${d1(k)}")
    }
    // arm rows are unaffected by corpus appends
    assert(d1((("dann", "ann", "lists")))._1.contains(0L))
    // the nightly refreshes catch up: lag back to 0, and the refreshed
    // lists/codes arms now carry the delta directory (dir_count 2 —
    // the compaction-cadence observable)
    Corpus.refreshAnnIndex(storage, "dann", "dvecs")
    Corpus.refreshHybridIndex(storage, "dhyb", "ddocs", "dvecs")
    Corpus.refreshIvfPqIndex(storage, "dpq", "dvecs")
    Corpus.refreshPairMiningBase(storage, "dpmb", "ddocs", "dvecs")
    val d2 = describe()
    assert(d2.forall { case (_, (lag, _)) => lag.contains(0L) },
      s"after the refreshes every lag must be back to zero: $d2")
    assert(d2((("dann", "ann", "lists"))) == ((Some(0L), Some(2L))))
    assert(d2((("dpq", "ivfpq", "codes")))._2.contains(2L))
    // compaction re-packs the pinned artifact: dir_count back to 1
    Corpus.compactAnnIndex(storage, "dann")
    val d3 = describe()
    assert(d3((("dann", "ann", "lists"))) == ((Some(0L), Some(1L))))
    // a mapped corpus table that does not exist (typo, pending
    // bootstrap) degrades to nulls — a dashboard poll must never crash
    val missing = Corpus.describeIndexes(storage,
        Map("dann" -> "no_such_table")).collect()
      .filter(r => r.getString(0) == "dann" && r.getString(3) == "corpus")
    assert(missing.length == 1 && missing(0).isNullAt(6) &&
      missing(0).isNullAt(7) && missing(0).isNullAt(8),
      s"missing corpus table must yield null head/lag/dir_count: ${missing.toSeq}")
    // a TORN/MALFORMED pointer (wrong row count here; missing columns
    // behave the same) degrades to ONE role="malformed" row for that
    // family — the healthy families still report in the same frame
    storage.putVersioned("broken__hybrid",
      Seq((1L, 2L), (3L, 4L)).toDF("postings_version", "dense_version"))
    val withBroken = Corpus.describeIndexes(storage, corpusMap).collect()
    val brokenRows = withBroken.filter(_.getString(0) == "broken")
    assert(brokenRows.length == 1 &&
      brokenRows(0).getString(3) == "malformed" &&
      brokenRows(0).isNullAt(5) && brokenRows(0).isNullAt(7),
      s"torn pointer must yield one degraded row: ${brokenRows.toSeq}")
    assert(withBroken.exists(r =>
      r.getString(0) == "dann" && r.getString(3) == "lists"),
      "healthy families must survive a neighbor's torn pointer")
    ann.close(); hyb.close(); pq.close(); pmb.close(); tok.close()
  }
}
