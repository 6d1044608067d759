package graft.api

import graft.SparkTestBase

/** The persisted TextRank model (the last session-scoped model
  * artifact to join the save/load/refresh family pattern): loaded
  * ranks must serve the gated queries byte-identically with zero
  * corpus scans, and the CDC refresh — fold delta pair counts, re-run
  * the vocabulary-bounded iterations — must equal a full rebuild
  * bit-for-bit (the pair rollup is additive under appends and the
  * whole computation is integer fixed-point).
  */
class RankModelSpec extends SparkTestBase {
  import spark.implicits._

  private val GR = graft.operators.GraphRank
  private def docs = graft.sources.Tables.documents(spark, sf0001)

  private def rankRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

  private def phraseRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

  test("save/load round-trip: loaded model serves ta_textrank and ta_keyphrase byte-identically, zero corpus scans") {
    val storage = new graft.sources.Storage(spark,
      java.nio.file.Files.createTempDirectory("graft-trm-").toString)
    val model = Corpus.buildRankModel(docs)
    val v1 = Corpus.saveRankModel(model, storage, "trm")
    val loaded = Corpus.loadRankModel(storage, "trm")
    // the serve plan references ONLY the two loaded checkpoint scans —
    // the "zero corpus scans" claim is structural, and the rows are
    // the certification: exact longs, exact doubles, same order
    assert(rankRows(GR.keywords(loaded.ranks)) ==
      rankRows(GR.taTextrank(spark, sf0001)),
      "loaded ranks must serve the gated ta_textrank byte-identically")
    assert(phraseRows(GR.keyphrases(loaded.pairs, loaded.ranks)) ==
      phraseRows(GR.taKeyphrase(spark, sf0001)),
      "loaded model must serve the gated ta_keyphrase byte-identically")
    // a snapshot-only save (no docs version) refuses to refresh,
    // naming the fix — the refreshAnnIndex posture
    storage.putVersioned("trmdocs", docs)
    val ex = intercept[IllegalArgumentException] {
      Corpus.refreshRankModel(storage, "trm", "trmdocs")
    }
    assert(ex.getMessage.contains("saveRankModel"))
    // re-saves append pointer versions; time travel loads the original
    val v2 = Corpus.saveRankModel(
      Corpus.buildRankModel(docs.limit(50)), storage, "trm")
    assert(v2 == v1 + 1)
    val old = Corpus.loadRankModel(storage, "trm", version = v1)
    assert(rankRows(GR.keywords(old.ranks)) ==
      rankRows(GR.keywords(model.ranks)))
    Seq(model, loaded, old).foreach(_.close())
  }

  test("refreshRankModel: fold-the-delta refresh equals a full rebuild bit-for-bit; orphans and no-ops handled") {
    val storage = new graft.sources.Storage(spark,
      java.nio.file.Files.createTempDirectory("graft-trref-").toString)
    val cut = docs.count() * 4 / 5
    storage.putVersioned("rdocs", docs.filter($"doc_id" < cut))
    val m0 = Corpus.buildRankModel(storage.readVersioned("rdocs"))
    val pv1 = Corpus.saveRankModel(m0, storage, "trx",
      docsCorpusVersion = storage.versions("rdocs").last)
    // a crashed earlier refresh strands an orphan pairs version above
    // the pinned one — the fold must base on the PIN and ignore it
    storage.putVersioned("trx__pairs",
      m0.pairs.unionAll(m0.pairs))
    storage.appendVersioned("rdocs", docs.filter($"doc_id" >= cut))
    val pv2 = Corpus.refreshRankModel(storage, "trx", "rdocs")
    assert(pv2 == pv1 + 1)
    val refreshed = Corpus.loadRankModel(storage, "trx")
    val rebuilt = Corpus.buildRankModel(docs)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(pairSet(refreshed.pairs) == pairSet(rebuilt.pairs),
      "folded pair counts must equal a from-scratch corpus pass")
    assert(rankRows(GR.keywords(refreshed.ranks)) ==
      rankRows(GR.keywords(rebuilt.ranks)),
      "refresh must equal rebuild bit-for-bit (integer fixed-point)")
    // caught up: a second refresh is a pointer no-op
    assert(Corpus.refreshRankModel(storage, "trx", "rdocs") == pv2)
    assert(storage.versions("trx__tr").last == pv2)
    Seq(m0, refreshed, rebuilt).foreach(_.close())
  }

  test("describeIndexes reports the textrank family; vacuum respects pins") {
    val storage = new graft.sources.Storage(spark,
      java.nio.file.Files.createTempDirectory("graft-trdesc-").toString)
    val cut = docs.count() * 4 / 5
    storage.putVersioned("tdocs", docs.filter($"doc_id" < cut))
    val m = Corpus.buildRankModel(storage.readVersioned("tdocs"))
    Corpus.saveRankModel(m, storage, "ttr",
      docsCorpusVersion = storage.versions("tdocs").last)
    def desc() = Corpus.describeIndexes(storage, Map("ttr" -> "tdocs"))
      .collect()
      .map(r => (r.getString(1), r.getString(3)) ->
        Option(r.get(7)).map(_.asInstanceOf[Long])).toMap
    val d0 = desc()
    assert(d0.keySet == Set(("textrank", "pairs"), ("textrank", "ranks"),
      ("textrank", "docs")))
    assert(d0.values.forall(_.contains(0L)), s"fresh save, zero lag: $d0")
    storage.appendVersioned("tdocs", docs.filter($"doc_id" >= cut))
    assert(desc()(("textrank", "docs")).contains(1L),
      "an unconsumed docs append must show as lag")
    val pv = Corpus.refreshRankModel(storage, "ttr", "tdocs")
    assert(desc().values.forall(_.contains(0L)),
      "after the refresh every lag must be back to zero")
    // vacuum: keep the newest pointer; its pinned pairs/ranks survive,
    // the superseded generation's versions are reclaimed
    val (vm, vd) = Corpus.vacuumRankModel(storage, "ttr",
      keepLastPointers = 1)
    assert(vm > 0 && vd > 0)
    assert(storage.versions("ttr__tr") == Seq(pv))
    val survivor = Corpus.loadRankModel(storage, "ttr")
    assert(rankRows(GR.keywords(survivor.ranks)).nonEmpty)
    intercept[IllegalArgumentException] {
      Corpus.loadRankModel(storage, "ttr", version = pv - 1)
    }
    Seq(m, survivor).foreach(_.close())
  }
}
