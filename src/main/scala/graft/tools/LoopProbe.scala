package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Corpus
import graft.sources.{Storage, Tables}

/** Measures the two continuous loops round 13 closed — hybrid and
  * pair-mining — at the 100× corpus, plus the cost of the
  * staleness observable itself:
  *
  *  - HYBRID: BOTH arms refresh O(delta) — the dense arm assigns
  *    the vector delta under frozen centroids, the lexical arm
  *    appends the delta docs' postings under the frozen idf/avgdl
  *    the save pinned. The probe times the dense arm alone, the
  *    full O(delta) refresh night, AND the slow-cadence exact
  *    postings recalc (`rebuildHybridPostings`) — the split that
  *    sets the weekly-vs-nightly cadence dial is measured, not
  *    asserted. Sanity: a post-refresh delta doc is served by BOTH
  *    arms (its postings exist; its vector unit-hits itself).
  *  - PAIR-MINING: nightly fold (QA + first-arrival fps + frozen-
  *    centroid assignment, all O(delta)) vs the full base rebuild.
  *    Sanity: folded fps count equals a from-scratch QA pass over
  *    the grown corpus.
  *  - describeIndexes over the populated warehouse: the scaladoc
  *    claims metadata-only / dashboard-pollable — the probe prints
  *    what one poll actually costs with every family present.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft100x \
  *     sbt "runMain graft.tools.LoopProbe"
  */
object LoopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft100x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-loop-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val wh = java.nio.file.Files.createTempDirectory("graft-loop-wh-")
    val storage = new Storage(spark, wh.toString)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val nd = docs.count()
    val nv = e.count()
    // ids in the replicated corpus are SPARSE (replica offsets):
    // slice on id % 100, like RefreshProbe
    val dPct = col("doc_id") % 100
    val vPct = col("vec_id") % 100

    // ---- hybrid loop ----
    storage.putVersioned("hdocs", docs.filter(dPct < 80))
    storage.putVersioned("hvecs", e.filter(vPct < 80))
    val (built, tBuild) = time {
      val idx = Corpus.buildHybridIndex(
        storage.readVersioned("hdocs"), storage.readVersioned("hvecs"))
      idx.postings.count(); idx.ann.lists.count(); idx
    }
    // the FULL save: freezes idf/avgdl so the nightly lexical refresh
    // can append O(delta) instead of rebuilding O(corpus)
    Corpus.saveHybridIndex(built, storage, "hyb",
      vectorsCorpusVersion = storage.versions("hvecs").last,
      docs = storage.readVersioned("hdocs"),
      docsCorpusVersion = storage.versions("hdocs").last)
    println(f"corpus $sfDir docs=$nd vecs=$nv hybrid build+save=$tBuild%6.1fs")
    // one night: 20% more docs and vectors arrive
    storage.appendVersioned("hdocs", docs.filter(dPct >= 80))
    storage.appendVersioned("hvecs", e.filter(vPct >= 80))
    // the dense arm alone (the call the hybrid refresh makes first):
    // O(delta) frozen-centroid assignment
    val (_, tDense) = time {
      Corpus.refreshAnnIndex(storage, "hyb__dense", "hvecs")
    }
    // the full hybrid refresh: the dense arm is now a no-op re-pin, so
    // this duration is the LEXICAL delta append under the frozen
    // stats + two pointer commits — O(delta), the round-14 fix for
    // the measured 138s O(corpus) rebuild
    val (_, tHybrid) = time {
      Corpus.refreshHybridIndex(storage, "hyb", "hdocs", "hvecs")
    }
    // the slow-cadence EXACT recalc (run weekly where the refresh is
    // nightly): the O(corpus) cost the nightly path no longer pays
    val (_, tExact) = time {
      Corpus.rebuildHybridPostings(storage, "hyb", "hdocs")
    }
    val loaded = Corpus.loadHybridIndex(storage, "hyb")
    // a delta doc that HAS an embedding (the corpus may carry more
    // docs than vectors), so both arms can be probed on it
    val deltaDoc = docs.filter(dPct >= 80)
      .join(e, docs("doc_id") === e("vec_id"))
      .orderBy(col("doc_id")).limit(1)
      .collect()(0).getLong(0)
    require(loaded.postings.filter(col("doc_id") === deltaDoc).count() > 0,
      "rebuilt postings must cover the delta doc")
    val unit = loaded.ann.topK(
        e.filter(col("vec_id") === deltaDoc), k = 1).collect()
    require(unit.length == 1 && math.abs(unit(0).getDouble(3) - 1.0) < 1e-9,
      "the dense arm must unit-hit the delta vector")
    require(loaded.ann.lists.count() == nv,
      "every vector must be indexed after the refresh")
    println(f"hybrid night (20%% delta): dense arm=$tDense%6.1fs " +
      f"lexical frozen-stats append+pins=$tHybrid%6.1fs vs exact " +
      f"recalc=$tExact%6.1fs (the weekly verb) — both arms serve the " +
      "delta doc")

    // ---- pair-mining loop ----
    storage.putVersioned("pdocs", docs.filter(dPct < 80))
    storage.putVersioned("pvecs", e.filter(vPct < 80))
    val (base, tBase) = time {
      val b = Corpus.buildPairMiningBase(
        storage.readVersioned("pdocs"), storage.readVersioned("pvecs"))
      b.fingerprints.count(); b.index.lists.count(); b
    }
    Corpus.savePairMiningBase(base, storage, "pmb",
      docsVersion = storage.versions("pdocs").last,
      vectorsVersion = storage.versions("pvecs").last)
    storage.appendVersioned("pdocs", docs.filter(dPct >= 80))
    storage.appendVersioned("pvecs", e.filter(vPct >= 80))
    val (_, tFold) = time {
      Corpus.refreshPairMiningBase(storage, "pmb", "pdocs", "pvecs")
    }
    val folded = Corpus.loadPairMiningBase(storage, "pmb")
    val expectFps = graft.operators.Pipeline
      .qualityFp(storage.readVersioned("pdocs"))
      .select(col("fp")).distinct().count()
    require(folded.fingerprints.count() == expectFps,
      s"folded base must hold one fp per QA survivor " +
        s"(${folded.fingerprints.count()} vs $expectFps)")
    val (_, tRebuild) = time {
      val b = Corpus.buildPairMiningBase(
        storage.readVersioned("pdocs"), storage.readVersioned("pvecs"))
      b.fingerprints.count(); b.index.lists.count(); b.close()
    }
    println(f"pair-mining base build=$tBase%6.1fs; nightly fold " +
      f"(20%% delta)=$tFold%6.1fs vs full rebuild=$tRebuild%6.1fs; " +
      s"fps=$expectFps")

    // ---- TextRank model loop: fold-the-delta vs full rebuild ----
    storage.putVersioned("tdocs", docs.filter(dPct < 80))
    val (rm, tRankBuild) = time {
      Corpus.buildRankModel(storage.readVersioned("tdocs"))
    }
    Corpus.saveRankModel(rm, storage, "trm",
      docsCorpusVersion = storage.versions("tdocs").last)
    storage.appendVersioned("tdocs", docs.filter(dPct >= 80))
    val (_, tRankFold) = time {
      Corpus.refreshRankModel(storage, "trm", "tdocs")
    }
    val (_, tRankRebuild) = time {
      Corpus.buildRankModel(storage.readVersioned("tdocs")).close()
    }
    println(f"textrank model: build(80%%)=$tRankBuild%6.1fs; nightly " +
      f"fold (20%% delta)=$tRankFold%6.1fs vs full rebuild=" +
      f"$tRankRebuild%6.1fs")
    rm.close()

    // ---- growth-ledger loop: the bucket-pruned history read ----
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_ns")).localCheckpoint()
    val ne = ev.count()
    storage.putVersioned("gev", ev)
    val (_, tLedger) = time {
      graft.api.Events.buildGrowthLedger(storage, "gev", "gl")
    }
    val vaPtr = storage.readVersioned("gl__gl").collect()(0)
      .getAs[Long]("act_version")
    // the concentrated-delta case the bucket prune exists for: ONE
    // affected user (a correction, a single-tenant backfill) against
    // the full activity history
    val oneUser = ev.select(col("user_id")).limit(1).collect()(0).getLong(0)
    val affected1 = {
      import spark.implicits._
      Seq(oneUser).toDF("user_id")
    }
    val (prunedN, tPruned) = time {
      graft.api.Events.affectedActivity(storage, "gl", vaPtr, affected1)
        .count()
    }
    val (fullN, tFull) = time {
      storage.readVersioned("gl__act", vaPtr).drop("bucket")
        .join(affected1, Seq("user_id"), "left_semi").count()
    }
    require(prunedN == fullN,
      s"the prune must never change the rows ($prunedN vs $fullN)")
    // the bulk-delta case degrades gracefully: 20% of users bring a
    // genuinely new day (every bucket touched — the prune steps aside,
    // the per-user decomposable fold carries the night)
    storage.appendVersioned("gev",
      ev.filter(col("user_id") % 100 >= 80)
        .withColumn("ts_ns", col("ts_ns") + lit(30L * 86400L * 1000000000L)))
    val (_, tBulk) = time {
      graft.api.Events.refreshGrowthLedger(storage, "gev", "gl")
    }
    println(f"growth ledger: events=$ne build=$tLedger%6.1fs; " +
      f"1-user history read pruned=$tPruned%5.2fs vs full-scan=" +
      f"$tFull%5.2fs; bulk 20%%-user night=$tBulk%6.1fs")

    // ---- the observable's own cost, warehouse fully populated ----
    val corpusMap = Map("hyb" -> "hvecs", "hyb/docs" -> "hdocs",
      "trm" -> "tdocs", "gl" -> "gev",
      "pmb/docs" -> "pdocs", "pmb/vectors" -> "pvecs")
    val (rows, tDescribe) = time {
      Corpus.describeIndexes(storage, corpusMap).collect()
    }
    require(rows.nonEmpty && rows.forall(r =>
      r.isNullAt(7) || r.getLong(7) == 0L),
      "every family must report caught-up after its refresh")
    println(f"describeIndexes over ${rows.length} rows " +
      f"(4 families + arms): $tDescribe%5.2fs — metadata-only")

    built.close(); loaded.close(); base.close(); folded.close()
    spark.stop()
  }
}
