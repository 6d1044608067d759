package graft.api

import java.nio.file.Files

import graft.SparkTestBase

/** Model-based fuzz of an index FAMILY's pointer protocol — the
  * Corpus-layer composition above the storage commit protocol
  * (`StorageModelSpec` fuzzes the latter; until now the layer above —
  * build/refresh/compact/vacuum/load-at-version interleavings, plus
  * the crash-between-artifact-append-and-pointer-commit window — was
  * pinned only by hand-written fixtures).
  *
  * A random program over the ANN family (the base pattern every other
  * family nests) runs against an in-memory model of
  * {pointer generation → (indexed id set, consumed corpus version)}:
  *
  *  - `versions(<fam>__ann)` equals the model's retained generations;
  *  - loading ANY retained generation serves exactly that generation's
  *    indexed ids — no duplicates (the double-indexing failure class),
  *    no leakage from later corpus appends (time-travel isolation);
  *  - every pointer's `corpus_version` equals what the model says that
  *    generation consumed;
  *  - a refresh never trains; a no-op refresh (corpus unchanged)
  *    commits nothing;
  *  - an ORPHAN lists version (a refresh that died between its lists
  *    append and its pointer commit, injected directly) is invisible:
  *    later refreshes base on the PIN and the duplicate rows can never
  *    be served;
  *  - vacuum keeps exactly what retained pointers pin; loading a
  *    vacuumed generation refuses.
  *
  * Seeded, so a failure replays deterministically; the soak asserts
  * COVERAGE — each structural path (orphan injection, no-op refresh,
  * compaction, re-save, vacuumed-load refusal) must fire at least
  * once, or the soak is not exercising what it claims.
  */
class IndexFamilyModelSpec extends SparkTestBase {
  import spark.implicits._

  // coverage across the whole soak
  private var orphanInjections = 0
  private var noopRefreshes = 0
  private var compactions = 0
  private var resaves = 0
  private var vacuumedLoadRefusals = 0

  test("ann-family fuzz: random build/refresh/compact/vacuum/crash programs match the pointer model or refuse honestly") {
    Seq(5L, 20260816L, 77L, 4242L, 31337L, 11L).foreach(fuzz)
    assert(orphanInjections > 0, "no crashed-refresh orphan was exercised")
    assert(noopRefreshes > 0, "no no-op refresh was exercised")
    assert(compactions > 0, "no compaction was exercised")
    assert(resaves > 0, "no re-save generation was exercised")
    assert(vacuumedLoadRefusals > 0,
      "no vacuumed-generation load refusal was exercised")
  }

  // hybrid-family coverage across its soak
  private var hybridNoops = 0
  private var exactUpgrades = 0
  private var hybridOrphans = 0
  private var hybridRebuilds = 0
  private var hybridCompactions = 0
  private var hybridVacuumRefusals = 0

  test("hybrid-family fuzz: frozen-stats incremental/exact/upgrade/no-op interleavings match the staleness model") {
    Seq(3L, 20260817L, 88L, 424242L).foreach(fuzzHybrid)
    assert(hybridNoops > 0, "no fully-caught-up no-op was exercised")
    assert(exactUpgrades > 0, "no legacy-pointer exact upgrade was exercised")
    assert(hybridOrphans > 0, "no crashed-refresh postings orphan was exercised")
    assert(hybridRebuilds > 0, "no explicit exact recalc was exercised")
    assert(hybridCompactions > 0, "no hybrid compaction was exercised")
    assert(hybridVacuumRefusals > 0,
      "no vacuumed-generation load refusal was exercised")
  }

  private def fuzzHybrid(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val st = new graft.sources.Storage(spark,
      Files.createTempDirectory(s"graft-hybfuzz$seed-").toString)
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").localCheckpoint()
    val e = graft.sources.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").localCheckpoint()
    val nd = docs.count()
    val nv = e.count()
    // ids of docs that produce at least one posting (non-empty text)
    val tokIds = docs
      .filter(org.apache.spark.sql.functions.size(
        graft.functions.tokens($"text")) > 0)
      .select($"doc_id").collect().map(_.getLong(0)).toSet

    var dBound = nd * 2 / 5
    var vBound = nv * 2 / 5
    st.putVersioned("hdocs", docs.filter($"doc_id" < dBound))
    st.putVersioned("hvecs", e.filter($"vec_id" < vBound))

    // model: one entry per retained pointer generation —
    // (pv, postings doc bound, indexed vec bound, stale_docs or -1
    // for a legacy generation without frozen stats)
    var gens = Vector.empty[(Long, Long, Long, Long)]
    var frozen = rnd.nextBoolean() // half the seeds start legacy

    val built = Corpus.buildHybridIndex(
      st.readVersioned("hdocs"), st.readVersioned("hvecs"))
    val pv0 =
      if (frozen)
        Corpus.saveHybridIndex(built, st, "hf",
          vectorsCorpusVersion = st.versions("hvecs").last,
          docs = st.readVersioned("hdocs"),
          docsCorpusVersion = st.versions("hdocs").last)
      else Corpus.saveHybridIndex(built, st, "hf",
        vectorsCorpusVersion = st.versions("hvecs").last)
    gens :+= ((pv0, dBound, vBound, if (frozen) 0L else -1L))
    built.close()

    for (op <- 1 to 14) {
      rnd.nextInt(8) match {
        case 0 => // docs append
          if (dBound < nd) {
            val hi = math.min(nd, dBound + 1 + rnd.nextInt((nd / 8).toInt))
            st.appendVersioned("hdocs",
              docs.filter($"doc_id" >= dBound && $"doc_id" < hi))
            dBound = hi
          }
        case 1 => // vectors append
          if (vBound < nv) {
            val hi = math.min(nv, vBound + 1 + rnd.nextInt((nv / 8).toInt))
            st.appendVersioned("hvecs",
              e.filter($"vec_id" >= vBound && $"vec_id" < hi))
            vBound = hi
          }
        case 2 | 3 => // nightly refresh: no-op / incremental / exact
          // upgrade depending on the pointer's state
          val last = gens.last
          val passes = graft.operators.Similarity.trainingPasses.get()
          val pv = Corpus.refreshHybridIndex(st, "hf", "hdocs", "hvecs")
          assert(graft.operators.Similarity.trainingPasses.get() == passes,
            s"seed=$seed op=$op: a hybrid refresh must never train")
          if (!frozen) {
            // legacy pointer: the exact path runs once and upgrades
            gens :+= ((pv, dBound, vBound, 0L))
            frozen = true
            exactUpgrades += 1
          } else if (dBound == last._2 && vBound == last._3) {
            assert(pv == last._1,
              s"seed=$seed op=$op: caught-up refresh must commit nothing")
            hybridNoops += 1
          } else if (dBound == last._2) // dense-only advance: re-pin
            gens :+= ((pv, last._2, vBound, last._4))
          else // frozen-stats append accumulates drift
            gens :+= ((pv, dBound, vBound, last._4 + (dBound - last._2)))
        case 4 => // explicit exact recalc: drift resets, dense arm kept
          val last = gens.last
          val pv = Corpus.rebuildHybridPostings(st, "hf", "hdocs")
          gens :+= ((pv, dBound, last._3, 0L))
          frozen = true
          hybridRebuilds += 1
        case 5 => // compaction: content-equal, dir counts re-pack
          val last = gens.last
          val pv = Corpus.compactHybridIndex(st, "hf")
          gens :+= ((pv, last._2, last._3, last._4))
          assert(st.versionDirCount("hf__postings") == 1,
            s"seed=$seed op=$op: compaction must re-pack the postings")
          hybridCompactions += 1
        case 6 => // crashed refresh: postings append landed, pointer
          // commit did not — the duplicate rows must never serve
          val pinned = st.readVersioned("hf__hybrid").collect()(0)
            .getAs[Long]("postings_version")
          st.appendVersionedOnto("hf__postings",
            st.readVersioned("hf__postings", pinned).limit(3), pinned)
          hybridOrphans += 1
        case 7 => // vacuum a pointer tail; dropped generations refuse
          val keep = 1 + rnd.nextInt(gens.size)
          val dropped = gens.dropRight(keep).map(_._1)
          Corpus.vacuumHybridIndex(st, "hf", keepLastPointers = keep)
          gens = gens.takeRight(keep)
          dropped.lastOption.foreach { v =>
            intercept[IllegalArgumentException] {
              Corpus.loadHybridIndex(st, "hf", version = v)
            }
            hybridVacuumRefusals += 1
          }
      }

      // ---- invariants after every op ----
      assert(st.versions("hf__hybrid") == gens.map(_._1),
        s"seed=$seed op=$op: retained pointer generations diverged")
      val (pv, pd, pvv, stale) = gens(rnd.nextInt(gens.size))
      val idx = Corpus.loadHybridIndex(st, "hf", version = pv)
      val post = idx.postings.select($"doc_id", $"term").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      idx.close()
      // postings cover exactly the consumed docs (with tokens), once:
      // an orphan surfacing would show as duplicate (doc, term) pairs
      assert(post.length == post.distinct.length,
        s"seed=$seed op=$op: generation $pv serves duplicate postings")
      assert(post.map(_._1).toSet == tokIds.filter(_ < pd),
        s"seed=$seed op=$op: generation $pv postings must cover docs " +
          s"[0, $pd) exactly")
      val ptr = st.readVersioned("hf__hybrid", pv).collect()(0)
      if (stale >= 0L)
        assert(ptr.getAs[Long]("stale_docs") == stale,
          s"seed=$seed op=$op: generation $pv staleness diverged " +
            s"(${ptr.getAs[Long]("stale_docs")} vs $stale)")
      val lists = st.readVersioned("hf__dense__lists",
        st.readVersioned("hf__dense__ann",
            ptr.getAs[Long]("dense_version")).collect()(0)
          .getAs[Long]("lists_version"))
      assert(lists.count() == pvv,
        s"seed=$seed op=$op: generation $pv dense arm must index $pvv vectors")
    }
  }

  private def fuzz(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val st = new graft.sources.Storage(spark,
      Files.createTempDirectory(s"graft-famfuzz$seed-").toString)
    val e = graft.sources.Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").localCheckpoint()
    val n = e.count()

    // the corpus grows by contiguous id slices, so "content at corpus
    // version v" is just an id bound — the model stays trivial
    var bound = n * 2 / 5
    st.putVersioned("vecs", e.filter($"vec_id" < bound))
    def corpusHead = st.versions("vecs").last

    // model: one entry per RETAINED pointer generation
    // (pv, idBound, consumedV, stale rows under the frozen centroids)
    var gens = Vector.empty[(Long, Long, Long, Long)]

    val built = Corpus.buildAnnIndex(st.readVersioned("vecs"))
    gens :+= ((Corpus.saveAnnIndex(built, st, "fam",
      corpusVersion = corpusHead), bound, corpusHead, 0L))
    built.close()

    for (op <- 1 to 16) {
      rnd.nextInt(8) match {
        case 0 | 1 => // corpus append: a fresh id slice lands
          if (bound < n) {
            val hi = math.min(n, bound + 1 + rnd.nextInt((n / 8).toInt))
            st.appendVersioned("vecs",
              e.filter($"vec_id" >= bound && $"vec_id" < hi))
            bound = hi
          }
        case 2 | 3 => // nightly refresh: O(delta), zero training; a
          // caught-up refresh commits nothing
          val passes = graft.operators.Similarity.trainingPasses.get()
          val head = corpusHead
          val pv = Corpus.refreshAnnIndex(st, "fam", "vecs")
          assert(graft.operators.Similarity.trainingPasses.get() == passes,
            s"seed=$seed op=$op: refresh must never train")
          if (head == gens.last._3) {
            assert(pv == gens.last._1,
              s"seed=$seed op=$op: caught-up refresh must be a no-op")
            noopRefreshes += 1
          } else gens :+= ((pv, bound, head,
            gens.last._4 + (bound - gens.last._2)))
        case 4 => // compaction: content-equal, new pointer generation
          val pv = Corpus.compactAnnIndex(st, "fam")
          gens :+= ((pv, gens.last._2, gens.last._3, gens.last._4))
          assert(st.versionDirCount("fam__lists") == 1,
            s"seed=$seed op=$op: compaction must re-pack to one dir")
          compactions += 1
        case 5 => // crashed refresh: the lists append landed, the
          // pointer commit did not — inject the orphan (duplicate
          // rows: exactly what a replayed crashed night would stack)
          val pinned = Corpus.pointerRow(st, "fam__ann")
            .getAs[Long]("lists_version")
          st.appendVersionedOnto("fam__lists",
            st.readVersioned("fam__lists", pinned).limit(2), pinned)
          orphanInjections += 1
        case 6 => // re-save: a fresh generation trained from the
          // current snapshot (the weekly retrain posture)
          val b2 = Corpus.buildAnnIndex(st.readVersioned("vecs"))
          val head = corpusHead
          gens :+= ((Corpus.saveAnnIndex(b2, st, "fam",
            corpusVersion = head), bound, head, 0L))
          b2.close()
          resaves += 1
        case 7 => // vacuum: retain a random pointer tail; loading a
          // dropped generation must refuse
          val keep = 1 + rnd.nextInt(gens.size)
          val dropped = gens.dropRight(keep).map(_._1)
          Corpus.vacuumAnnIndex(st, "fam", keepLastPointers = keep)
          gens = gens.takeRight(keep)
          dropped.lastOption.foreach { v =>
            intercept[IllegalArgumentException] {
              Corpus.loadAnnIndex(st, "fam", version = v)
            }
            vacuumedLoadRefusals += 1
          }
      }

      // ---- invariants after every op ----
      assert(st.versions("fam__ann") == gens.map(_._1),
        s"seed=$seed op=$op: retained pointer generations diverged")
      // load a RANDOM retained generation: exactly its ids, no
      // duplicates (orphan rows surfacing would show up here), no
      // leakage from later appends
      val (pv, idBound, consumed, stale) = gens(rnd.nextInt(gens.size))
      val idx = Corpus.loadAnnIndex(st, "fam", version = pv)
      val served = idx.lists.select($"c_id").collect()
        .map(_.getLong(0)).sorted.toSeq
      idx.close()
      assert(served == (0L until idBound),
        s"seed=$seed op=$op: generation $pv must serve ids [0, $idBound) " +
          s"exactly, got ${served.length} rows")
      val pRow = Corpus.pointerRow(st, "fam__ann", pv)
      assert(pRow.getAs[Long]("corpus_version") == consumed,
        s"seed=$seed op=$op: generation $pv consumed-version diverged")
      assert(pRow.getAs[Long]("stale_rows") == stale,
        s"seed=$seed op=$op: generation $pv frozen-centroid drift " +
          s"diverged (${pRow.getAs[Long]("stale_rows")} vs $stale)")
    }

    // the loop ends caught up: one final refresh serves the whole
    // corpus at its head
    val pvF = Corpus.refreshAnnIndex(st, "fam", "vecs")
    val idxF = Corpus.loadAnnIndex(st, "fam", version = pvF)
    assert(idxF.lists.count() == bound)
    idxF.close()
  }
}
