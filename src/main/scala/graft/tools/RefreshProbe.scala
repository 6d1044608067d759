package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Corpus
import graft.sources.{Storage, Tables}

/** Measures the claim behind `Corpus.refreshAnnIndex` at the 100×
  * corpus: nightly index maintenance must cost O(delta), not
  * O(corpus) — the delta is consumed through the versioned table's
  * CDC read (only the appended directories are scanned), assigned
  * under the FROZEN centroids (no Lloyd pass), and appended to the
  * lists table as one O(delta) commit. The probe builds the base
  * index once, then refreshes at two delta fractions and times the
  * full retrain-and-save alternative for the same grown corpus —
  * the number an operator compares against when choosing a retrain
  * cadence. Sanity: after each refresh, a sample of delta vectors
  * must find THEMSELVES at cosine 1 (serve-equality with a from-
  * scratch assignment under the same centroids is spec-pinned in
  * `CorpusSpec`; this is the at-scale smoke of the same fact).
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft100x \
  *     sbt "runMain graft.tools.RefreshProbe 0.05 0.20"
  *
  * Each argument is one delta fraction (appended on top of the
  * previous state, compounding like real nights).
  */
object RefreshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft100x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-refresh-probe")
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

    val wh = java.nio.file.Files.createTempDirectory("graft-refresh-wh-")
    val storage = new Storage(spark, wh.toString)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val n = e.count()
    val fracs = (if (args.nonEmpty) args.toSeq else Seq("0.05", "0.20"))
      .map(_.toDouble)
    val baseFrac = 1.0 - fracs.sum
    require(baseFrac > 0, s"delta fractions must sum below 1: $fracs")

    // day 0: train + persist on the base slice. Ids in the replicated
    // 100x corpus are SPARSE (replica offsets), so slices cut on
    // vec_id % 100 — a value split would land everything in one slice.
    val pct = col("vec_id") % 100
    val baseCut = (baseFrac * 100).toLong
    storage.putVersioned("vecs", e.filter(pct < baseCut))
    val baseRows = storage.readVersioned("vecs").count()
    val (built, tBuild) = time {
      val idx = Corpus.buildAnnIndex(storage.readVersioned("vecs"))
      idx.lists.count(); idx
    }
    val (_, tSave) = time {
      Corpus.saveAnnIndex(built, storage, "idx",
        corpusVersion = storage.versions("vecs").last)
    }
    println(f"corpus $sfDir n=$n base=$baseRows " +
      f"build=$tBuild%7.1fs save=$tSave%5.1fs")

    // nights 1..k: append a delta, refresh, sanity-probe
    var lo = baseCut
    fracs.foreach { frac =>
      val hi = math.min(100L, lo + (frac * 100).toLong)
      val delta = e.filter(pct >= lo && pct < hi)
      storage.appendVersioned("vecs", delta)
      val (_, tRefresh) = time {
        Corpus.refreshAnnIndex(storage, "idx", "vecs")
      }
      val loaded = Corpus.loadAnnIndex(storage, "idx")
      // the upsert witness: the delta's vectors are IN the refreshed
      // lists (a sample by id), and serving a delta query returns a
      // cosine-1 hit (this replicated corpus carries exact-duplicate
      // embeddings, so the tie-break may surface a lower-id twin —
      // either way the unit vector is served)
      val sampleIds = delta.orderBy(col("vec_id")).limit(4)
        .collect().map(_.getLong(0)).toSeq
      val listed = loaded.lists
        .filter(col("c_id").isInCollection(sampleIds)).count()
      val unitHits = loaded.topK(
          delta.orderBy(col("vec_id")).limit(4), k = 1).collect()
        .count(r => math.abs(r.getDouble(3) - 1.0) < 1e-9)
      println(f"delta=${delta.count()}%7d (${frac * 100}%4.1f%%) " +
        f"refresh=$tRefresh%7.1fs listed=$listed/4 unit_hits=$unitHits/4")
      require(listed == 4 && unitHits == 4,
        "refreshed index must carry and serve the delta")
      loaded.close()
      lo = hi
    }

    // the alternative an operator weighs refresh against: full retrain
    // + re-save on the grown corpus
    val (_, tRetrain) = time {
      val idx = Corpus.buildAnnIndex(storage.readVersioned("vecs"))
      Corpus.saveAnnIndex(idx, storage, "idx_full",
        corpusVersion = storage.versions("vecs").last)
      idx.close()
    }
    println(f"full retrain+save on grown corpus: $tRetrain%7.1fs")
    built.close()
    spark.stop()
  }
}
