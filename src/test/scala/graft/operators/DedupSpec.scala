package graft.operators

import graft.SparkTestBase
import graft.functions.SimHash

/** Quality checks for the hash-family dedup paths against the exact
  * n-gram-Jaccard oracle (which itself hash-matches DuckDB).
  */
class DedupSpec extends SparkTestBase {

  private lazy val exactPairs: Map[(Long, Long), Double] =
    Dedup.ddNgramJaccard(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap

  test("corpus contains planted near-duplicates (test precondition)") {
    assert(exactPairs.values.count(_ >= 0.5) >= 5,
      s"expected planted near-dups, got ${exactPairs.values.max}")
  }

  test("minhash LSH recalls every high-jaccard pair and estimates within 0.2") {
    val lsh = Dedup.ddMinhashLsh(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val strong = exactPairs.filter(_._2 >= 0.5)
    val recalled = strong.keys.count(lsh.contains)
    assert(recalled >= strong.size * 0.9,
      s"LSH recalled $recalled of ${strong.size} jaccard>=0.5 pairs")
    strong.foreach { case (pair, j) =>
      lsh.get(pair).foreach { est =>
        assert(math.abs(est - j) <= 0.2,
          s"pair $pair: est $est vs exact $j")
      }
    }
  }

  test("simhash: near-dup pairs have small hamming distance, signature is stable") {
    val sims = graft.sources.Tables.documents(spark, sf001)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        SimHash.simhash(org.apache.spark.sql.functions.col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val strong = exactPairs.filter(_._2 >= 0.7).keys
    assert(strong.nonEmpty)
    strong.foreach { case (a, b) =>
      val ham = java.lang.Long.bitCount(sims(a) ^ sims(b))
      assert(ham <= 12, s"near-dup pair ($a,$b) hamming $ham")
    }
    // determinism: expression value equals the shared reference compute
    val doc = graft.sources.Tables.documents(spark, sf001)
      .select("doc_id", "text").head()
    assert(sims(doc.getLong(0)) == SimHash.compute(doc.getString(1)))
  }

  test("simhash candidate query is sound and recalls most strong near-dups") {
    val rows = Dedup.ddSimhash(spark, sf001).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    // soundness: every returned pair is within the declared hamming bound
    assert(rows.forall(_.getInt(2) <= 6))
    // recall: chunk-bucketing guarantees hamming<=3 pairs; beyond that
    // it is probabilistic, so require a fraction, not totality
    val strongest = exactPairs.filter(_._2 >= 0.9).keys.toSeq
    assert(strongest.nonEmpty)
    val recalled = strongest.count(got.contains)
    assert(recalled >= strongest.size / 2,
      s"simhash recalled $recalled of ${strongest.size} jaccard>=0.9 pairs")
  }

  test("LSH-candidate applied dedup retains nearly the same corpus as the exact form") {
    val exact = Dedup.ddApply(spark, sf001).collect().map(_.getLong(0)).toSet
    val lsh = Dedup.ddApplyLsh(spark, sf001).collect().map(_.getLong(0)).toSet
    assert(exact.nonEmpty && lsh.nonEmpty)
    // est_jaccard vs exact jaccard can disagree near the 0.9 cut in
    // either direction, but only near it — the retained sets must agree
    // on ≥ 99% of documents
    val diff = (exact diff lsh) ++ (lsh diff exact)
    assert(diff.size <= math.max(1, exact.size / 100),
      s"exact=${exact.size} lsh=${lsh.size} disagree on ${diff.size}: $diff")
  }

  test("exact dedup marks exactly one canonical doc per prefix group") {
    val rows = Dedup.ddExact(spark, sf001).collect()
    val byPrefix = rows.groupBy(_.getString(2))
    byPrefix.values.foreach { g =>
      assert(g.count(_.getBoolean(5)) == 1)
      assert(g.forall(_.getLong(4) == g.length))
    }
  }

  test("incremental dedup drops exactly the batch docs whose prefix-fp is seen") {
    import org.apache.spark.sql.functions.{col, concat_ws, md5, slice}
    val docs = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(
          graft.functions.tokens(col("text")), 1, 10))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val seenFps = docs.collect { case (id, fp) if id % 3 != 0 => fp }.toSet
    val expect = docs.collect {
      case (id, fp) if id % 3 == 0 && !seenFps.contains(fp) => id }.toSet
    val got = Dedup.ddIncremental(spark, sf001)
      .collect().map(_.getLong(0)).toSet
    assert(got == expect)
    // the gate corpus must actually exercise drops, or the oracle row
    // certifies nothing
    val batch = docs.count(_._1 % 3 == 0)
    assert(got.size < batch, s"no cross-split duplicates at sf0.001")
  }

  test("bloom-prefiltered incremental dedup is result-identical to the exact arm") {
    val exact = Dedup.ddIncremental(spark, sf001).collect().toSeq
    val bloom = Dedup.ddIncrementalBloom(spark, sf001).collect().toSeq
    assert(exact == bloom)
  }

  test("bloomAntiJoin equals the plain anti-join on randomized key multisets, even at high FPP") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val seen = Seq.fill(300)(rnd.nextInt(300).toLong).distinct.toDF("k")
      // batch keeps duplicates — the multiset must survive intact
      val batch = Seq.fill(400)(rnd.nextInt(600).toLong).toDF("k")
      val expect = batch.join(
          seen.select(col("k").as("__s")).distinct(),
          col("k") === col("__s"), "left_anti")
        .collect().map(_.getLong(0)).sorted.toSeq
      val normal = Dedup.bloomAntiJoin(batch, seen, "k")
        .collect().map(_.getLong(0)).sorted.toSeq
      // a deliberately undersized filter (expectedItems = 4) drives the
      // FPP toward 1 — every row then routes through the confirm join,
      // and the answer must STILL be exact
      val tiny = Dedup.bloomAntiJoin(batch, seen, "k", expectedItems = 4L)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(normal == expect, s"seed $seed")
      assert(tiny == expect, s"seed $seed undersized filter")
    }
  }

  test("bloomAntiJoin with an empty seen frame keeps the whole batch") {
    import spark.implicits._
    val batch = Seq(1L, 2L, 3L).toDF("k")
    val empty = Seq.empty[Long].toDF("k")
    // BloomFilterAggregate evals to null on zero rows; without the
    // guard the null filter silently dropped every batch row
    val kept = Dedup.bloomAntiJoin(batch, empty, "k")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L))
  }

  test("containment flags a swallowed doc that symmetric jaccard misses") {
    import spark.implicits._
    val short = "w1 w2 w3 w4 w5 w6"
    val long = s"$short f1 f2 f3 f4 f5 f6 f7 f8 f9 f10 f11 f12 f13 f14 f15 f16"
    val docs = Seq(
      (1L, short), (2L, long),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(5), r.getDouble(6))).toMap
    // doc 1's 4 shingles are all inside doc 2 (contain_a = 1.0), but
    // jaccard = 4/20 = 0.2 would stay below every near-dup threshold
    assert(got.keySet == Set((1L, 2L)))
    assert(got((1L, 2L))._1 == 1.0)
    assert(got((1L, 2L))._2 == 4.0 / 20.0)
  }

  test("stop-shingles beyond the df cap neither pair docs nor enter the ratios") {
    import spark.implicits._
    // 6 docs share one hot shingle (df 6 > cap 4); docs 1/2 also share
    // a genuine overlap that must survive the cap
    val hot = "h1 h2 h3"
    val docs = (1L to 6L).map { i =>
      val unique = s"u${i}a u${i}b u${i}c u${i}d"
      val extra = if (i <= 2) " s1 s2 s3 s4 s5" else ""
      (i, s"$hot $unique$extra")
    }.toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, maxDf = 4, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // only (1,2) survives: their shared shingles minus the hot one
    assert(got.keySet == Set((1L, 2L)))
    val onlyHotPairs = Dedup.containmentPairs(
      (1L to 6L).map(i => (i, s"$hot u${i}a u${i}b")).toDF("doc_id", "text"),
      maxDf = 4, threshold = 0.0)
    assert(onlyHotPairs.count() == 0)
  }

  test("minhash estimator certification: floors hold and the mean derives from the quantized sum") {
    Seq(sf0001, sf001).foreach { sf =>
      val r = Dedup.ddMinhashEst(spark, sf).collect().head
      assert(r.getLong(0) > 0, s"$sf: candidate pairs exist")
      assert(r.getBoolean(4) && r.getBoolean(5),
        s"$sf: accuracy floors hold (mean ${r.getDouble(3)}, max ${r.getDouble(2)})")
      assert(r.getDouble(3) ===
        r.getLong(1).toDouble / (1e12 * r.getLong(0).toDouble))
    }
  }

  test("banding certification: pair-level precision/recall floors hold at both SFs") {
    Seq(sf0001, sf001).foreach { sf =>
      val r = Dedup.ddLshPr(spark, sf).collect().head
      val (nTrue, nRep, nHit) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nTrue > 0 && nRep > 0, s"$sf: both arms non-empty")
      assert(nHit <= math.min(nTrue, nRep), s"$sf: hit-count identity")
      assert(r.getBoolean(3) && r.getBoolean(4),
        s"$sf: P/R floors hold (true=$nTrue reported=$nRep hit=$nHit)")
      // the reported set is exactly what dd_minhash_lsh emits
      assert(nRep == Dedup.ddMinhashLsh(spark, sf).count())
    }
  }

  test("incremental near-dup probe equals the cross-split slice of the full LSH pass") {
    val out = Dedup.ddIncrementalLsh(spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    // every batch doc gets a verdict
    val batchIds = graft.sources.Tables.documents(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 0)
      .collect().map(_.getLong(0)).toSet
    assert(out.keySet === batchIds)
    // same banding, same signatures: the incremental probe must agree
    // with the full-corpus LSH pass restricted to cross-split pairs
    val full = Dedup.ddMinhashLsh(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val crossBest = full.flatMap { case (a, b, est) =>
      (a % 3 == 0, b % 3 == 0) match {
        case (true, false) => Seq(a -> ((est, b)))
        case (false, true) => Seq(b -> ((est, a)))
        case _ => Nil // new×new and seen×seen are out of scope
      }
    }.groupBy(_._1).map { case (id, hits) =>
      id -> hits.map(_._2).minBy { case (est, seen) => (-est, seen) }
    }
    crossBest.foreach { case (id, (est, seen)) =>
      assert(out(id) === ((true, Some(seen), Some(est))),
        s"batch doc $id best seen match")
    }
    out.foreach { case (id, (flag, m, _)) =>
      if (!crossBest.contains(id))
        assert(!flag && m.isEmpty, s"batch doc $id must be clean")
      m.foreach(s => assert(s % 3 != 0, s"match of $id must be a seen doc"))
    }
    assert(crossBest.nonEmpty, "the gate corpus has cross-split near-dups")
  }
}
