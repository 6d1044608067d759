package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantic properties of the corpus-assembly operators — the guarantees
  * a training pipeline actually relies on, beyond the DuckDB hash parity
  * the driver gate checks.
  */
class CorpusOpsSpec extends SparkTestBase {

  test("cp_split: total partition, ~80/10/10, and per-doc stability under corpus changes") {
    val out = CorpusOps.cpSplit(spark, sf001).collect()
    val n = out.length
    val bySplit = out.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(bySplit.values.sum === n, "every document lands in exactly one split")
    assert(bySplit("train") > n * 0.7 && bySplit("train") < n * 0.9)
    assert(bySplit("val") > n * 0.05 && bySplit("val") < n * 0.15)
    assert(bySplit("test") > n * 0.05 && bySplit("test") < n * 0.15)

    // hash-split invariant: a document's split is a pure function of its
    // id — recomputing on HALF the corpus moves nothing (rand() fails this)
    val half = CorpusOps.cpSplit(spark, sf001)
      .filter(col("doc_id") % 2 === 0).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val full = out.map(r => r.getLong(0) -> r.getString(2)).toMap
    half.foreach { case (id, s) => assert(full(id) === s) }
  }

  test("hashSplit on a group column yields leakage-aware group splits") {
    val bySource = CorpusOps.hashSplit(
      graft.sources.Tables.documents(spark, sf001), id = "source")
      .select(col("source"), col("split")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSet)
    bySource.foreach { case (src, splits) =>
      assert(splits.size === 1, s"source $src straddles splits: $splits")
    }
  }

  test("cp_stratified: every stratum keeps exactly ceil(rate * size) documents") {
    val sizes = graft.sources.Tables.documents(spark, sf001)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = CorpusOps.cpStratified(spark, sf001).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(kept.keySet === sizes.keySet, "no stratum vanishes")
    sizes.foreach { case (src, sz) =>
      assert(kept(src) === math.ceil(sz * CorpusOps.StratRate).toLong,
        s"stratum $src: kept ${kept(src)} of $sz")
    }
  }

  test("cp_shuffle: positions are a permutation and match the naive global window") {
    val out = CorpusOps.cpShuffle(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val n = out.length
    assert(out.map(_._2).sorted.toSeq === (1L to n).toSeq,
      "pos is exactly 1..N — a permutation, no gaps or dups")
    // two-phase bucket enumeration == single global sort by the same key
    val naive = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"),
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy(
          md5(concat(lit("shuf:"), col("doc_id").cast("string"))),
          col("doc_id"))).cast("long").as("pos"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, pos) => assert(naive(id) === pos) }
  }

  test("cp_shuffle: no single-partition sort of the corpus (scale posture)") {
    // the full-data window must be partitioned by the hash bucket; only
    // the 256-row offset table may use a single-partition window
    val plan = CorpusOps.cpShuffle(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__b"),
      s"doc-level row_number must exchange on the bucket key:\n$plan")
    val docWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("row_number")).toSeq
    assert(docWindows.nonEmpty && docWindows.forall(_.contains(", [__b")),
      s"row_number windows must all be bucket-partitioned:\n$docWindows")
  }

  test("cp_token_budget: greedy cut equals the naive global running sum; budget respected") {
    val out = CorpusOps.cpTokenBudget(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // hand-compute the greedy cut on the collected corpus
    val docs = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val toks = docs.map { case (id, t) =>
      (id, t.split("\\s+").count(_.nonEmpty).toLong, md5hex(s"budget:$id"))
    }
    val budget = math.floor(0.4 * toks.map(_._2).sum).toLong
    var cum = 0L
    val expect = toks.sortBy(x => (x._3, x._1)).flatMap { case (id, n, _) =>
      val before = cum; cum += n
      if (before < budget) Some(id -> (n, cum)) else None
    }.toMap
    assert(out.map(_._1).toSet == expect.keySet)
    out.foreach { case (id, n, c) => assert(expect(id) == ((n, c)), s"doc $id") }
    // budget respected: every kept doc STARTS under the budget
    out.foreach { case (_, n, c) => assert(c - n < budget) }
  }

  test("cp_token_budget: no single-partition running sum of the corpus (scale posture)") {
    val plan = CorpusOps.cpTokenBudget(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__b"),
      s"doc-level running sum must exchange on the bucket key:\n$plan")
  }

  test("cp_mixture: rate-1.0 domains keep everything; kept counts within binomial bounds") {
    val rows = CorpusOps.cpMixture(spark, sf001).collect()
    rows.foreach { r =>
      val (nDocs, nKept, rate) = (r.getLong(1), r.getLong(2), r.getDouble(4))
      assert(nKept <= nDocs)
      if (rate == 1.0) assert(nKept === nDocs, s"rate-1.0 source dropped docs: $r")
      else {
        // md5 buckets are uniform: expect rate*n within 4 sigma
        val sigma = math.sqrt(nDocs * rate * (1 - rate))
        assert(math.abs(nKept - nDocs * rate) <= 4 * sigma + 1,
          s"${r.getString(0)}: kept $nKept of $nDocs at rate $rate")
      }
    }
  }

  test("emb_quantize: int8 range, absmax maps to ±127, dequantization error ≤ 0.5/scale") {
    val rows = Similarity.embQuantize(spark, sf001).collect()
    val vecs = graft.sources.Tables.embeddings(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.foreach { r =>
      val (id, scale, q8) = (r.getLong(0), r.getDouble(2), r.getString(3))
      val q = q8.split(",").map(_.toInt)
      assert(q.forall(v => v >= -127 && v <= 127), s"vec $id out of int8 range")
      assert(q.map(math.abs).max === 127, s"vec $id: absmax element must hit ±127")
      val orig = vecs(id)
      assert(q.length === orig.length)
      q.zip(orig).foreach { case (qi, xi) =>
        assert(math.abs(qi / scale - xi) <= 0.5 / scale + 1e-12,
          s"vec $id: dequant error exceeds half a quantization step")
      }
    }
  }

  test("bookkeeping cores survive degenerate corpora: empty and single-row") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "source")
    assert(CorpusOps.hashSplit(empty).count() === 0)
    assert(CorpusOps.globalShuffle(empty).count() === 0)
    assert(CorpusOps.stratifiedSample(empty).count() === 0)

    val one = Seq((7L, "src1")).toDF("doc_id", "source")
    val splitOne = CorpusOps.hashSplit(one).collect()
    assert(splitOne.length === 1)
    val shuffled = CorpusOps.globalShuffle(one).collect()
    assert(shuffled.length === 1 &&
      shuffled.head.getAs[Long]("pos") === 1L)
    // ceil(1 * 0.2) = 1: a one-row stratum is kept, never dropped
    assert(CorpusOps.stratifiedSample(one).count() === 1)

    // token budget: empty corpus → empty; a one-doc corpus under a
    // positive budget keeps its doc (greedy: it STARTS at zero)
    val emptyT = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(CorpusOps.tokenBudget(emptyT, lit(10L)).count() === 0)
    val oneT = Seq((7L, "alpha beta")).toDF("doc_id", "text")
    val cut = CorpusOps.tokenBudget(oneT, lit(1L)).collect()
    assert(cut.length === 1 &&
      cut.head.getAs[Long]("n_tokens") === 2L &&
      cut.head.getAs[Long]("cum_tokens") === 2L)
    // zero budget keeps nothing
    assert(CorpusOps.tokenBudget(oneT, lit(0L)).count() === 0)
  }

  test("cp_importance: target-vocabulary docs outrank foreign-vocabulary docs; mixed sits between") {
    import spark.implicits._
    // target docs speak vocabulary A, foreign docs vocabulary B, one
    // doc mixes both — the importance ratio must order them A > mix > B
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", true),
      (2L, "beta gamma alpha gamma", true),
      (3L, "zeta eta theta zeta eta", false),
      (4L, "theta eta zeta theta", false),
      (5L, "alpha beta zeta eta", false)) // mixed, outside the target
      .toDF("doc_id", "text", "is_t")
    val scores = CorpusOps.importanceScored(docs, col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scores.size == 5)
    val aDocs = Seq(1L, 2L).map(scores)
    val bDocs = Seq(3L, 4L).map(scores)
    val mixed = scores(5L)
    assert(aDocs.min > mixed, s"target docs must outrank mixed: $scores")
    assert(mixed > bDocs.max, s"mixed must outrank foreign docs: $scores")
    // exact-integer path: imp_sum is a sum of floor-quantized ratios
    val rows = CorpusOps.importanceScored(docs, col("is_t")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) -
        r.getLong(2).toDouble / (r.getLong(1) * 1000000.0)) == 0.0)
    }
  }

  test("upsert sequences are order-insensitive per batch split: fold of upserts == one latest-by-key") {
    import spark.implicits._
    import graft.sources.Storage
    val rng = new scala.util.Random(4242)
    // a changelog of 60 updates over 12 keys with unique (ver) per key
    val updates = rng.shuffle((1 to 60).map(i =>
      (i % 12L, i.toLong, s"v$i")).toList)
    val expected = updates.groupBy(_._1)
      .map { case (k, us) => k -> us.maxBy(u => (u._2, u._3)) }
    // apply in 2, 3, and 5 batch splits — all must converge to the
    // same snapshot as one global latest-by-key
    Seq(2, 3, 5).foreach { nBatches =>
      val st = new Storage(spark,
        java.nio.file.Files.createTempDirectory("graft-ups-").toString)
      st.put("snap",
        updates.take(1).toDF("k", "ver", "payload")) // seed snapshot
      updates.grouped(math.ceil(updates.size / nBatches.toDouble).toInt)
        .foreach { b =>
          st.upsert("snap", b.toDF("k", "ver", "payload"), "k", Seq("ver"))
        }
      val got = st.get("snap").collect()
        .map(r => r.getLong(0) -> ((r.getLong(0), r.getLong(1), r.getString(2))))
        .toMap
      assert(got == expected, s"$nBatches-batch fold diverged")
    }
  }

  test("ta_repetition: fractions well-formed and planted repetitive text scores high") {
    val rows = TextAnalysis.taRepetition(spark, sf001).collect()
    rows.foreach { r =>
      val (nw, nd) = (r.getLong(1), r.getLong(2))
      assert(nd >= 1 && nd <= nw)
      val dup = r.getDouble(3)
      assert(dup >= 0.0 && dup < 1.0)
      if (r.getLong(4) > 0) {
        val top = r.getDouble(5)
        assert(top > 0.0 && top <= 1.0)
        assert(top >= 1.0 / r.getLong(4) - 1e-12)
      }
    }
    // a synthetic loop-generated document must dominate the corpus scores
    import spark.implicits._
    val loop = Seq((999999L, ("spam ham " * 50).trim)).toDF("doc_id", "text")
    val docs = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text")).union(loop)
    val toks = graft.functions.tokens(col("text"))
    val scored = docs
      .select(col("doc_id"), explode(graft.functions.wordShingles(toks, 2)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg((max(col("c")).cast("double") / sum(col("c"))).as("top_frac"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(999999L) > 0.49, "100x-repeated bigram scores ~0.5")
    val organicMedian = scored.removed(999999L).values.toSeq.sorted
      .apply(scored.size / 2)
    assert(scored(999999L) > 2 * organicMedian,
      "the generation loop clearly separates from typical organic docs")
  }

  test("temperature sampling keeps the rarest domain whole and sqrt-flattens the rest") {
    import spark.implicits._
    val docs = ((1 to 100).map(i => (i.toLong, "en", 10L)) ++
      (101 to 125).map(i => (i.toLong, "fr", 10L)))
      .toDF("doc_id", "lang", "n_chars")
    val rates = CorpusOps.temperatureRates(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rates == Map("en" -> 0.5, "fr" -> 1.0))
    val kept = graft.api.Corpus.temperatureSampled(docs)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate 1.0 keeps every row; rate 0.5 keeps a md5-thresholded subset
    assert(kept("fr") == 25L)
    assert(kept("en") > 25L && kept("en") < 75L)
    // facade keep-set matches the gated query's per-domain counts
    val gated = CorpusOps.cpTemperature(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val api = graft.api.Corpus.temperatureSampled(
      graft.sources.Tables.documents(spark, sf0001))
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    gated.foreach { case (lang, (_, nKept)) =>
      assert(api.getOrElse(lang, 0L) == nKept, s"facade/gated drift for $lang")
    }
  }

  test("cp_domain_cap: every source keeps exactly its cap-best quality documents") {
    val out = CorpusOps.cpDomainCap(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val bySource = out.groupBy(_._2)
    // 25 docs per source at this SF, cap 15: every source is capped
    bySource.foreach { case (src, rows) =>
      assert(rows.length === CorpusOps.DomainCap, s"source $src kept ${rows.length}")
    }
    // independent oracle: rank by (quality desc, doc_id desc) in Scala
    val all = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map { r =>
        val toks = r.getString(2).split("\\s+").filter(_.nonEmpty)
        val q = if (toks.isEmpty) -1.0
          else {
            val stop = toks.count(TextAnalysis.stopwordList.contains)
            stop.toDouble / toks.length * 0.5 +
              math.min(toks.length / 200.0, 1.0) * 0.5
          }
        (r.getLong(0), r.getString(1), q)
      }
    all.groupBy(_._2).foreach { case (src, rows) =>
      val expect = rows.sortBy { case (id, _, q) => (-q, -id) }
        .take(CorpusOps.DomainCap).map(_._1).toSet
      assert(bySource(src).map(_._1).toSet === expect,
        s"source $src: kept set is not the quality top-${CorpusOps.DomainCap}")
    }
  }

  test("domainCapped: under-cap sources keep everything") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "the a of and to in is the a of"),
      (2L, "s1", "zz zz zz"),
      (3L, "s2", "one two three")).toDF("doc_id", "source", "text")
    val kept = CorpusOps.domainCapped(docs).collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 3L), "no source at or under the cap loses a doc")
  }

  test("waterfillAlloc: hand-computed saturation, exact budget, max-min fairness") {
    import spark.implicits._
    val caps = Seq(("a", 10L), ("b", 20L), ("c", 100L)).toDF("domain", "c")
    // B = 65: a and b saturate (10 + 20·2 = 50 ≤ 65), c gets the rest
    val out = CorpusOps.waterfillAlloc(caps, Some(65L)).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(out === Map("a" -> ((10L, true)), "b" -> ((20L, true)),
      "c" -> ((35L, false))))

    // remainder distribution: B = 7 over three 10-capacity domains →
    // 3/2/2, the extra token to the capacity-order-first domain
    val even = Seq(("x", 10L), ("y", 10L), ("z", 10L)).toDF("domain", "c")
    val alloc7 = CorpusOps.waterfillAlloc(even, Some(7L)).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(alloc7.values.sum === 7L)
    assert(alloc7("x") === 3L && alloc7("y") === 2L && alloc7("z") === 2L)

    // corpus invariants at the default half-capacity budget
    val rows = CorpusOps.cpWaterfill(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val budget = rows.head._3
    assert(rows.map(_._4).sum === budget, "allocations sum to the budget exactly")
    rows.foreach { case (d, c, _, a, sat) =>
      assert(a <= c, s"$d allocated past capacity")
      if (sat) assert(a === c, s"$d saturated must mean filled to capacity")
    }
    // max-min fairness: every unsaturated domain's allocation is within
    // one token of every other's
    val unsat = rows.filter(!_._5).map(_._4)
    if (unsat.length > 1) assert(unsat.max - unsat.min <= 1)
  }

  test("waterfillAlloc: randomized invariants — exact budget, caps, max-min order") {
    import spark.implicits._
    val rng = new scala.util.Random(271828)
    (1 to 12).foreach { trial =>
      val n = 2 + rng.nextInt(7)
      val caps = (0 until n).map(i => (s"d$i", 1L + rng.nextInt(1000)))
      val total = caps.map(_._2).sum
      // budgets across the whole regime, incl. > total capacity
      val budget = 1L + rng.nextInt((total * 3 / 2).toInt)
      val out = CorpusOps.waterfillAlloc(
        caps.toDF("domain", "c"), Some(budget)).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(3),
          r.getBoolean(4)))
      assert(out.map(_._3).sum === math.min(budget, total),
        s"trial $trial: allocations must sum to min(budget, capacity)")
      out.foreach { case (d, c, a, sat) =>
        assert(a <= c, s"trial $trial: $d over capacity")
        if (sat) assert(a === c, s"trial $trial: $d")
      }
      val sat = out.filter(_._4)
      val unsat = out.filter(!_._4)
      if (unsat.length > 1)
        assert(unsat.map(_._3).max - unsat.map(_._3).min <= 1,
          s"trial $trial: unsaturated allocations must be within one token")
      if (sat.nonEmpty && unsat.nonEmpty)
        assert(sat.map(_._2).max <= unsat.map(_._3).min,
          s"trial $trial: max-min order — no saturated cap above an unsaturated share")
    }
  }

  test("cp_dup_sample: integer keep decision, deterministic, sizes independently verified") {
    val out = CorpusOps.cpDupSample(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length === 500)
    // the decision IS draw*m < 10^6 — recompute it row by row
    out.foreach { case (id, m, draw, kept) =>
      assert(kept === (draw * m < CorpusOps.DupSampleRes), s"doc $id")
      assert(draw >= 0 && draw < CorpusOps.DupSampleRes)
      if (m == 1L) assert(kept, s"singleton doc $id must always survive")
    }
    // cluster sizes match an independent prefix-fingerprint count
    val sizes = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(graft.functions.tokens(col("text")), 1, 10)))
          .as("fp"))
      .groupBy(col("fp")).agg(count(lit(1)).as("n"),
        collect_list(col("doc_id")).as("ids"))
      .collect()
      .flatMap(r => r.getSeq[Long](2).map(_ -> r.getLong(1))).toMap
    out.foreach { case (id, m, _, _) => assert(sizes(id) === m, s"doc $id") }
    assert(out.exists(_._2 > 1), "the corpus has non-trivial clusters to sample")
    // pure function of (doc_id, m): a second run is identical
    val again = CorpusOps.cpDupSample(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(again.toSeq === out.toSeq)
  }

  test("cp_datacard: hand-computed card on a synthetic corpus") {
    import spark.implicits._
    // source A: an exact duplicate pair, a German doc, a longer English
    // doc; source B: one doc (all ratios degenerate to exact values)
    val docs = Seq(
      ("the cat", "en", "A", 7L),
      ("the cat", "en", "A", 7L),
      ("ein hund ist da", "de", "A", 15L),
      ("a b c d e", "en", "A", 9L),
      ("solo doc here", "en", "B", 13L))
      .toDF("text", "lang", "source", "n_chars")
    val card = CorpusOps.dataCard(docs).orderBy("source").collect()
    assert(card.length === 2)
    val a = card(0)
    assert(a.getString(0) === "A")
    assert(a.getLong(1) === 4L, "n_docs")
    assert(a.getLong(2) === 2L + 2L + 4L + 5L, "n_tokens")
    assert(a.getLong(3) === 2L, "n_langs: en + de")
    assert(a.getString(4) === "en", "dominant language")
    assert(a.getDouble(5) === 3.0 / 4.0, "top_lang_share")
    assert(a.getDouble(6) === 1.0 / 4.0,
      "dup_rate: 4 docs, 3 distinct fingerprints")
    // exact interpolated median of [7, 7, 9, 15] = 7 + (9-7)*0.5
    assert(a.getDouble(8) === 8.0, "p50_chars")
    // mean quality == mean of the per-doc floor-quantized ta_quality
    // scores — the card must report the SAME formula ta_quality gates
    val q6 = docs.filter(col("source") === "A")
      .select(floor(TextAnalysis.qualityScore(
        graft.functions.tokens(col("text"))) * lit(1000000.0))
        .cast("long")).collect().map(_.getLong(0))
    assert(a.getDouble(7) === q6.sum.toDouble / (4.0 * 1000000.0),
      "avg_quality")

    val b = card(1)
    assert(b.getString(0) === "B" && b.getLong(1) === 1L &&
      b.getLong(2) === 3L && b.getString(4) === "en")
    assert(b.getDouble(5) === 1.0 && b.getDouble(6) === 0.0)
    assert(b.getDouble(8) === 13.0, "single-doc median is the value itself")
  }

  test("cp_curriculum: monotone deciles, ~10% bands, deterministic key, no global sort") {
    val out = CorpusOps.cpCurriculum(spark, sf001).collect()
    val n = out.length
    assert(n > 0)
    // quality order implies decile order (ties at a fence share a band)
    val byQ = out.map(r => (r.getDouble(1), r.getInt(2))).sortBy(_._1)
    byQ.sliding(2).foreach { case Array((q1, d1), (q2, d2)) =>
      assert(d1 <= d2, s"decile must be monotone in quality: ($q1,$d1) vs ($q2,$d2)") }
    // interpolated fences put roughly a tenth of the corpus in each band
    val sizes = out.groupBy(_.getInt(2)).view.mapValues(_.length).toMap
    assert(sizes.keySet.subsetOf((0 to 9).toSet))
    sizes.values.foreach(c => assert(c < n * 0.35,
      "no band may swallow the corpus — fences must spread"))
    // the key is a pure function of doc_id: recomputing on half the
    // corpus changes nobody's key (fences may shift deciles; keys never)
    val halfKeys = Corpus01HalfKeys()
    val fullKeys = out.map(r => r.getLong(0) -> r.getString(3)).toMap
    halfKeys.foreach { case (id, k) => assert(fullKeys(id) === k) }
    // presentation order IS the curriculum: decile asc, then shuffled key
    val order = out.map(r => (r.getInt(2), r.getString(3)))
    assert(order.sameElements(order.sorted))
  }

  private def Corpus01HalfKeys(): Map[Long, String] = {
    import graft.api.Corpus
    val docs = graft.sources.Tables.documents(spark, sf001)
      .filter(col("doc_id") % 2 === 0)
    Corpus.curriculumOrdered(docs).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
  }
}
