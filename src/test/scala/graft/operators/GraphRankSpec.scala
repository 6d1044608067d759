package graft.operators

import graft.SparkTestBase

/** Semantics pins for the fixed-point PageRank: the distributed
  * iteration must agree EXACTLY (not approximately) with a sequential
  * reference implementation of the same integer arithmetic — that
  * exactness is the whole design (it is what lets the DuckDB oracle
  * hash-match ten iterations of a graph computation).
  */
class GraphRankSpec extends SparkTestBase {
  import spark.implicits._
  import GraphRank.{DampingNum, Iterations, PScale, RScale}

  /** Sequential fixed-point PageRank over an undirected edge list —
    * the same formulas as [[GraphRank.pageRank]], one vertex at a
    * time.
    */
  private def refRank(pairs: Seq[(String, String)],
      iters: Int = Iterations): Map[String, Long] = {
    val und = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val w = und.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val tw = w.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val p = w.map { case ((s, t), cw) => (s, t) -> (cw * PScale) / tw(s) }
    val verts = tw.keySet
    val n = verts.size.toLong
    val r0 = RScale / n
    val base = ((100 - DampingNum) * r0) / 100
    var r = verts.map(_ -> r0).toMap
    for (_ <- 1 to iters) {
      r = verts.map { v =>
        val sc = p.collect {
          case ((s, t), pp) if t == v => (r(s) * pp) / PScale
        }.sum
        v -> (base + (DampingNum * sc) / 100)
      }.toMap
    }
    r
  }

  /** Build the `(src, dst, w, tw, p)` edge frame the way
    * [[GraphRank.cooccurrenceGraph]] does, from raw pairs.
    */
  private def edgeFrame(pairs: Seq[(String, String)]) = {
    val und = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val w = und.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val tw = w.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    w.toSeq.map { case ((s, t), cw) =>
      (s, t, cw, tw(s), (cw * PScale) / tw(s))
    }.toDF("src", "dst", "w", "tw", "p")
  }

  test("pageRank matches the sequential fixed-point reference bit-for-bit") {
    // triangle a-b-c with a pendant d on c, plus a doubled (weighted)
    // a-b edge — c should outrank the rest (most connections), and
    // every fixed-point unit must agree with the reference
    val pairs = Seq(("a", "b"), ("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
    val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct.toDF("tok")
    val got = GraphRank.pageRank(edgeFrame(pairs), verts).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val want = refRank(pairs)
    assert(got === want)
    assert(got("c") > got("a") && got("c") > got("d"),
      "the best-connected vertex must rank highest")
    assert(got("d") < got("b"), "the pendant vertex must rank lowest")
  }

  test("rank mass is conserved up to integer-division dust") {
    val pairs = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
      ("d", "e"), ("e", "a"))
    val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct.toDF("tok")
    val total = GraphRank.pageRank(edgeFrame(pairs), verts).collect()
      .map(_.getLong(2)).sum
    // each DIV sheds < 1 unit per vertex/edge per iteration — with
    // RScale = 1e12 the dust is parts-per-billion, never growth
    assert(total <= RScale)
    assert(total > RScale * 999L / 1000L, s"mass collapsed to $total")
  }

  test("textrank on the corpus: stopword-free top-k, exact fixed-point doubles") {
    val rows = GraphRank.taTextrank(spark, sf0001).collect()
    val nVerts = GraphRank.cooccurrenceGraph(spark, sf0001)._2.count()
    assert(rows.length === math.min(GraphRank.TopK.toLong, nVerts))
    val ranks = rows.map(_.getLong(2))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b },
      "presented in descending rank order")
    assert(rows.forall(r => r.getLong(2) > 0L && r.getLong(1) > 0L))
    val toks = rows.map(_.getString(0))
    assert(toks.distinct.length === toks.length)
    assert(toks.forall(t => !TextAnalysis.stopwordList.contains(t)),
      "stopwords are excluded from the graph")
    // the double rank is EXACTLY rank_fp / 1e12 (both factors exact)
    rows.foreach { r =>
      assert(r.getDouble(3) === r.getLong(2).toDouble / RScale.toDouble)
    }
  }

  test("summarize: per-doc sentence rank matches the reference; fallback covers pairless docs") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      // doc 1: s0 and s1 share nothing with each other, but each
      // shares one token with s2 — s2 is the hub and must win
      (1L, "alpha one. beta two. alpha beta three"),
      // doc 2: two sentences, no shared non-stop token → fallback to s0
      (2L, "red green. blue yellow"),
      // doc 3: single content sentence → fallback
      (3L, "solo sentence here"),
      // doc 4: stopword-only sentence is not content; the two real
      // sentences share {delta} → ranked, tie broken by sent_id
      (4L, "the a an. delta one. delta two"))
      .toDF("doc_id", "text")
    val out = GraphRank.summarize(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    assert(out(1L)._4 && out(1L)._1 === 2L &&
      out(1L)._2 === "alpha beta three",
      s"doc 1's hub sentence must win: ${out(1L)}")
    assert(out(2L) === ((0L, "red green", 0L, false)))
    assert(out(3L) === ((0L, "solo sentence here", 0L, false)))
    // doc 4: s1/s2 are symmetric (one shared token each way) — equal
    // ranks, sent_id 1 wins the tie; rank is the converged fixed point
    assert(out(4L)._4 && out(4L)._1 === 1L && out(4L)._2 === "delta one")

    // symmetric two-vertex graph: p = PScale each way, so the rank
    // fixed point is r = base + 85*r/100 from r0 = RScale/2 — replay
    // the ten rounds sequentially and demand bit equality
    var r = GraphRank.RScale / 2
    val base = ((100 - GraphRank.DampingNum) * r) / 100
    for (_ <- 1 to GraphRank.Iterations)
      r = base + (GraphRank.DampingNum * r) / 100
    assert(out(4L)._3 === r, "doc 4 rank must equal the sequential replay")
  }

  test("summarize: the sentence cap bounds a pathological document's quadratic") {
    val cap = GraphRank.MaxSummarySentences
    // one recurring content token in EVERY sentence: uncapped, this doc
    // alone would form C(10000, 2) ≈ 5·10⁷ pairs inside ONE (doc, tok)
    // task — the single-key blowup AQE cannot split
    val monster = (0 until 10000)
      .map(i => s"alpha filler$i").mkString(". ")
    // a healthy multi-sentence doc rides along to prove normal ranking
    // is untouched by the guard
    val docs = Seq(
      (1L, monster),
      (2L, "alpha one. beta two. alpha beta three"))
      .toDF("doc_id", "text")
    val out = GraphRank.summarize(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(4)))).toMap
    assert(out.keySet === Set(1L, 2L))
    // the monster is summarized from its first `cap` sentences only
    assert(out(1L)._2 && out(1L)._1 < cap,
      s"best sentence must come from the capped prefix: ${out(1L)}")
    assert(out(2L) === ((2L, true)), "healthy docs rank as before")
    // structural proof of the bound: the capped posting relation can
    // never exceed C(cap, 2) pairs per (doc, tok) group
    assert(cap * (cap - 1) / 2 < 3000L)
    // a doc whose content all sits PAST the cap of NON-EMPTY
    // sentences contributes nothing ("the a an" fragments are
    // non-empty, so they consume budget — mirrored exactly in the
    // oracle SQL's row_number filter)
    val lateDoc = ((0 until cap.toInt).map(_ => "the a an") ++
      Seq("omega real content", "omega again")).mkString(". ")
    val late = GraphRank.summarize(
      Seq((9L, lateDoc)).toDF("doc_id", "text")).collect()
    assert(late.isEmpty,
      "content past the sentence cap must not resurrect a document")
    // EMPTY fragments must NOT consume budget: a doc opening with 70
    // ellipsis dots still summarizes from its real sentences (the cap
    // counts non-empty sentences, not raw split positions)
    val dotty = ("." * 70) + "omega real content. omega again"
    val dottyOut = GraphRank.summarize(
      Seq((8L, dotty)).toDF("doc_id", "text")).collect()
    assert(dottyOut.length == 1 && dottyOut(0).getBoolean(4),
      s"ellipsis runs must not exhaust the sentence budget: " +
        s"${dottyOut.toSeq}")
  }

  test("keyphrase scores are exactly the sum of member ranks; one-offs are gated") {
    // at sf0.001 the vocabulary (29) fits inside taTextrank's top-50,
    // so that view IS the full rank table
    val rank = GraphRank.taTextrank(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val rows = GraphRank.taKeyphrase(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= GraphRank.PhraseTopK)
    val scores = rows.map(_.getLong(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val Array(w1, w2) = r.getString(0).split(" ", 2)
      assert(r.getLong(1) >= GraphRank.MinPhraseCount)
      assert(r.getLong(2) === rank(w1) + rank(w2),
        s"phrase '${r.getString(0)}' must score r($w1) + r($w2)")
      assert(!TextAnalysis.stopwordList.contains(w1) &&
        !TextAnalysis.stopwordList.contains(w2))
    }
  }
}
