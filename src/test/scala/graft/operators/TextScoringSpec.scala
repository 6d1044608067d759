package graft.operators

import graft.SparkTestBase

/** Hand-computed semantics of the corpus-model text scorers. */
class TextScoringSpec extends SparkTestBase {
  import spark.implicits._

  test("bigramScored: pooled conditional probability matches hand counts") {
    // corpus: doc1 "x y x y", doc2 "y x", doc3 "x z"
    //   C2: (x,y)=2 (y,x)=2 (x,z)=1;  C1 openers: x=3, y=2
    val docs = Seq(
      (1L, "x y x y"),
      (2L, "y x"),
      (3L, "x z")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramScored(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) === ((3L, 6L, 8L, 0.75)))
    assert(out(2L) === ((1L, 2L, 2L, 1.0)))
    assert(out(3L) === ((1L, 1L, 3L, 1.0 / 3.0)))
  }

  test("bigramScored: docs with fewer than two tokens drop out; singletons score 1") {
    val docs = Seq(
      (1L, "only"),
      (2L, ""),
      (3L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramScored(docs).collect()
    assert(out.map(_.getLong(0)).toSet === Set(3L),
      "no bigram positions -> no row")
    // (a,b) occurs once, 'a' opens once: 1/1
    assert(out.head.getDouble(4) === 1.0)
  }

  test("ta_bigram_score over the corpus: coherence in (0,1], full coverage") {
    val rows = TextAnalysis.taBigramScore(spark, sf0001).collect()
    assert(rows.length === 500, "every (multi-token) doc scored")
    rows.foreach { r =>
      val c = r.getDouble(4)
      assert(c > 0.0 && c <= 1.0, s"doc ${r.getLong(0)}: coherence $c")
      assert(r.getLong(2) <= r.getLong(3),
        "pair counts can never exceed their opener counts")
    }
  }

  // ── ta_bpe_train ────────────────────────────────────────────────────

  /** Sequential greedy left-to-right merge of one learned pair. */
  private def applyMerge(syms: Vector[String], l: String,
      r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Textbook single-threaded BPE trainer over word counts. */
  private def referenceBpe(words: Map[String, Long],
      n: Int): Seq[(Int, String, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, c) => w.map(_.toString).toVector -> c }
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((a, b), cc) => (-cc, a, b) }
        out += ((rank, l, r, l + r, c))
        vocab = vocab.toSeq
          .map { case (syms, cnt) => applyMerge(syms, l, r) -> cnt }
          .groupMapReduce(_._1)(_._2)(_ + _)
        rank += 1
      }
    }
    out.result()
  }

  private def bpeRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4))).toSeq

  test("bpeMerges learns the textbook merges on a hand corpus") {
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower"),
      (3L, "newest newest newest newest newest newest"),
      (4L, "widest widest widest")).toDF("doc_id", "text")
    val exp = referenceBpe(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 5)
    assert(bpeRows(TextAnalysis.bpeMerges(docs, 5)) == exp)
  }

  test("bpeMerges merges overlapping runs greedily: aaaa -> [aa, aa], never [aa, a, a]") {
    val docs = Seq((1L, "aaaa aaaa aaaa aaaa")).toDF("doc_id", "text")
    val got = bpeRows(TextAnalysis.bpeMerges(docs, 2))
    // merge 1: (a,a) over 3 pair positions x count 4; after the greedy
    // merge the word is [aa, aa], so merge 2 is (aa,aa) — a
    // single-space replace would leave [aa, a, a] and learn (a,a)
    // again at rank 2
    assert(got == Seq((1, "a", "a", "aa", 12L), (2, "aa", "aa", "aaaa", 4L)))
  }

  test("bpeApplied counts BPE tokens under the learned merges (hand corpus)") {
    val docs = Seq(
      (1L, "low lower low!"),   // "low!" is not alphanumeric -> excluded
      (2L, "newest newest"),
      (3L, "")).toDF("doc_id", "text")
    val words = Map("low" -> 1L, "lower" -> 1L, "newest" -> 2L)
    val merges = referenceBpe(words, 5).map(m => (m._2, m._3))
    def bpeLen(w: String): Long =
      merges.foldLeft(w.map(_.toString).toVector) {
        case (syms, (l, r)) => applyMerge(syms, l, r)
      }.length.toLong
    val got = TextAnalysis.bpeApplied(docs, 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == ((2L, 8L, bpeLen("low") + bpeLen("lower"))))
    assert(got(2L) == ((2L, 12L, 2 * bpeLen("newest"))))
    assert(got(3L) == ((0L, 0L, 0L)))
    // merged tokens genuinely compress: fewer BPE tokens than chars
    assert(got(1L)._3 < 8L && got(2L)._3 < 12L)
  }

  test("batched exact trainer equals sequential greedy on randomized tie-heavy corpora") {
    // tiny alphabet + random counts force exactly the cases the
    // strict-descent prefix guard exists for: count ties, symbol-dense
    // rankings, merges whose outputs collide with later candidates'
    // symbols. The batched trainer must match one-merge-per-round
    // sequential BIT-FOR-BIT (ranks, symbols, freqs) on all of them.
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 6) {
      val words = (1 to 12).map { _ =>
        val len = 2 + rnd.nextInt(5)
        val w = Seq.fill(len)(if (rnd.nextBoolean()) "a" else "b").mkString
        w -> (1L + rnd.nextInt(6))
      }.toMap
      val docs = words.toSeq.zipWithIndex.map { case ((w, c), i) =>
        (i.toLong, Seq.fill(c.toInt)(w).mkString(" "))
      }.toDF("doc_id", "text")
      val exp = referenceBpe(words, 12)
      val batched = bpeRows(TextAnalysis.bpeMerges(docs, 12))
      val sequential = bpeRows(TextAnalysis.bpeMergesDisjoint(docs, 12, 1))
      assert(sequential == exp, s"trial $trial: sequential lost vs reference")
      assert(batched == exp,
        s"trial $trial: batched != sequential for words $words\n" +
          s"got $batched\nexp $exp")
    }
  }

  test("disjoint batched trainer: full inventory at scale batch, degenerates to exact at batch 1") {
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower"),
      (3L, "newest newest newest newest newest newest"),
      (4L, "widest widest widest")).toDF("doc_id", "text")
    val exact = bpeRows(TextAnalysis.bpeMerges(docs, 8))
    assert(bpeRows(TextAnalysis.bpeMergesDisjoint(docs, 8, 1)) == exact)
    val fast = bpeRows(TextAnalysis.bpeMergesDisjoint(docs, 8))
    // the approximation keeps the inventory CONTRACT: n distinct
    // merges, every merged token the concat of its parts, ranks dense
    assert(fast.length == 8)
    assert(fast.map(_._4).distinct.length == 8)
    assert(fast.map(_._1) == (1 to 8))
    fast.foreach { case (_, l, r, m, c) =>
      assert(m == l + r && c >= 1L) }
    // and on this corpus the top of every round is disjoint enough
    // that the fast path finds the same first merges
    assert(fast.head == exact.head)
  }

  test("chunked vocabulary apply is exact past one replace chunk (>64-merge table)") {
    // a merge table deeper than BpeMaxMergesPerRound forces the
    // chunked fold (checkpoint between replace chunks); token counts
    // must equal the single-threaded sequential apply exactly
    val rnd = new scala.util.Random(7L)
    val words = (1 to 60).map { _ =>
      val len = 8 + rnd.nextInt(7)
      Seq.fill(len)("abc" (rnd.nextInt(3)).toString).mkString ->
        (1L + rnd.nextInt(3))
    }.toMap
    val merges = referenceBpe(words, 200).map(m => (m._2, m._3))
    assert(merges.length > TextAnalysis.BpeMaxMergesPerRound,
      s"fixture too small: ${merges.length} merges")
    val docs = words.toSeq.zipWithIndex.map { case ((w, c), i) =>
      (i.toLong, Seq.fill(c.toInt)(w).mkString(" "))
    }.toDF("doc_id", "text")
    def bpeLen(w: String): Long =
      merges.foldLeft(w.map(_.toString).toVector) {
        case (syms, (l, r)) => applyMerge(syms, l, r)
      }.length.toLong
    val got = TextAnalysis.bpeAppliedWith(docs, merges).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    words.toSeq.zipWithIndex.foreach { case ((w, c), i) =>
      assert(got(i.toLong) == c * bpeLen(w),
        s"doc $i ('$w' x$c): ${got(i.toLong)} != ${c * bpeLen(w)}")
    }
  }

  test("ta_bpe_train matches the single-threaded trainer on sf0.001") {
    val wordCounts = graft.sources.Tables.documents(spark, sf0001)
      .select("text").collect().iterator
      .flatMap(_.getString(0).split("\\s+"))
      .filter(w => w.nonEmpty && w.forall(ch => ch.isLetterOrDigit && ch < 128.toChar))
      .toSeq.groupMapReduce(identity)(_ => 1L)(_ + _)
    val exp = referenceBpe(wordCounts, TextAnalysis.BpeTrainMerges)
    assert(exp.length == TextAnalysis.BpeTrainMerges)
    assert(bpeRows(TextAnalysis.taBpeTrain(spark, sf0001)) == exp)
  }
}
