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
}
