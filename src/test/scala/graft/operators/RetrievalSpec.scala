package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Semantic properties of the lexical-retrieval / corpus-overlap
  * operators (`ta_bm25`, `cp_overlap`) — the guarantees beyond the
  * DuckDB hash parity the driver gate checks.
  */
class RetrievalSpec extends SparkTestBase {

  private def docsFrame(rows: Seq[(Long, String)]) =
    spark.createDataFrame(rows).toDF("doc_id", "text")

  private def queryFrame(rows: Seq[(Int, String)]) =
    spark.createDataFrame(rows).toDF("query_id", "term")

  test("ta_bm25: well-formed ranking — dense ranks, descending scores, n_terms bounded") {
    val out = TextAnalysis.taBm25(spark, sf001).collect()
    assert(out.nonEmpty)
    val byQuery = out.groupBy(_.getInt(0))
    val nTermsPerQuery = TextAnalysis.bm25Queries.groupBy(_._1)
      .view.mapValues(_.size).toMap
    byQuery.foreach { case (qid, rows) =>
      val ranks = rows.map(_.getLong(1)).sorted
      assert(ranks.toSeq === (1L to rows.length).toSeq,
        s"query $qid: ranks are dense 1..k")
      assert(rows.length <= TextAnalysis.Bm25TopDocs)
      val byRank = rows.sortBy(_.getLong(1)).map(_.getDouble(4))
      byRank.sliding(2).filter(_.length == 2).foreach { w =>
        assert(w(0) >= w(1),
          s"query $qid: scores non-increasing down the ranking")
      }
      rows.foreach(r => assert(r.getLong(3) <= nTermsPerQuery(qid),
        "matched terms never exceed the query's term count"))
    }
  }

  test("bm25TopDocs: tf saturation ranks heavier term use higher at equal length") {
    // same length (8 tokens), increasing tf of the query term
    val docs = docsFrame(Seq(
      1L -> "x a b c d e f g",
      2L -> "x x a b c d e f",
      3L -> "x x x x a b c d",
      4L -> "a b c d e f g h"))
    val out = TextAnalysis.bm25TopDocs(docs, queryFrame(Seq(1 -> "x")), 10)
      .collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(3L, 2L, 1L),
      "more occurrences rank higher; the no-match doc is absent")
    val scores = out.sortBy(_.getLong(1)).map(_.getDouble(4))
    assert(scores(0) - scores(1) < scores(1) - scores(2) + 1e-12,
      "tf gain saturates: the 2→4 step adds less than the 1→2 step")
  }

  test("bm25TopDocs: length normalization ranks the tighter document higher") {
    val docs = docsFrame(Seq(
      1L -> "x a",
      2L -> "x a b c d e f g h i j k l m n o p q r s"))
    val out = TextAnalysis.bm25TopDocs(docs, queryFrame(Seq(1 -> "x")), 10)
      .collect().sortBy(_.getLong(1))
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 2L),
      "same tf, shorter doc wins under b-normalization")
  }

  test("bm25TopDocs: rarer terms carry higher idf weight") {
    // "rare" appears in 1 of 4 docs, "common" in all 4; doc 1 and doc 2
    // have identical length and tf profiles for their respective terms
    val docs = docsFrame(Seq(
      1L -> "rare a b c",
      2L -> "common a b c",
      3L -> "common d e f",
      4L -> "common g h i"))
    val out = TextAnalysis.bm25TopDocs(
      docs, queryFrame(Seq(1 -> "rare", 1 -> "common")), 10)
      .collect()
    val score = out.map(r => r.getLong(2) -> r.getDouble(4)).toMap
    assert(score(1L) > score(2L),
      "equal tf and dl: the rare-term doc outscores the common-term doc")
  }

  test("sim_hybrid: RRF fusion is consistent with its own arms") {
    val out = Similarity.simHybrid(spark, sf001).collect()
    assert(out.nonEmpty)
    val byQuery = out.groupBy(_.getLong(0))
    assert(byQuery.keySet === (0L until Similarity.NumQueryVectors).toSet)
    byQuery.foreach { case (qid, rows) =>
      val ranks = rows.map(_.getLong(1)).sorted
      assert(ranks.toSeq === (1L to rows.length).toSeq)
      assert(rows.length <= Similarity.HybridTopK)
      rows.foreach { r =>
        val lex = if (r.isNullAt(3)) None else Some(r.getLong(3))
        val dense = if (r.isNullAt(4)) None else Some(r.getLong(4))
        assert(lex.isDefined || dense.isDefined,
          "every fused doc came from at least one arm")
        assert(r.getLong(2) !== qid, "self-matches are excluded")
        val expected =
          lex.map(v => 1.0 / (60.0 + v)).getOrElse(0.0) +
            dense.map(v => 1.0 / (60.0 + v)).getOrElse(0.0)
        assert(r.getDouble(5) === expected, "rrf matches its definition")
      }
      // rrf non-increasing down the ranking
      val byRank = rows.sortBy(_.getLong(1)).map(_.getDouble(5))
      byRank.sliding(2).filter(_.length == 2).foreach(w =>
        assert(w(0) >= w(1)))
    }
    // a doc ranked by BOTH arms fuses above one ranked by a single arm
    // at any rank: min two-arm rrf (1/80 + 1/80) > max one-arm (1/61)
    val both = out.filter(r => !r.isNullAt(3) && !r.isNullAt(4))
    val single = out.filter(r => r.isNullAt(3) ^ r.isNullAt(4))
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_.getDouble(5)).min > 0 && single.nonEmpty)
  }

  test("cp_overlap: complete pair matrix with exact Jaccard extremes") {
    // s1 == s2 (identical shingle sets), s3 disjoint
    val docs = spark.createDataFrame(Seq(
      (1L, "p q r s t u", "s1"),
      (2L, "p q r s t u", "s2"),
      (3L, "z y x w v k", "s3"))).toDF("doc_id", "text", "source")
    val out = CorpusOps.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(out.size === 3, "all C(3,2) pairs present, including zero-overlap")
    assert(out(("s1", "s2")) === 1.0)
    assert(out(("s1", "s3")) === 0.0)
    assert(out(("s2", "s3")) === 0.0)
  }

  test("cp_overlap: gate output covers every source pair at sf0.001") {
    val nSources = graft.sources.Tables.documents(spark, sf0001)
      .select("source").distinct().count()
    val out = CorpusOps.cpOverlap(spark, sf0001).collect()
    assert(out.length === (nSources * (nSources - 1) / 2).toInt)
    out.foreach { r =>
      val (na, nb, common, j) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(common <= math.min(na, nb))
      assert(j >= 0.0 && j <= 1.0)
      assert(math.abs(j - common.toDouble / (na + nb - common)) === 0.0)
    }
  }
}
