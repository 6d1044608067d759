package graft.operators

import graft.SparkTestBase

class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("chunking covers every token with the configured stride and window") {
    val got = Pipeline.taChunk(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
    assert(got.nonEmpty)
    val byDoc = got.groupBy(_._1)
    val nTokens = graft.sources.Tables.documents(spark, sf0001)
      .selectExpr("doc_id",
        "size(filter(split(text, '\\\\s+'), t -> length(t) > 0)) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    byDoc.foreach { case (doc, chunks) =>
      val n = nTokens(doc)
      val expected = (n + Pipeline.ChunkStride - 1) / Pipeline.ChunkStride
      assert(chunks.length == expected, s"doc $doc: ${chunks.length} != $expected")
      chunks.foreach { case (_, idx, text, ct) =>
        val start = idx * Pipeline.ChunkStride
        assert(ct == math.min(Pipeline.ChunkTokens, n - start).toInt)
        assert(text.split("\\s+").count(_.nonEmpty) == ct)
      }
      // strided windows jointly cover all n tokens
      assert(chunks.map(c => c._2 * Pipeline.ChunkStride + c._4).max >= n)
    }
  }

  test("packing offsets are contiguous within a shard and reset across shards") {
    val rows = Pipeline.taPack(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, shard) =>
      val inOrder = shard.sortBy(_._1)
      // first doc of a shard starts at offset 0; each next doc starts
      // where the previous ended
      assert(inOrder.head._4 == 0L)
      inOrder.sliding(2).foreach {
        case Array((_, _, n1, off1, _, _), (_, _, _, off2, _, _)) =>
          assert(off2 == off1 + n1)
        case _ => ()
      }
      inOrder.foreach { case (_, _, n, off, pack, crosses) =>
        assert(pack == off / Pipeline.PackBudget)
        assert(crosses ==
          (n > 0 && (off + n - 1) / Pipeline.PackBudget != pack))
      }
    }
  }

  test("contamination covers exactly the eval bucket with rates in [0,1]") {
    import org.apache.spark.sql.functions._
    val rows = Pipeline.taContamination(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, (n, hit, rate)) =>
      assert(hit <= n, s"doc $id")
      assert(rate >= 0.0 && rate <= 1.0, s"doc $id")
      assert(math.abs(rate - hit.toDouble / n) == 0.0, s"doc $id")
    }
    val expected = graft.sources.Tables.documents(spark, sf0001)
      .filter(graft.functions.md5Bucket($"doc_id".cast("string"),
        Pipeline.EvalBuckets.toInt) === 0 &&
        size(graft.functions.tokens($"text")) >= Pipeline.ContamGram)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == expected)
  }

  test("e2e pipeline stats are consistent with its own stages") {
    val agg = Pipeline.pipeE2e(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(agg.nonEmpty)
    // chunks-per-doc >= 1 and sum_chunk_tokens >= n_chunks (every chunk
    // has at least one token)
    agg.foreach { case (lang, (docs, chunks, toks)) =>
      assert(docs >= 1, lang)
      assert(chunks >= docs, lang)
      assert(toks >= chunks, lang)
    }
    // kept docs never exceed the corpus count per language
    val langCounts = graft.sources.Tables.documents(spark, sf0001)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    agg.foreach { case (lang, (docs, _, _)) =>
      assert(docs <= langCounts(lang), lang)
    }
  }

  test("pair mining draws both sides only from the QA-kept corpus, ranked per query") {
    import org.apache.spark.sql.functions.{col, concat_ws, md5, size, slice}
    val toks = graft.functions.tokens(col("text"))
    val kept = graft.sources.Tables.documents(spark, sf0001)
      .filter(size(toks) > 0 &&
        TextAnalysis.qualityScore(toks) >= Pipeline.QualityMin)
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(toks, 1, 10))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val canonical = kept.groupBy(_._2).values.map(_.map(_._1).min).toSet
    val vecIds = graft.sources.Tables.embeddings(spark, sf0001)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val eligible = canonical intersect vecIds
    val rows = Pipeline.pipePairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // every mined pair stays inside the cleaned, linked corpus
    assert(rows.forall { case (q, _, c) => eligible(q) && eligible(c) && q != c })
    // per query: ranks are 1..m with m <= PairsK
    rows.groupBy(_._1).values.foreach { g =>
      val ranks = g.map(_._2).sorted
      assert(ranks.length <= Pipeline.PairsK &&
        ranks.toSeq == (1 to ranks.length))
    }
    // a dropped duplicate (non-canonical member of a multi-doc fp group)
    // must appear on NEITHER side
    val dropped = kept.map(_._1).toSet diff canonical
    assert(dropped.nonEmpty, "gate corpus must actually drop duplicates")
    assert(rows.forall { case (q, _, c) => !dropped(q) && !dropped(c) })
  }

  test("incremental pair mining: only NEW kept docs mine, base index builds once") {
    import org.apache.spark.sql.functions.{col, concat_ws, md5, size, slice}
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val thr = Similarity.upsertThreshold(docs.count())
    val toks = graft.functions.tokens(col("text"))
    val qf = docs.filter(size(toks) > 0 &&
        TextAnalysis.qualityScore(toks) >= Pipeline.QualityMin)
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(toks, 1, 10))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val baseFps = qf.filter(_._1 < thr).map(_._2).toSet
    // expected batch survivors: quality, >= threshold, min-id per fp
    // within the batch, fp unseen in the base
    val deltaKept = qf.filter { case (id, fp) => id >= thr && !baseFps(fp) }
      .groupBy(_._2).values.map(_.map(_._1).min).toSet
    val rows = Pipeline.pipePairsUpsert(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // queries are EXACTLY the new-batch survivors with >=1 candidate;
    // never a base doc, never a dropped duplicate
    assert(rows.forall { case (q, _, _) => deltaKept(q) })
    // candidates come from the kept corpus (base survivors or batch
    // survivors) and exclude self
    val baseKept = qf.filter(_._1 < thr)
      .groupBy(_._2).values.map(_.map(_._1).min).toSet
    assert(rows.forall { case (q, _, c) =>
      (baseKept(c) || deltaKept(c)) && c != q })
    rows.groupBy(_._1).values.foreach { g =>
      val ranks = g.map(_._2).sorted
      assert(ranks.length <= Pipeline.PairsK &&
        ranks.toSeq == (1 to ranks.length))
    }
    // O(delta) serve contract: a second run must not retrain the base
    // index (the session cache IS the persisted artifact)
    val passesBefore = Similarity.trainingPasses.get()
    Pipeline.pipePairsUpsert(spark, sf0001).collect()
    assert(Similarity.trainingPasses.get() == passesBefore,
      "second pipe_pairs_upsert run retrained the base index")
  }

  test("pipe_mix: per-language cuts respect the waterfill allocation exactly") {
    val rows = Pipeline.pipeMix(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, avail, alloc, nDocs, keptTok) =>
      assert(keptTok <= alloc, s"$lang kept past its allocation")
      assert(alloc <= avail, s"$lang allocated past its capacity")
      assert(nDocs >= 0 && keptTok >= 0)
    }
    // the allocation is half the surviving tokens; the greedy fit-rule
    // cut can at most leave one partial doc per language unfilled
    val totalAvail = rows.map(_._2).sum
    val totalAlloc = rows.map(_._3).sum
    assert(totalAlloc === totalAvail / 2)
    // every language row appears even if its cut kept nothing
    val langs = graft.sources.Tables.documents(spark, sf001)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(rows.map(_._1).toSet === langs)
    // deterministic
    val again = Pipeline.pipeMix(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(again.toSeq === rows.toSeq)
  }

  test("pipe_scrub: every stage bites and the summary is internally consistent") {
    val rows = Pipeline.pipeScrub(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    assert(rows.map(_._2).sum == 500L, "every doc enters")
    rows.foreach { case (lang, nIn, nKept, nPii, nSpan, nToks) =>
      assert(nKept <= nIn && nKept > 0, s"$lang kept")
      assert(nPii > 0, s"$lang: the injected PII must be redacted")
      assert(nSpan >= 0 && nToks > 0, s"$lang totals")
    }
    // the scrub and span stages each remove something somewhere, and
    // the dedup stage drops at least one re-crawl
    assert(rows.map(_._5).sum > 0, "span stage removed tokens")
    assert(rows.map(_._2).sum > rows.map(_._3).sum, "dedup dropped docs")
    // per-lang PII totals over kept docs can never exceed the gate's
    // full-corpus redaction counts
    val fullPii = graft.operators.Pii.taPii(spark, sf001).collect()
      .map(r => r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4))
      .sum
    assert(rows.map(_._4).sum <= fullPii)
  }
}
