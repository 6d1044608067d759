package graft.operators

import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {

  private lazy val brute: Map[Long, Seq[Long]] =
    Similarity.simTopkBrute(spark, sf001).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }

  test("brute-force top-k returns k ordered neighbors per query") {
    assert(brute.keySet == (0L until Similarity.NumQueryVectors).toSet)
    brute.values.foreach(n => assert(n.size == Similarity.TopK))
    val rows = Similarity.simTopkBrute(spark, sf001).collect()
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val cosines = rs.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq
      assert(cosines == cosines.sorted.reverse, "cosine not descending")
    }
  }

  test("ANN LSH achieves useful recall vs brute force on random data") {
    val ann = Similarity.simAnnLsh(spark, sf001).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    // Synthetic embeddings are iid random (no cluster structure), the
    // hardest case for LSH; require a usable-but-modest recall floor.
    val recalls = brute.map { case (q, topk) =>
      topk.count(ann.getOrElse(q, Set.empty).contains).toDouble / topk.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.2, s"mean recall@${Similarity.TopK} = $mean")
  }

  test("IVF probes return valid, ordered neighbors from probed cells only") {
    val rows = Similarity.simIvf(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val cosines = rs.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq
      assert(cosines == cosines.sorted.reverse, "cosine not descending")
      assert(rs.length <= Similarity.TopK)
    }
    // with NumProbes of ⌈√n⌉ trained cells probed, every result must
    // still be a genuine neighbor (subset sanity vs brute scores is
    // implied by the shared cosine kernel, checked in the gate)
    val total = graft.sources.Tables.embeddings(spark, sf001).count()
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) < total))
  }

  test("kNN self-join gives every vector an ordered neighbor list from its probed cells") {
    val rows = Similarity.simKnnJoin(spark, sf001).collect()
    val total = graft.sources.Tables.embeddings(spark, sf001).count()
    val byQ = rows.groupBy(_.getLong(0))
    // with 500 vectors in ⌈√500⌉ trained cells and 2 probes, every
    // vector has candidates — the neighbor list must cover the corpus
    assert(byQ.keySet.size == total)
    byQ.values.foreach { rs =>
      assert(rs.length <= Similarity.KnnK)
      val cosines = rs.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq
      assert(cosines == cosines.sorted.reverse, "cosine not descending")
      rs.foreach(r => assert(r.getLong(0) != r.getLong(2), "self pair"))
    }
    // for the brute-oracled query vectors, the kNN join's rank-1
    // neighbor can never beat the exact rank-1 cosine
    val bruteBest = Similarity.simTopkBrute(spark, sf001).collect()
      .filter(_.getInt(1) == 1).map(r => r.getLong(0) -> r.getDouble(3)).toMap
    byQ.filter(q => bruteBest.contains(q._1)).foreach { case (q, rs) =>
      val best = rs.minBy(_.getInt(1)).getDouble(3)
      assert(best <= bruteBest(q) + 1e-12)
    }
  }

  test("filtered kNN returns only same-label neighbors, each a genuine same-label vector") {
    val rows = Similarity.simFilteredKnn(spark, sf001).collect()
    assert(rows.nonEmpty)
    val labels = graft.sources.Tables.embeddings(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    rows.foreach { r =>
      val (q, lbl, c) = (r.getLong(0), r.getInt(1), r.getLong(3))
      assert(labels(q) == lbl, s"query $q emitted under foreign label $lbl")
      assert(labels(c) == lbl, s"neighbor $c of query $q has label " +
        s"${labels(c)}, expected $lbl")
      assert(q != c)
    }
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val cosines = rs.sortBy(_.getInt(2)).map(_.getDouble(4)).toSeq
      assert(cosines == cosines.sorted.reverse)
    }
  }

  test("ANN scores only a small candidate fraction (the point of LSH)") {
    val total = graft.sources.Tables.embeddings(spark, sf001).count()
    val ann = Similarity.simAnnLsh(spark, sf001)
    // every returned neighbor must be a genuine vector id
    assert(ann.collect().forall(r => r.getLong(2) >= 0 && r.getLong(2) < total))
  }

  test("k-means assigns every vector once and improves on the seed centroids") {
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.embeddings(spark, sf001)
    val n = e.count()
    val rows = Similarity.embKmeans(spark, sf001).collect()
    assert(rows.length == n, "every vector assigned")
    assert(rows.map(_.getLong(0)).distinct.length == n, "exactly once")
    val cells = rows.map(_.getInt(1)).distinct
    assert(cells.length > 1 && cells.length <= Similarity.KmK,
      s"${cells.length} cells used")
    // training objective: mean cosine to the TRAINED centroid beats the
    // best-seed-centroid assignment (cosine is scale-invariant in the
    // centroid, so the plain mean IS the spherical k-means update and
    // Lloyd's objective is non-decreasing; quantization perturbs by
    // ~1e-12, far below the improvement scale)
    val seeds = e.filter(col("vec_id") < Similarity.KmK)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"),
        graft.functions.VectorExpressions.l2NormF(col("embedding")).as("cn"))
    val seedBest = e
      .select(col("vec_id"), col("embedding"),
        graft.functions.VectorExpressions.l2NormF(col("embedding")).as("nrm"))
      .crossJoin(broadcast(seeds))
      .select(col("vec_id"),
        (graft.functions.VectorExpressions.dotF(col("embedding"), col("cv")) /
          (col("nrm") * col("cn"))).as("c"))
      .groupBy("vec_id").agg(max(col("c")).as("best"))
      .agg(avg(col("best"))).collect()(0).getDouble(0)
    val trained = rows.map(_.getDouble(2)).sum / n
    assert(trained >= seedBest - 1e-9,
      s"trained objective $trained < seed objective $seedBest")
  }

  test("k-means is deterministic across runs") {
    val a = Similarity.embKmeans(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    val b = Similarity.embKmeans(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(a == b)
  }

  test("IVF×PQ meets its recall floor and only emits genuine neighbors") {
    val a = Similarity.simIvfPq(spark, sf001).collect()
    assert(a.length == 1)
    val row = a(0)
    assert(row.getString(0) == "ivfpq")
    assert(row.getLong(2) == Similarity.NumQueryVectors * Similarity.TopK)
    assert(row.getBoolean(4),
      s"recall ${row.getDouble(3)} below floor ${Similarity.IvfPqRecallFloor}")
    // the composed top-k itself: ≤ k ordered neighbors per query, no
    // self pairs, and an ADC-refined rank-1 can never beat brute rank-1
    import org.apache.spark.sql.functions.col
    val e = graft.sources.Tables.embeddings(spark, sf001)
    val n = e.count()
    val ivfCent = Similarity.trainedCentroids(e, Similarity.numCellsFor(n), n)
      .localCheckpoint()
    val pqCent = Similarity.pqIndex(e, n)
    val topk = Similarity.ivfPqTopK(e,
      e.filter(col("vec_id") < Similarity.NumQueryVectors),
      ivfCent, pqCent, Similarity.TopK).collect()
    val bruteBest = Similarity.simTopkBrute(spark, sf001).collect()
      .filter(_.getInt(1) == 1).map(r => r.getLong(0) -> r.getDouble(3)).toMap
    topk.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.length <= Similarity.TopK)
      rs.foreach(r => assert(r.getLong(0) != r.getLong(2), "self pair"))
      val cosines = rs.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq
      assert(cosines == cosines.sorted.reverse, "cosine not descending")
      assert(cosines.head <= bruteBest(q) + 1e-12)
    }
  }

  test("PQ with exact refine meets its recall floor and is deterministic") {
    val a = Similarity.simPq(spark, sf001).collect()
    assert(a.length == 1)
    val row = a(0)
    assert(row.getString(0) == "pq")
    assert(row.getLong(2) == Similarity.NumQueryVectors * Similarity.TopK)
    assert(row.getBoolean(4),
      s"recall ${row.getDouble(3)} below floor ${Similarity.PqRecallFloor}")
    val b = Similarity.simPq(spark, sf001).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("native PQ encode kernel is bit-identical to the declarative join/window encode") {
    import org.apache.spark.sql.functions.col
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    // kernel path: what the gated queries serve from
    val kernel = Similarity.cachedPqCodes(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    // declarative path: the same trained codebooks through the
    // broadcast-join + argmax-window encode
    val cent = Similarity.pqIndex(e, e.count())
    val declarative = Similarity
      .pqAssignAll(Similarity.pqSubAll(e, "vec_id", "embedding"), cent)
      .select(col("vec_id"), col("sub"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(kernel.size == declarative.size)
    assert(kernel == declarative)
    // every vector got all PqM codes
    assert(kernel.size == e.count() * Similarity.PqM)
  }

  test("native nearest-cell kernel matches the declarative cellRanks assignment") {
    import org.apache.spark.sql.functions.col
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val kernel = Similarity.cachedIvfAssignment(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val declarative = Similarity
      .cellRanks(e, Similarity.cachedIvfCentroids(spark, sf0001),
        "c_id", "cv_c", "cn_c")
      .filter(col("crank") === 1)
      .select(col("c_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(kernel.nonEmpty)
    assert(kernel == declarative)
    assert(kernel.size == e.count())
  }

  test("native top-p probe-cells kernel matches the declarative cellRanks probe list") {
    import org.apache.spark.sql.functions.col
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val cent = Similarity.cachedIvfCentroids(spark, sf0001)
    val p = Similarity.NumProbes
    // kernel probe lists arrive in rank order before the explode; pin
    // BOTH membership and order against the declarative rank window
    val kernel = Similarity
      .kernelProbeCells(e, cent, p, "q_id", "qv", "qn")
      .select(col("q_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1))
      .zipWithIndex
      .groupBy(_._1._1)
      .map { case (q, rows) => q -> rows.sortBy(_._2).map(_._1._2).toSeq }
    val declarative = Similarity
      .cellRanks(e, cent, "q_id", "qv", "qn")
      .filter(col("crank") <= p)
      .select(col("q_id"), col("crank"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .groupBy(_._1)
      .map { case (q, rows) => q -> rows.sortBy(_._2).map(_._3).toSeq }
    assert(kernel.nonEmpty)
    assert(kernel == declarative)
    kernel.values.foreach(cells => assert(cells.size == p))
  }

  test("embedding outliers: flagged tail is below its own cell's fence and ~p-sized") {
    val out = Similarity.embOutliers(spark, sf001).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(2) < r.getDouble(3),
      "every flagged vector is strictly below its cell's p10 fence"))
    val n = graft.sources.Tables.embeddings(spark, sf001).count()
    // strictly-below-p10 flags at most ~10% (ties sit ON the fence and
    // are kept); tiny cells can flag none
    assert(out.length <= n * Similarity.OutlierP * 1.5 && out.length > 0)
    // deterministic: two runs agree exactly
    val again = Similarity.embOutliers(spark, sf001).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("emb_assign2: hierarchical assignment covers every vector and routes through real cells") {
    import org.apache.spark.sql.functions.col
    val n = graft.sources.Tables.embeddings(spark, sf0001).count()
    val out = Similarity.embAssign2(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
    assert(out.length === n, "every vector gets a two-level home cell")
    out.foreach { case (id, f, t, a) =>
      assert(a === (f == t), s"vec $id agreement flag")
    }
    val agree = out.count(_._4).toDouble / out.length
    // two-level can mis-route (that is the documented trade); on this
    // corpus the majority of vectors must still land on their flat cell
    assert(agree > 0.5 && agree <= 1.0, s"agreement $agree")
    // cells referenced are real trained cells
    val cells = Similarity.trainedCentroids(
      graft.sources.Tables.embeddings(spark, sf0001),
      Similarity.numCellsFor(n), n)
      .select(col("cell")).collect().map(_.getInt(0)).toSet
    out.foreach { case (id, f, t, _) =>
      assert(cells.contains(f) && cells.contains(t), s"vec $id cells")
    }
    // deterministic across runs
    val again = Similarity.embAssign2(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
    assert(again.toSeq === out.toSeq)
  }

  test("sim_ivf_upsert: assign-only delta equals a full rebuild under the frozen centroids") {
    import org.apache.spark.sql.functions.col
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val t = Similarity.upsertThreshold(e.count())
    val base = e.filter(col("vec_id") < t)
    val nb = base.count()
    val cent = Similarity.trainedCentroids(base, Similarity.numCellsFor(nb), nb)
    // the invariance the upsert contract rests on: per-vector assignment
    // does not depend on the other list members, so base-lists ∪
    // delta-assignments == rebuild-from-scratch
    val rebuilt = Similarity.kernelProbeCells(e, cent, 1, "c_id", "cv_c", "cn_c")
      .select(col("c_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val upserted = Similarity
      .kernelProbeCells(base, cent, 1, "c_id", "cv_c", "cn_c")
      .select(col("c_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap ++
      Similarity.kernelProbeCells(e.filter(col("vec_id") >= t), cent, 1,
        "c_id", "cv_c", "cn_c")
        .select(col("c_id"), col("cell")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(upserted === rebuilt, "delta assignment must equal rebuild")

    // the gated serve reaches into the upserted slice (new vectors are
    // actually retrievable, not just stored)
    val served = Similarity.simIvfUpsert(spark, sf0001).collect()
    assert(served.exists(_.getLong(2) >= t),
      s"top-$TopKShown results should include post-threshold vectors")
    // and the delta scan pushes the threshold to the parquet footer
    val plan = Similarity.simIvfUpsert(spark, sf0001)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("GreaterThanOrEqual(vec_id"),
      s"the delta pass must scan only the new slice:\n$plan")
  }

  test("mmrRerank: greedy reference equality and the diversity property on a planted cluster") {
    import spark.implicits._
    // a tight near-duplicate cluster along e1 plus two genuinely
    // different directions; query 0 points at the cluster
    val vecs: Map[Long, Array[Float]] = Map(
      0L -> Array(1f, 0f, 0f),
      10L -> Array(0.99f, 0.14f, 0f),   // cluster
      11L -> Array(0.99f, 0.141f, 0f),  // cluster (near-dup of 10)
      12L -> Array(0.98f, 0.15f, 0f),   // cluster (near-dup of 10/11)
      20L -> Array(0.6f, 0f, 0.8f),     // off-cluster, still relevant
      21L -> Array(0.5f, 0.5f, 0.70710678f))
    val df = vecs.toSeq.map { case (i, v) => (i, v) }
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(
      df, df.filter($"vec_id" === 0L), k = 3, poolK = 5)
      .collect().sortBy(_.getInt(1))
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))

    // scala reference: the same greedy over the same float-kernel cosines
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      def nrm(x: Array[Float]) = math.sqrt(dot(x, x))
      dot(a, b) / (nrm(a) * nrm(b))
    }
    val pool = (vecs - 0L).toSeq
      .map { case (i, v) => (i, cos(vecs(0L), v)) }
      .sortBy { case (i, r) => (-r, i) }.take(5)
    var sel = Vector.empty[(Int, Long, Double, Double)]
    for (t <- 1 to 3) {
      val picked = pool.filterNot(c => sel.exists(_._2 == c._1)).map {
        case (i, r) =>
          val pen = if (sel.isEmpty) 0.0
            else sel.map(sl => cos(vecs(sl._2), vecs(i))).max
          (i, r, 0.5 * r - 0.5 * pen)
      }.minBy { case (i, _, sc) => (-sc, i) }
      sel = sel :+ ((t, picked._1, picked._2, picked._3))
    }
    // kernel dot order and the zip/sum reference can differ in the last
    // ulp; compare ids exactly and scores to 1e-9
    assert(got.map(_._2).toSeq == sel.map(_._2),
      s"selection ids must match the greedy reference: $got vs $sel")
    got.zip(sel).foreach { case ((_, _, gr, gs), (_, _, er, es)) =>
      assert(math.abs(gr - er) < 1e-9 && math.abs(gs - es) < 1e-9) }
    // the diversity property itself: plain top-3 is the duplicate
    // cluster; MMR's second pick must ESCAPE the cluster to the
    // relevant off-cluster doc (the third greedily weighs the
    // remaining candidates — with this fixture it correctly returns
    // to the cluster, because 21 is itself too close to pick 2)
    val plain = pool.take(3).map(_._1).toSet
    assert(plain == Set(10L, 11L, 12L), s"fixture broken: $pool")
    val mmrIds = got.map(_._2).toSet
    assert(mmrIds != plain, "MMR must differ from the plain top-k")
    assert(got(0)._2 == 10L && got(1)._2 == 20L,
      s"rank 1 is the relevance argmax, rank 2 escapes the cluster: $got")
  }

  test("simMmrServed: greedy over the SERVED pool matches the driver reference; agrees with brute where pools coincide") {
    // the served pool per query IS simIvf's result (MmrPoolK == TopK)
    val served = Similarity.simIvf(spark, sf001).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getInt(1))
          .map(r => (r.getLong(2), r.getDouble(3))).toSeq }
    val mmrServed = Similarity.simMmrServed(spark, sf001).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getInt(1))
          .map(r => (r.getLong(2), r.getDouble(4))).toSeq }
    // every query answers with a full diversified list
    assert(mmrServed.keySet == (0L until Similarity.NumQueryVectors).toSet)
    mmrServed.values.foreach(sel => assert(sel.size == Similarity.MmrK))
    // driver greedy reference over the exact pool the engine served —
    // certifies the rerank core ran unchanged on the IVF shortlist
    val poolIds = served.values.flatten.map(_._1).toSet
    val emb: Map[Long, Array[Float]] =
      graft.sources.Tables.embeddings(spark, sf001)
        .select("vec_id", "embedding")
        .collect().map(r => r.getLong(0) ->
          r.getSeq[Float](1).toArray).toMap
        .view.filterKeys(poolIds.contains).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    served.foreach { case (q, pool) =>
      var sel = Vector.empty[(Long, Double)]
      for (_ <- 1 to Similarity.MmrK) {
        val pick = pool.filterNot(c => sel.exists(_._1 == c._1)).map {
          case (i, r) =>
            val pen = if (sel.isEmpty) 0.0
              else sel.map(sl => cos(emb(sl._1), emb(i))).max
            (i, 0.5 * r - 0.5 * pen)
        }.minBy { case (i, sc) => (-sc, i) }
        sel = sel :+ pick
      }
      val got = mmrServed(q)
      assert(got.map(_._1) == sel.map(_._1),
        s"query $q: served rerank must equal the greedy reference " +
          s"over its own pool ($got vs $sel)")
      got.zip(sel).foreach { case ((_, gs), (_, es)) =>
        assert(math.abs(gs - es) < 1e-9) }
    }
    // and wherever the served pool coincides with brute, the served
    // rerank IS the brute rerank (vacuously true only if recall never
    // hits 1.0 on any query — checked, not assumed, by the reference
    // equality above)
    val mmrBrute = Similarity.simMmr(spark, sf001).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    brute.keys.foreach { q =>
      if (brute(q).toSet == served(q).map(_._1).toSet)
        assert(mmrBrute(q) == mmrServed(q).map(_._1),
          s"query $q: equal pools must rerank identically")
    }
  }

  test("mmrRerankFromPool: deep k plans in O(k) — selected is materialized per round") {
    import spark.implicits._
    // 40 candidates, one query; k = 14 — past the ~12 where a 3^k
    // symbolic plan stalls Catalyst for minutes. The per-round
    // localCheckpoint keeps this instant; a hang here IS the failure.
    val vecs = (0L to 40L).map(i =>
      (i, Array.tabulate(4)(j => ((i * 7 + j * 13) % 17 / 17.0f))))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(df, df.filter($"vec_id" === 0L),
      k = 14, poolK = 20).collect()
    assert(got.length == 14)
    assert(got.map(_.getLong(2)).distinct.length == 14,
      "greedy must never reselect a candidate")
  }

  private val TopKShown = Similarity.TopK
}
