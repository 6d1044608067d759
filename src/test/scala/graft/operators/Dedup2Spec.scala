package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

/** Semantics checks for the span-dedup / cluster-dedup family that the
  * DuckDB oracle can't express: the generic connected-components
  * contract on synthetic graphs (chains, where the pair-local drop
  * rule over-drops), and an independent single-threaded re-derivation
  * of the duplicated-span output.
  */
class Dedup2Spec extends SparkTestBase {

  test("connectedComponents: chain, triangle, and isolated pair resolve to min-id labels") {
    import spark.implicits._
    // chain 1-2-3 (1~3 NOT an edge), triangle 20-21-22, pair 30-31
    val edges = Seq((2L, 1L), (2L, 3L), (20L, 21L), (21L, 22L), (20L, 22L),
      (31L, 30L)).toDF("a_id", "b_id")
    val comp = Dedup2.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("connectedComponents: long path needs multiple propagation rounds") {
    import spark.implicits._
    // path 0-1-2-...-9: min label must travel the full diameter
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val comp = Dedup2.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 9L).forall(comp(_) == 0L))
  }

  test("star contraction labels chains, triangles, and pairs like label propagation") {
    import spark.implicits._
    val edges = Seq((2L, 1L), (2L, 3L), (20L, 21L), (21L, 22L), (20L, 22L),
      (31L, 30L), (3L, 4L), (4L, 5L)).toDF("a_id", "b_id")
    val prop = Dedup2.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = Dedup2.connectedComponentsStar(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop)
  }

  test("star contraction resolves a 1024-node chain in O(log n) rounds, not diameter") {
    import spark.implicits._
    // path 0-1-...-1023: diameter 1023; label propagation needs ~1023
    // rounds, star contraction must stay logarithmic
    val n = 1024L
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val (comp, rounds) = Dedup2.starContract(edges)
    val labels = comp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == n && (0L until n).forall(labels(_) == 0L))
    assert(rounds <= 20, s"took $rounds rounds on a 1024-chain")
  }

  test("connectedComponents auto-falls back to star contraction on a 1024-node chain") {
    import spark.implicits._
    // diameter 1023: propagation alone would need ~1023 rounds; the
    // public entry must trip its round cap and finish logarithmically
    val n = 1024L
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val (comp, rounds, usedStar) =
      Dedup2.connectedComponentsInstrumented(edges)
    val labels = comp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == n && (0L until n).forall(labels(_) == 0L))
    assert(usedStar, "round cap did not trigger the star fallback")
    assert(rounds <= Dedup2.PropagationRoundCap + 20,
      s"took $rounds total rounds on a 1024-chain")
  }

  test("connectedComponents does not fall back on low-diameter graphs") {
    import spark.implicits._
    val edges = Seq((2L, 1L), (2L, 3L), (20L, 21L), (21L, 22L), (20L, 22L),
      (31L, 30L)).toDF("a_id", "b_id")
    val (_, rounds, usedStar) =
      Dedup2.connectedComponentsInstrumented(edges)
    assert(!usedStar && rounds <= 3,
      s"near-clique graph took $rounds rounds (star=$usedStar)")
  }

  test("clusterize accepts handmade INT-typed edge frames (the documented entry)") {
    import spark.implicits._
    // dupClusters' scaladoc directs users to pass handmade edge frames
    // to clusterize; the natural Seq((1,2),...) literal yields
    // IntegerType columns, which the driver union-find arm must not
    // getLong-crash on
    val edges = Seq((1, 2), (2, 3), (10, 11)).toDF("a_id", "b_id")
    val comp = Dedup2.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("driver union-find arm labels exactly like both distributed arms") {
    import spark.implicits._
    // mixed shapes — chains (high diameter), a triangle, a pair, plus
    // a pseudo-random graph — the cutover in connectedComponents must
    // be result-invisible vs propagation AND star contraction
    val rng = new scala.util.Random(7)
    val random = Seq.fill(300)((rng.nextInt(120).toLong,
      rng.nextInt(120).toLong + 100L))
    val edges = (Seq((2L, 1L), (2L, 3L), (20L, 21L), (21L, 22L),
      (20L, 22L), (31L, 30L)) ++
      (500L until 540L).map(i => (i, i + 1)) ++ random)
      .toDF("a_id", "b_id")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val driver = toMap(Dedup2.connectedComponentsDriver(edges))
    val prop = toMap(Dedup2.connectedComponentsInstrumented(edges)._1)
    val star = toMap(Dedup2.connectedComponentsStar(edges))
    assert(driver == prop)
    assert(driver == star)
    // and the public entry (which dispatches on edge count) agrees too
    assert(toMap(Dedup2.connectedComponents(edges)) == driver)
  }

  test("the cap probe is limit-bounded and propagation rounds never re-execute the edge plan") {
    import spark.implicits._
    // an expensive edge lineage stand-in: count executed partitions
    // via an accumulator. 40 edges, cap 10 -> the distributed arm
    // runs: the probe's limit(11) scan may touch up to every partition
    // once, the checkpoint materializes each exactly once, and the
    // propagation rounds must add NOTHING (they ride the blocks — the
    // round-9 finding). 4 partitions => at most 8 executions total.
    val execs = spark.sparkContext.longAccumulator("edge-plan-execs")
    val src = spark.range(0L, 40L, 1L, 4).as[Long]
      .mapPartitions { it => execs.add(1L); it }
    val edges = src.map(i => (i, i + 1L)).toDF("a_id", "b_id")
    val comp = Dedup2.connectedComponents(edges, cap = 10L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(execs.value >= 5L && execs.value <= 8L,
      "over-cap: probe (<= 1x per partition) + one checkpoint " +
        s"materialization, rounds add zero — saw ${execs.value}")
    // and the over-cap distributed answer equals the driver arm's
    assert(comp == (0L to 40L).map(_ -> 0L).toMap)

    // under-cap: ONE limit-bounded scan answers the probe AND supplies
    // the union-find's edge array — no checkpoint is ever created (the
    // ADVICE-r10 fix: a tiny graph with a cheap plan must not pay a
    // full materialization job + transient block-manager storage)
    val execs2 = spark.sparkContext.longAccumulator("edge-plan-execs-2")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val src2 = spark.range(0L, 8L, 1L, 2).as[Long]
      .mapPartitions { it => execs2.add(1L); it }
    val small = Dedup2.connectedComponents(
      src2.map(i => (i, i + 1L)).toDF("a_id", "b_id"), cap = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(execs2.value == 2L,
      s"under-cap: one scan, no re-execution — saw ${execs2.value}")
    assert(small == (0L to 8L).map(_ -> 0L).toMap)
    assert(spark.sparkContext.getPersistentRDDs.keySet
        .diff(before).isEmpty,
      "the under-cap path must not create any checkpoint blocks")
  }

  test("star contraction: empty edge list yields zero rows in zero rounds") {
    import spark.implicits._
    val edges = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val (comp, rounds) = Dedup2.starContract(edges)
    assert(comp.collect().isEmpty && rounds == 0)
  }

  test("connectedComponents: empty edge list converges immediately to zero rows") {
    import spark.implicits._
    // a corpus with no pairs above threshold produces an empty graph;
    // sum() over zero rows is SQL-null and must not NPE the fixpoint
    val edges = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Dedup2.connectedComponents(edges).collect().isEmpty)
    assert(Dedup2.clusterize(edges).collect().isEmpty)
  }

  test("dd_cluster: components are edge-closed, canonical is the min id, sizes agree") {
    val edges = Dedup.jaccardPairsAll(spark, sf001)
      .filter(col("jaccard") >= Dedup2.ClusterThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rows = Dedup2.ddCluster(spark, sf001).collect()
    val comp = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(edges.nonEmpty && rows.nonEmpty)
    // every edge endpoint is clustered, and both ends share a component
    edges.foreach { case (a, b) =>
      assert(comp(a) == comp(b), s"edge ($a,$b) split across components")
    }
    // component label = min member; exactly one canonical per component
    val byComp = rows.groupBy(_.getLong(1))
    byComp.foreach { case (c, members) =>
      assert(members.map(_.getLong(0)).min == c)
      assert(members.count(_.getBoolean(3)) == 1)
      assert(members.forall(_.getLong(2) == members.size))
    }
  }

  test("dd_cluster keeps chain-interior docs the pair-local rule would over-drop") {
    // the pair-local rule (ddApply) drops the higher id of EVERY pair;
    // components keep one doc per transitive group — so the number of
    // retained docs (canonicals) must be <= drops of the pair rule's
    // survivors on the same edge set, and every component keeps exactly
    // one doc regardless of chain shape
    val rows = Dedup2.ddCluster(spark, sf001).collect()
    val nComponents = rows.map(_.getLong(1)).distinct.length
    assert(rows.count(_.getBoolean(3)) == nComponents)
  }

  test("dd_cluster_lsh recovers the exact clustering's strong components") {
    val exact = Dedup2.ddCluster(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lsh = Dedup2.ddClusterLsh(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs in strong (j >= 0.9) exact pairs must be clustered by the
    // LSH form too, and pairs the LSH estimate kept together must land
    // in the same LSH component
    val strong = Dedup.jaccardPairsAll(spark, sf001)
      .filter(col("jaccard") >= 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(strong.nonEmpty)
    val strongDocs = strong.flatMap(p => Seq(p._1, p._2)).distinct
    val recalled = strongDocs.count(lsh.contains)
    assert(recalled >= strongDocs.length * 0.9,
      s"LSH clustering covered $recalled of ${strongDocs.length} strong docs")
    // the two forms agree on co-membership for pairs both clustered
    strong.foreach { case (a, b) =>
      if (lsh.contains(a) && lsh.contains(b) && exact(a) == exact(b))
        assert(lsh(a) == lsh(b), s"strong pair ($a,$b) split by LSH clustering")
    }
  }

  test("exact-first edges cluster identically to the raw LSH path on mirrors, near-dups, and chains") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // a crawl-mirror-shaped fixture: exact-duplicate groups (identical
    // bytes), a near-dup pair bridging two groups, a chain through a
    // near-dup, unique docs, and degenerate short docs the signature
    // pipeline cannot see (identical 2-token texts: NO edge either way)
    // 30 words with ONLY the last differing: shingle Jaccard 27/29 ≈
    // 0.93, comfortably above the 0.8 cluster threshold even under the
    // 64-hash estimator's noise (both paths use the SAME estimate, so
    // the equality pin holds regardless)
    val stem = (1 to 29).map(i => s"word$i").mkString(" ")
    val a = s"$stem alpha"
    val aNear = s"$stem omega"
    val b = (1 to 30).map(i => s"other$i").mkString(" ")
    val docs = Seq(
      1L -> a, 2L -> a, 3L -> a,            // exact group A
      4L -> aNear, 5L -> aNear,             // exact group, near-dup of A
      6L -> b, 7L -> b,                     // exact group B (separate)
      8L -> "completely unrelated text about distributed query engines",
      9L -> "tiny doc", 10L -> "tiny doc"   // shingle-less: invisible
    ).toDF("doc_id", "text")
    def comps(edges: org.apache.spark.sql.DataFrame) =
      Dedup2.clusterize(
          edges.filter(col("est_jaccard") >= Dedup2.ClusterThreshold)
            .select(col("a_id"), col("b_id")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSet
    val raw = comps(Dedup.nearDupCandidates(docs))
    val xf = comps(Dedup.nearDupEdgesExactFirst(docs))
    assert(xf == raw,
      s"exact-first must be component-identical to the raw path:\n" +
        s"raw=$raw\nxf=$xf")
    // and the fixture actually exercised the collapse: group A and its
    // near-dup group fused across the canonical bridge
    assert(raw.exists { case (_, comp, size, _) => comp == 1L && size == 5L },
      s"groups 1-3 and 4-5 must fuse into one 5-doc component: $raw")
    assert(raw.exists { case (_, comp, size, _) => comp == 6L && size == 2L })
    // shingle-less docs appear in NEITHER output
    assert(!raw.exists(t => t._1 >= 9L) && !xf.exists(t => t._1 >= 9L),
      "short docs are invisible to both paths by construction")
  }

  test("dd_canonical_lsh keeps the argmax-quality member of each LSH component") {
    import org.apache.spark.sql.functions.{lit, size, struct, when}
    // quality as the engine computes it, materialized per doc
    val toks = graft.functions.tokens(col("text"))
    val quality = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"),
        when(size(toks) > 0, TextAnalysis.qualityScore(toks))
          .otherwise(lit(0.0)).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val members = Dedup2.ddClusterLsh(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val rows = Dedup2.ddCanonicalLsh(spark, sf001).collect()
    assert(rows.nonEmpty && rows.length == members.size)
    rows.foreach { r =>
      val (comp, keep, keepQ, sz, dropped) = (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3), r.getLong(4))
      val ms = members(comp)
      // keep = max quality, ties to min id; sizes consistent
      val want = ms.maxBy(id => (quality(id), -id))
      assert(keep == want, s"component $comp kept $keep, argmax is $want")
      assert(keepQ == quality(keep) && sz == ms.size && dropped == sz - 1)
    }
    // where the LSH clustering recovered an exact component verbatim,
    // the kept doc must agree with the exact arm's choice
    val exactKeep = Dedup2.ddCanonical(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exactMembers = Dedup2.ddCluster(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val shared = members.filter { case (c, ms) => exactMembers.get(c).contains(ms) }
    assert(shared.nonEmpty)
    val keepByComp = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    shared.keys.foreach { c =>
      assert(keepByComp(c) == exactKeep(c),
        s"identical component $c: LSH kept ${keepByComp(c)}, exact kept ${exactKeep(c)}")
    }
  }

  test("dd_spans matches a single-threaded re-derivation on sf0.001") {
    val texts = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val k = Dedup2.SpanWindow
    // positional window hashes, single-threaded
    val winRows = texts.flatMap { case (id, t) =>
      graft.functions.WordShingleHashesExpr.shingleHashes(t, k)
        .zipWithIndex.map { case (h, i) => (id, i + 1L, h) }
    }
    val occ = winRows.groupBy(_._3).view.mapValues(_.size).toMap
    val dup = winRows.filter(r => occ(r._3) > 1)
    val expected = dup.groupBy(_._1).toSeq.flatMap { case (id, rs) =>
      val ps = rs.map(_._2).sorted
      // coalesce consecutive positions into islands
      val islands = ps.foldLeft(List.empty[List[Long]]) {
        case (acc, p) => acc match {
          case cur :: rest if cur.head == p - 1 => (p :: cur) :: rest
          case _ => List(p) :: acc
        }
      }
      islands.map(isl => (id, isl.min, isl.max + k - 1,
        isl.max - isl.min + k, isl.size.toLong))
    }
    val expectedTop = expected
      .sortBy { case (id, st, _, len, _) => (-len, id, st) }.take(100)
    val got = Dedup2.ddSpans(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expectedTop)
  }

  test("dd_spans_apply matches a single-threaded re-derivation on sf0.001") {
    val texts = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val k = Dedup2.SpanWindow
    val winRows = texts.flatMap { case (id, t) =>
      graft.functions.WordShingleHashesExpr.shingleHashes(t, k)
        .zipWithIndex.map { case (h, i) => (id, i + 1L, h) }
    }
    // first occurrence (min (doc_id, pos)) of each duplicated hash
    val byHash = winRows.groupBy(_._3)
    val marked = byHash.valuesIterator.filter(_.length > 1).flatMap { rs =>
      val keep = rs.map(r => (r._1, r._2)).min
      rs.filter(r => (r._1, r._2) != keep)
    }.toSeq
    val startsByDoc = marked.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted).toMap
    val expected = startsByDoc.toSeq.sortBy(_._1).map { case (id, ss) =>
      val toks = texts.toMap.apply(id).split("\\s+").filter(_.nonEmpty)
      val kept = toks.zipWithIndex.collect {
        case (tok, i0) if !ss.exists(s => s <= i0 + 1 && i0 + 1 <= s + k - 1)
          => tok
      }
      (id, toks.length.toLong, kept.length.toLong,
        (toks.length - kept.length).toLong, kept.mkString(" "))
    }
    val got = Dedup2.ddSpansApply(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("spansRemoved keeps the first copy of an aligned cross-doc span and drops the rest") {
    import spark.implicits._
    val span = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $span gamma delta"),
      (2L, s"one two three $span four five"),
      (3L, "no duplicated content here at all " + ("u " * 6).trim)
    ).toDF("doc_id", "text")
    val out = Dedup2.spansRemoved(docs).orderBy("doc_id").collect()
    // doc 1 holds the min (doc_id, pos) for every shared window: kept
    // verbatim means NOT in the output (no marked windows); doc 2
    // loses exactly the 12 span tokens; doc 3 is untouched
    assert(out.map(_.getLong(0)).toSeq == Seq(2L))
    val r2 = out.head
    assert(r2.getLong(1) == 17L && r2.getLong(2) == 5L && r2.getLong(3) == 12L)
    assert(r2.getString(4) == "one two three four five")
  }

  test("duplicatedSpans survives a planted 10^4-copy boilerplate window without a hash window partition") {
    import spark.implicits._
    // 10^4 docs sharing one 10-token boilerplate page + 2 unique docs:
    // the worst skew shape for span dedup — every copy hashes to the
    // same window keys
    val boiler = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = ((0L until 10000L).map(i => (i, boiler)) ++
      Seq((20000L, "a b c d e f g h i j"), (20001L, "unique doc " + ("x " * 8))))
      .toDF("doc_id", "text")
    val spans = Dedup2.duplicatedSpans(docs)
    // plan shape: the duplicated-window marking must be a partial
    // aggregate, and the ONLY window is the per-doc islands pass
    // (partitioned by doc_id — bounded by doc length, never by
    // duplicate multiplicity)
    val plan = spans.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("partial_count"), plan)
    assert(!plan.contains("windowspecdefinition(h"), plan)
    // correctness: every boilerplate copy reports exactly its one
    // full-width span, the unique docs report none
    val rows = spans.collect()
    assert(rows.length == 10000)
    assert(rows.forall(r => r.getLong(0) < 10000L &&
      r.getLong(1) == 1L && r.getLong(2) == 10L && r.getLong(3) == 10L))
  }

  test("spansRemoved rebuild positions align with the hash tokenizer on Unicode whitespace") {
    import spark.implicits._
    // U+2003 (em space) splits tokens under Character.isWhitespace —
    // the rule the window hashes are derived with — but NOT under the
    // ASCII-only \s+; a \s+ rebuild would see 13 tokens where the hash
    // relation saw 14 and remove the wrong positions
    val span = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $span"),
      (2L, s"pre amble $span")).toDF("doc_id", "text")
    val out = Dedup2.spansRemoved(docs).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L))
    val r = out.head
    assert(r.getLong(1) == 14L && r.getLong(2) == 2L && r.getLong(3) == 12L)
    assert(r.getString(4) == "pre amble")
  }

  test("spansRemoved marks duplicated windows with a partial aggregate, never a hash window") {
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = ((0L until 1000L).map(i => (i, boiler)) ++
      Seq((20000L, (1 to 12).map(i => s"u$i").mkString(" ")))).toDF("doc_id", "text")
    val out = Dedup2.spansRemoved(docs)
    // the keep-first argmin must partial-aggregate on the window hash
    // (skew-collapsible), and no window function may partition by the
    // hash — the same shape duplicatedSpans pins
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("partial_min") || plan.contains("partial_count"), plan)
    assert(!plan.contains("windowspecdefinition(h"), plan)
    // doc 0 holds every min (doc_id, pos): the 999 other copies lose
    // all 10 tokens; the unique doc is untouched
    val rows = out.collect()
    assert(rows.length == 999)
    assert(rows.forall(r => r.getLong(0) > 0L && r.getLong(0) < 1000L &&
      r.getLong(3) == 10L && r.getString(4).isEmpty))
  }

  test("dd_semantic: components are closed over the exact cosine edges") {
    import graft.functions.VectorExpressions
    val e = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"),
        VectorExpressions.l2NormF(col("embedding")).as("nrm"))
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("ea"),
      col("nrm").as("na"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    val edges = a.join(b, col("a_id") < col("b_id"))
      .filter(VectorExpressions.dotF(col("ea"), col("eb")) /
        (col("na") * col("nb")) >= Dedup2.SemanticThreshold)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    val rows = Dedup2.ddSemantic(spark, sf0001).collect()
    val comp = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    edges.foreach { case (x, y) =>
      assert(comp(x) == comp(y), s"edge ($x,$y) split across components")
    }
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(0)) // label is a component min
      assert(r.getBoolean(3) == (r.getLong(0) == r.getLong(1)))
    }
  }

  test("dd_semantic_lsh components refine the exact semantic components") {
    // bucket candidates are a subset of all pairs, so every LSH edge is
    // an exact edge and each LSH component sits inside ONE exact one
    val exact = Dedup2.ddSemantic(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lsh = Dedup2.ddSemanticLsh(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lsh.nonEmpty)
    assert(lsh.keySet.subsetOf(exact.keySet))
    lsh.groupBy(_._2).values.foreach { members =>
      assert(members.keys.map(exact).toSet.size == 1,
        s"LSH component ${members.keys} spans exact components")
    }
  }

  test("ta_tfidf: ranks are 1..5 per doc, scores non-increasing, formula spot-check") {
    val rows = TextAnalysis.taTfidf(spark, sf0001).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getLong(5))
      assert(ordered.map(_.getLong(5)).toSeq == (1L to ordered.length))
      assert(ordered.sliding(2).forall {
        case Array(a, b) => a.getDouble(4) >= b.getDouble(4)
        case _ => true
      })
    }
    // spot-check the smoothed-ratio score on one row
    val n = graft.sources.Tables.documents(spark, sf0001).count()
    val r0 = rows.head
    val want = r0.getLong(2).toDouble * ((n + 1.0) / (r0.getLong(3) + 1.0))
    assert(r0.getDouble(4) == want)
  }
}
