package graft.functions

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

class VectorExpressionsSpec extends SparkTestBase {

  test("codegen'd cosine is bit-identical to the HOF formulation on real vectors") {
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val a = e.selectExpr("vec_id AS a_id", "embedding AS ea")
    val b = e.selectExpr("vec_id AS b_id", "embedding AS eb")
    val pairs = a.join(b, col("a_id") < col("b_id")).limit(2000)
    val both = pairs.select(
      cosineSim(col("ea"), col("eb")).as("native"),
      (dotProductHof(col("ea"), col("eb")) /
        (l2NormHof(col("ea")) * l2NormHof(col("eb")))).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}")
    }
  }

  test("native shingles match the declarative HOF formulation on real docs") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val both = docs.select(
      WordShinglesExpr.wordShinglesNative(col("text"), 3).as("native"),
      wordShingles(tokens(col("text")), 3).as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("shingle hashes are the md5Hash64 of each shingle string, in order") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val both = docs.select(
      WordShingleHashesExpr.wordShingleHashesNative(col("text"), 3).as("hashed"),
      WordShinglesExpr.wordShinglesNative(col("text"), 3).as("strings"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val expected = r.getSeq[String](1).map(s => SimHash.md5Hash64(
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      assert(r.getSeq[Long](0) == expected)
    }
  }

  test("hyperplane buckets expression matches the per-plane HOF formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DoubleType
    val e = graft.sources.Tables.embeddings(spark, sf0001).limit(200)
    val hofBuckets = array((0 until HyperplaneBuckets.NumTables).map { t =>
      (0 until HyperplaneBuckets.PlanesPerTable).map { p =>
        val plane = HyperplaneBuckets.hyperplanes(
          t * HyperplaneBuckets.PlanesPerTable + p)
        val dot = aggregate(
          zip_with(col("embedding"), lit(plane), (x, h) => x.cast(DoubleType) * h),
          lit(0.0), (acc, x) => acc + x)
        when(dot >= 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
    }: _*)
    val both = e.select(
      HyperplaneBuckets
        .hyperplaneBuckets(col("embedding"), HyperplaneBuckets.PlanesPerTable)
        .as("native"),
      hofBuckets.as("hof")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1))
    }
  }

  test("hyperplane resolution APPENDS bits: finer buckets mask down to coarser ones") {
    import org.apache.spark.sql.functions._
    val H = HyperplaneBuckets
    val e = graft.sources.Tables.embeddings(spark, sf0001).limit(200)
    val rows = e.select(
      H.hyperplaneBuckets(col("embedding"), H.PlanesPerTable).as("b6"),
      H.hyperplaneBuckets(col("embedding"), 12).as("b12"),
      H.hyperplaneBuckets(col("embedding")).as("b16")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b6, b12, b16) =
        (r.getSeq[Int](0), r.getSeq[Int](1), r.getSeq[Int](2))
      (0 until H.NumTables).foreach { t =>
        assert((b16(t) & 63) == b6(t), s"table $t: 16-bit must extend 6-bit")
        assert((b16(t) & 4095) == b12(t))
        assert(b16(t) >= 0 && b16(t) < (1 << H.MaxPlanesPerTable))
      }
    }
  }

  test("LSH resolution rule: base at gate scales, one bit per corpus doubling, capped") {
    val H = HyperplaneBuckets
    // every driver gate corpus (n <= 2000) stays at the base 6 bits —
    // the invariant that keeps all LSH oracle hashes unchanged
    assert(Seq(0L, 1L, 500L, 2000L, 3999L).forall(
      H.resolutionBits(_) == H.PlanesPerTable))
    assert(H.resolutionBits(4000L) == 7)
    assert(H.resolutionBits(200000L) == 12) // the 100x probe corpus
    assert(H.resolutionBits(Long.MaxValue) == H.MaxPlanesPerTable)
    // bucket population stays in a bounded band: n / 2^bits in [~31, 62)
    Seq(4000L, 50000L, 1000000L).foreach { n =>
      val pop = n.toDouble / (1 << H.resolutionBits(n))
      assert(pop >= 15 && pop < 63, s"n=$n population $pop out of band")
    }
  }

  test("native quantization matches the declarative HOF formulation bit-for-bit") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DoubleType
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    val v = col("embedding")
    val hofAbsmax = array_max(transform(v, x => abs(x.cast(DoubleType))))
    val hofQ = array_join(
      transform(v, x =>
        floor(x.cast(DoubleType) * (lit(127.0) / hofAbsmax) + lit(0.5))
          .cast("int").cast("string")), ",")
    val st = VectorExpressions.quantizeI8F(v)
    val both = e.select(
      VectorExpressions.absMaxF(v).as("nm"), hofAbsmax.as("hm"),
      st.getField("q8").as("nq"), hofQ.as("hq"),
      st.getField("absmax").as("sm"),
      st.getField("scale").as("sc")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(r.getString(2) == r.getString(3))
      // struct absmax/scale agree with the standalone kernel
      assert(java.lang.Double.doubleToLongBits(r.getDouble(4)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(0)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(5)) ==
        java.lang.Double.doubleToLongBits(127.0 / r.getDouble(0)))
    }
  }

  test("mixed-precision dot and double norm kernels are bit-identical to the HOF forms") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DoubleType
    val e = graft.sources.Tables.embeddings(spark, sf0001)
    // a double-array "centroid" derived from each vector (shifted so it
    // differs from the float side)
    val cv = transform(col("embedding"), x => x.cast(DoubleType) * lit(1.5) + lit(0.25))
    val both = e.select(
      VectorExpressions.dotFD(col("embedding"), cv).as("nd"),
      dotProductHof(col("embedding"), cv).as("hd"),
      VectorExpressions.l2NormD(cv).as("nn"),
      sqrt(aggregate(cv, lit(0.0), (a, x) => a + x * x)).as("hn"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "dot_fd != HOF")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), "l2norm_d != HOF")
    }
  }

  test("repetition stats expression matches the explode/groupBy formulation") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val st = RepetitionStatsExpr.repetitionStats(col("text"))
    val native = docs.select(col("doc_id"), st.getField("n_words"),
      st.getField("n_distinct_words"), st.getField("n_grams"),
      st.getField("top_gram_n"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val toks = tokens(col("text"))
    val words = docs.select(col("doc_id"), explode(toks).as("w"))
      .groupBy("doc_id", "w").count()
      .groupBy("doc_id").agg(sum("count").as("nw"), count(lit(1)).as("nd"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val grams = docs.select(col("doc_id"),
      explode(WordShinglesExpr.wordShinglesNative(col("text"), 2)).as("g"))
      .groupBy("doc_id", "g").count()
      .groupBy("doc_id").agg(sum("count").as("ng"), max("count").as("top"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(native.nonEmpty)
    native.foreach { case (id, (nw, nd, ng, top)) =>
      val (ew, ed) = words.getOrElse(id, (0L, 0L))
      val (eg, et) = grams.getOrElse(id, (0L, 0L))
      assert((nw, nd) == (ew, ed), s"doc $id word stats")
      assert((ng, top) == (eg, et), s"doc $id gram stats")
    }
  }

  test("minhash signature expression: interpreted eval matches codegen path") {
    import spark.implicits._
    val df = Seq(Seq("a b c", "b c d", "c d e"), Seq("x y z"))
      .toDF("shingles")
    val viaPlan = df.select(MinHashSig.minhashSig(col("shingles")))
      .collect().map(_.getSeq[Long](0).toVector)
    val direct = Seq(Seq("a b c", "b c d", "c d e"), Seq("x y z")).map { ss =>
      MinHashSig.signature(new org.apache.spark.sql.catalyst.util.GenericArrayData(
        ss.map(org.apache.spark.unsafe.types.UTF8String.fromString))).toVector
    }
    assert(viaPlan.toSeq == direct)
  }
}
