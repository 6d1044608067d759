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
      HyperplaneBuckets.hyperplaneBuckets(col("embedding")).as("native"),
      hofBuckets.as("hof")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1))
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
