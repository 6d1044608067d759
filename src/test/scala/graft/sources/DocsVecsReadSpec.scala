package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ArrayType, FloatType, StringType}

import graft.SparkTestBase

/** Schema-variant fixtures for the documents/embeddings readers — the
  * `EventsReadSpec` pattern extended to the other two corpus tables. A
  * regeneration once changed `events.ts` (Long-nanos → TIMESTAMP µs)
  * and silently broke the streaming readers; these pin the equivalent
  * drift axes for text (STRING vs BINARY) and vectors (float vs double
  * elements) to the same serve-path answers, so the next regeneration
  * fails HERE, not in 60 downstream operators.
  */
class DocsVecsReadSpec extends SparkTestBase {
  import spark.implicits._

  /** Write `df` as `<tmpdir>/<table>.parquet` (the layout
    * [[Tables.table]] reads) and return the parent dir.
    */
  private def stage(df: DataFrame, table: String): String = {
    val parent = Files.createTempDirectory("graft-schema-dv-")
    df.coalesce(1).write.mode("overwrite")
      .parquet(parent.resolve(s"$table.parquet").toString)
    parent.toString
  }

  private def docsDf: DataFrame = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s0", 46L),
    (1L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s1", 46L),
    (2L, "one two three four five six seven eight nine", "en", "s0", 45L),
    (3L, "alpha beta gamma delta nine eight seven six", "en", "s1", 44L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("documents: BINARY text normalizes to STRING and reads identically") {
    val asString = stage(docsDf, "documents")
    val asBinary = stage(docsDf.selectExpr(
      "doc_id", "CAST(text AS BINARY) AS text", "lang", "source", "n_chars"),
      "documents")
    val b = Tables.documents(spark, asBinary)
    assert(b.schema("text").dataType == StringType,
      "reader normalizes binary text to string")
    def texts(d: String) = Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(texts(asBinary) == texts(asString))
  }

  test("documents: serve paths (minhash signatures, BM25 postings) agree across text encodings") {
    val asString = stage(docsDf, "documents")
    val asBinary = stage(docsDf.selectExpr(
      "doc_id", "CAST(text AS BINARY) AS text", "lang", "source", "n_chars"),
      "documents")
    // the native shingle/minhash kernels take StringType input — the
    // exact surface a binary-text corpus would have broken
    def sigs(d: String) = graft.operators.Dedup
      .minhashSignatures(Tables.documents(spark, d))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(sigs(asBinary).nonEmpty)
    assert(sigs(asBinary) == sigs(asString))
    def postings(d: String) = graft.streaming.DocStreams
      .bm25Postings(Tables.documents(spark, d))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(postings(asBinary).nonEmpty)
    assert(postings(asBinary) == postings(asString))
  }

  /** Vector fixture whose doubles are exact float promotions, so the
    * reader's downcast is the identity and serve outputs can be
    * compared bit-for-bit.
    */
  private def vecsDf: DataFrame = {
    val rnd = new scala.util.Random(42)
    (0L until 12L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
  }

  test("embeddings: array<double> normalizes to array<float> and serves identically") {
    val asFloat = stage(vecsDf, "embeddings")
    val asDouble = stage(vecsDf.selectExpr(
      "vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS embedding", "label"),
      "embeddings")
    val b = Tables.embeddings(spark, asDouble)
    b.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => ()
      case other => fail(s"reader left embedding as $other")
    }
    // serve path: the float dot/norm kernels — the exact surface a
    // double-written corpus would have broken (kernel input type)
    def top(d: String) = {
      val e = Tables.embeddings(spark, d)
      graft.operators.Similarity
        .cosineTopK(e, e.filter($"vec_id" < 3), k = 5)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
    }
    val ft = top(asFloat)
    assert(ft.nonEmpty)
    assert(top(asDouble) == ft)
  }

  test("embeddings: streaming ANN serve agrees across vector element types") {
    val asFloat = stage(vecsDf, "embeddings")
    val asDouble = stage(vecsDf.selectExpr(
      "vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS embedding", "label"),
      "embeddings")
    def serve(d: String) = graft.streaming.VecStreams.stAnn(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    val ft = serve(asFloat)
    assert(ft.nonEmpty)
    assert(serve(asDouble) == ft)
  }
}
