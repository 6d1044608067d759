package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions._
import graft.operators.{Pipeline, TextAnalysis}

/** DataFrame-first corpus API: the engine's training-data operators as
  * composable `DataFrame => DataFrame` transforms over ANY frame with
  * the right columns — not just the driver-gated query registry (which
  * binds them to the test corpus loaders). Column contracts:
  *
  *  - document ops take `(id, text)` column names (defaults
  *    `doc_id`/`text`);
  *  - embedding ops take `(id, vector)` with `vector: array<float>`;
  *  - everything lowers to the same Catalyst expressions the gated
  *    queries use, so behavior is exactly what the DuckDB oracle
  *    certifies.
  *
  * `import graft.api.Corpus.implicits._` adds the fluent `df.chunked()`
  * style; the plain functions below are the API.
  */
object Corpus {

  // ---------------------------------------------------------------- text

  /** Lowercased, whitespace-collapsed text in `outCol`. */
  def normalized(df: DataFrame, text: String = "text",
      outCol: String = "norm_text"): DataFrame =
    df.withColumn(outCol,
      regexp_replace(lower(trim(col(text))), "\\s+", " "))

  /** Heuristic quality score (stopword-ratio × length prior) in
    * `outCol`; null for token-less docs.
    */
  def qualityScored(df: DataFrame, text: String = "text",
      outCol: String = "quality_score"): DataFrame = {
    val t = tokens(col(text))
    df.withColumn(outCol,
      when(size(t) > 0, TextAnalysis.qualityScore(t)))
  }

  /** Exact-dedup fingerprint (md5 of normalized text) in `outCol`. */
  def fingerprinted(df: DataFrame, text: String = "text",
      outCol: String = "fingerprint"): DataFrame =
    df.withColumn(outCol, fingerprintMd5(col(text)))

  /** Keep one row per distinct normalized text: the row with the lowest
    * `id`. One keyed shuffle on the fingerprint.
    */
  def exactDeduped(df: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val w = Window.partitionBy(col("__fp"))
    df.withColumn("__fp", fingerprintMd5(col(text)))
      .withColumn("__keep", col(id) === min(col(id)).over(w))
      .filter(col("__keep"))
      .drop("__fp", "__keep")
  }

  /** Fixed-size overlapping context windows: one output row per chunk
    * with `chunk_idx`, `chunk_text`, `chunk_tokens` appended. Pure
    * map-side generation.
    */
  def chunked(df: DataFrame, text: String = "text",
      chunkTokens: Int = Pipeline.ChunkTokens,
      stride: Int = Pipeline.ChunkStride): DataFrame = {
    val sliceOf = (start: Column) =>
      slice(col("__t"), start * stride + 1, lit(chunkTokens))
    df.withColumn("__t", tokens(col(text)))
      .filter(size(col("__t")) > 0)
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        expr(s"(size(__t) + ${stride - 1}) DIV $stride") - 1L)))
      .withColumn("chunk_text", concat_ws(" ", sliceOf(col("chunk_idx"))))
      .withColumn("chunk_tokens", size(sliceOf(col("chunk_idx"))))
      .drop("__t")
  }

  /** MinHash signatures (`array<bigint>`, 64 rows) in `outCol` for docs
    * with ≥ 3 tokens. Map-side; feed to [[nearDupPairs]] or bucket the
    * band slices yourself.
    */
  def minhashSigned(df: DataFrame, text: String = "text",
      outCol: String = "minhash_sig"): DataFrame =
    df.withColumn("__sh", WordShinglesExpr.wordShinglesNative(col(text), 3))
      .filter(size(col("__sh")) > 0)
      .withColumn(outCol, MinHashSig.minhashSig(col("__sh")))
      .drop("__sh")

  /** Banded-LSH near-dup candidate pairs `(a_id, b_id, est_jaccard)`
    * with signature-estimated Jaccard ≥ `minJaccard`. One shuffle on
    * the band keys; the quadratic pair space is never formed.
    */
  def nearDupPairs(df: DataFrame, id: String = "doc_id",
      text: String = "text", minJaccard: Double = 0.3): DataFrame = {
    import graft.operators.Dedup.{Bands, RowsPerBand}
    val sigs = minhashSigned(df.select(col(id).as("doc_id"), col(text)), text)
      .select(col("doc_id"), col("minhash_sig").as("sig"))
    val keyCols = (0 until RowsPerBand).map(i =>
      element_at(col("sig"), col("band") * RowsPerBand + i + 1).as(s"k$i"))
    val bands = sigs.select(
      col("doc_id"),
      explode(sequence(lit(0), lit(Bands - 1))).as("band"),
      col("sig"))
      .select(col("doc_id") +: col("band") +: keyCols: _*)
    val joinCond = col("a.band") === col("b.band") &&
      (0 until RowsPerBand).map(i =>
        col(s"a.k$i") === col(s"b.k$i")).reduce(_ && _) &&
      col("a.doc_id") < col("b.doc_id")
    bands.as("a").join(bands.as("b"), joinCond)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
      .join(sigs.select(col("doc_id").as("a_id"), col("sig").as("sig_a")), "a_id")
      .join(sigs.select(col("doc_id").as("b_id"), col("sig").as("sig_b")), "b_id")
      .select(col("a_id"), col("b_id"),
        (MinHashSig.sigOverlap(col("sig_a"), col("sig_b"))
          .cast(DoubleType) / MinHashSig.NumHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= minJaccard)
  }

  // ---------------------------------------------------------- embeddings

  /** Exact cosine top-k neighbors of each query vector: queries are
    * broadcast, the corpus never shuffles. Output `(q_id, rank, c_id,
    * cosine)`.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      id: String = "vec_id", vec: String = "embedding"): DataFrame = {
    val q = queries.select(col(id).as("q_id"), col(vec).as("__qv"),
      VectorExpressions.l2NormF(col(vec)).as("__qn"))
    val c = corpus.select(col(id).as("c_id"), col(vec).as("__cv"),
      VectorExpressions.l2NormF(col(vec)).as("__cn"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("c_id"))
    c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        (VectorExpressions.dotF(col("__qv"), col("__cv")) /
          (col("__qn") * col("__cn"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id"), col("cosine"))
  }

  /** Fluent syntax: `docs.chunked().qualityScored()` etc. */
  object implicits {
    implicit class CorpusOps(private val df: DataFrame) {
      def normalized(): DataFrame = Corpus.normalized(df)
      def qualityScored(): DataFrame = Corpus.qualityScored(df)
      def fingerprinted(): DataFrame = Corpus.fingerprinted(df)
      def exactDeduped(): DataFrame = Corpus.exactDeduped(df)
      def chunked(): DataFrame = Corpus.chunked(df)
      def minhashSigned(): DataFrame = Corpus.minhashSigned(df)
      def nearDupPairs(minJaccard: Double = 0.3): DataFrame =
        Corpus.nearDupPairs(df, minJaccard = minJaccard)
    }
  }
}
