package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions._
import graft.sources.Tables._

/** Training-data assembly operators over `documents`: fixed-window
  * chunking (context-window pieces), deterministic sequence packing
  * (concat-then-split token offsets), and the composed end-to-end
  * corpus pipeline (quality filter → exact dedup → chunk → per-language
  * stats).
  *
  * Scale posture: chunking is pure per-row generation (explode of an
  * integer range — no shuffle at all); packing is windowed WITHIN
  * doc-id shards, so the cumulative sums parallelize per shard instead
  * of the single-task global-window trap; the pipeline composes
  * map-side stages plus one fingerprint shuffle and one final tiny
  * aggregation.
  */
object Pipeline {

  val ChunkTokens = 128 // context-window size, in whitespace tokens
  val ChunkStride = 96  // stride between window starts (32-token overlap)
  val PackBudget = 256  // tokens per packed training sequence
  val ShardDocs = 100L  // docs per packing shard
  // quality cut for the e2e pipeline: the corpus is short synthetic docs
  // (10-99 tokens, quality scores 0.02-0.30 with mean ~0.17), so 0.15
  // keeps roughly the better half — a real filter, not a no-op
  val QualityMin = 0.15

  private def toks = tokens(col("text"))

  // -- shared chunk-window pieces (the ONE definition of the geometry,
  //    used by taChunk, pipeE2e AND graft.api.Corpus.chunked on both
  //    engine sides) --------------------------------------------------
  /** Chunk indices 0..ceil(n/stride)-1 over a token-array column named
    * `t` (requires `size(t) > 0` upstream).
    */
  def chunkIdxCol(t: String, stride: Int = ChunkStride): org.apache.spark.sql.Column =
    explode(sequence(lit(0L),
      expr(s"(size($t) + ${stride - 1}) DIV $stride") - 1L))
  /** The tokens of chunk `start` of token-array column `t`. */
  def chunkSliceCol(t: String, start: org.apache.spark.sql.Column,
      chunkTokens: Int = ChunkTokens,
      stride: Int = ChunkStride): org.apache.spark.sql.Column =
    slice(col(t), start * stride + 1, lit(chunkTokens))
  private def chunkIdx = chunkIdxCol("t")
  private def chunkSlice(start: org.apache.spark.sql.Column) =
    chunkSliceCol("t", start)
  private val chunkIdxSql =
    s"unnest(range((len(t) + ${ChunkStride - 1}) // $ChunkStride))"
  private def chunkSliceSql(idx: String) =
    s"t[$idx * $ChunkStride + 1 : $idx * $ChunkStride + $ChunkTokens]"

  /** Fixed-size overlapping token windows per document: chunk `i`
    * covers tokens `[i*stride, i*stride + ChunkTokens)`; starts are
    * every `ChunkStride` tokens while inside the document. Pure
    * map-side generation — the 100 TB plan is scan → explode, no
    * exchange before the presentation sort.
    */
  def taChunk(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) > 0)
      .withColumn("chunk_idx", chunkIdx)
      .select(col("doc_id"), col("chunk_idx"),
        concat_ws(" ", chunkSlice(col("chunk_idx"))).as("chunk_text"),
        size(chunkSlice(col("chunk_idx"))).as("chunk_tokens"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  val taChunkSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, t, $chunkIdxSql AS chunk_idx
       |  FROM toks WHERE len(t) > 0)
       |SELECT doc_id, chunk_idx,
       |  array_to_string(${chunkSliceSql("chunk_idx")}, ' ') AS chunk_text,
       |  CAST(len(${chunkSliceSql("chunk_idx")}) AS INTEGER) AS chunk_tokens
       |FROM c
       |ORDER BY doc_id, chunk_idx""".stripMargin

  /** Deterministic sequence packing, concat-then-split form: within
    * each doc-id shard, documents concatenate in id order and the token
    * stream is cut every `PackBudget` tokens; a document's pack is the
    * budget-quotient of its start offset. Per-shard windows keep the
    * cumulative sum parallel (a GLOBAL order-by window would funnel the
    * whole corpus through one task); shards are the natural unit
    * training shards already impose.
    */
  def taPack(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    documents(s, d)
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
        expr(s"doc_id DIV $ShardDocs").as("shard"))
      .withColumn("start_off",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("start_off"),
        expr(s"start_off DIV $PackBudget").as("pack_id"),
        (col("n_tokens") > 0 &&
          expr(s"(start_off + n_tokens - 1) DIV $PackBudget") =!=
            expr(s"start_off DIV $PackBudget")).as("crosses_boundary"))
      .orderBy(col("doc_id"))
  }

  val taPackSql: String =
    s"""WITH n AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
       |    doc_id // $ShardDocs AS shard
       |  FROM documents),
       |o AS (
       |  SELECT doc_id, shard, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
       |  FROM n)
       |SELECT doc_id, shard, n_tokens, start_off,
       |  start_off // $PackBudget AS pack_id,
       |  n_tokens > 0 AND
       |    (start_off + n_tokens - 1) // $PackBudget <> start_off // $PackBudget
       |    AS crosses_boundary
       |FROM o
       |ORDER BY doc_id""".stripMargin

  /** End-to-end corpus assembly: heuristic quality filter (the
    * [[TextAnalysis.taQuality]] score), exact prefix-fingerprint dedup
    * (keep the lowest doc_id per 10-token-prefix md5), fixed-window
    * chunking, then per-language corpus stats. One composed plan:
    * map-side filters and generation, one shuffle on the fingerprint,
    * one tiny final aggregate.
    */
  def pipeE2e(s: SparkSession, d: String): DataFrame = {
    val wFp = Window.partitionBy(col("fp"))
    val kept = documents(s, d)
      .filter(size(toks) > 0 &&
        TextAnalysis.qualityScore(toks) >= QualityMin)
      .select(col("doc_id"), col("lang"), toks.as("t"),
        md5(concat_ws(" ", slice(toks, 1, 10))).as("fp"))
      .withColumn("keep", col("doc_id") === min(col("doc_id")).over(wFp))
      .filter(col("keep"))
    kept
      .withColumn("chunk_idx", chunkIdx)
      .select(col("doc_id"), col("lang"),
        size(chunkSlice(col("chunk_idx"))).as("chunk_tokens"))
      .groupBy(col("lang"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("chunk_tokens")).as("sum_chunk_tokens"))
      .orderBy(col("lang"))
  }

  val pipeE2eSql: String = {
    val toksSql = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"
    s"""WITH toks AS (
       |  SELECT doc_id, lang, $toksSql AS t FROM documents),
       |q AS (
       |  SELECT doc_id, lang, t,
       |    md5(array_to_string(t[1:10], ' ')) AS fp
       |  FROM toks
       |  WHERE len(t) > 0 AND
       |    ${TextAnalysis.qualityScoreSql("t")} >= $QualityMin),
       |kept AS (
       |  SELECT doc_id, lang, t
       |  FROM (SELECT doc_id, lang, t,
       |          doc_id = MIN(doc_id) OVER (PARTITION BY fp) AS keep
       |        FROM q) k
       |  WHERE keep),
       |chunks AS (
       |  SELECT doc_id, lang,
       |    len(${chunkSliceSql("ci")}) AS chunk_tokens
       |  FROM (SELECT doc_id, lang, t, $chunkIdxSql AS ci
       |        FROM kept) g)
       |SELECT lang,
       |  COUNT(DISTINCT doc_id) AS n_docs,
       |  COUNT(*) AS n_chunks,
       |  CAST(SUM(chunk_tokens) AS BIGINT) AS sum_chunk_tokens
       |FROM chunks
       |GROUP BY lang
       |ORDER BY lang""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_chunk" -> taChunk _,
    "ta_pack"  -> taPack _,
    "pipe_e2e" -> pipeE2e _,
  )

  val oracles: Map[String, String] = Map(
    "ta_chunk" -> taChunkSql,
    "ta_pack"  -> taPackSql,
    "pipe_e2e" -> pipeE2eSql,
  )
}
