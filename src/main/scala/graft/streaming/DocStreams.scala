package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{MinHashSig, WordShinglesExpr}

/** Streaming operators over a document stream (`doc_id`, `text`, `ts`)
  * — the continuous-ingestion face of the batch dedup family in
  * [[graft.operators.Dedup]].
  *
  * The reference has no streaming at all (SURVEY.md §2e); this module
  * extends the corpus pipeline to arriving data: new documents dedup
  * against everything seen within the event-time horizon, with state
  * bounded by the watermark, not the stream length.
  */
object DocStreams {

  /** Rows of the dedup band: the first `BandRows` rows of the 64-row
    * MinHash signature form the bucket key.
    */
  val BandRows = 4

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts", TimestampType)))

  private val bandCols = (0 until BandRows).map(i => s"__b$i")

  /** Streaming near-dup dedup via one MinHash LSH band: a document is
    * DROPPED when a document with the identical band signature arrived
    * within the watermark horizon — one stateful operator
    * (`dropDuplicatesWithinWatermark` on the band columns), state = one
    * entry per distinct in-horizon band key, evicted as the watermark
    * passes.
    *
    * Semantics: exact duplicates always share the band; a near-dup pair
    * with shingle-Jaccard j collides with probability j^r (r=4: 0.66 at
    * j=0.9, 0.96 at j=0.99). The batch 16-band union (`dd_minhash_lsh`)
    * gets ~0.99 at j=0.8 but needs a per-band vote — a second stateful
    * aggregation downstream of the first, which Structured Streaming
    * does not admit in one query; the single-band form trades recall
    * for a plan with ONE bounded state store. Documents too short to
    * shingle (< 3 tokens) bypass the dedup unfiltered (their degenerate
    * signature would otherwise collapse them all into one bucket).
    *
    * Works identically on a batch frame (plain `dropDuplicates`), which
    * is how the spec oracles it.
    */
  def streamingNearDup(docs: DataFrame): DataFrame = {
    val withSh = docs
      .withWatermark("ts", "1 hour")
      .withColumn("__sh",
        WordShinglesExpr.wordShinglesNative(col("text"), 3))
    val shingled = withSh.filter(size(col("__sh")) > 0)
    val sigCols = {
      val sig = MinHashSig.minhashSig(col("__sh"))
      bandCols.zipWithIndex.map { case (name, i) =>
        element_at(sig, i + 1).as(name)
      }
    }
    val keyed = shingled.select(
      col("doc_id") +: col("text") +: col("ts") +: sigCols: _*)
    val deduped =
      if (keyed.isStreaming)
        keyed.dropDuplicatesWithinWatermark(bandCols)
      else keyed.dropDuplicates(bandCols)
    deduped.select(col("doc_id"), col("text"), col("ts"))
      .unionByName(
        withSh.filter(size(col("__sh")) === 0)
          .select(col("doc_id"), col("text"), col("ts")))
  }
}
