package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Tables

/** Round-15 cache-parity pins: every session-cached relation added
  * this round must equal its inline build ROW FOR ROW — a cache
  * builder drifting from the frame-parametric form would silently
  * change gated results (the oracle gate would catch it a round
  * later; this pins it at the unit level, next to the change).
  */
class CacheParitySpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("cachedTokRel equals the inline tokenized corpus, one row per doc") {
    val docs = Tables.documents(spark, sf)
    val inline = docs.select(col("doc_id"), col("lang"),
      graft.functions.tokens(col("text")).as("t"))
    val cached = TextAnalysis.cachedTokRel(spark, sf)
    assert(cached.count() == docs.count(), "one row per document")
    assert(rows(cached) == rows(inline))
  }

  test("cachedWinRel equals the inline window-hash relation") {
    val inline = Tables.documents(spark, sf)
      .select(col("doc_id"),
        posexplode(graft.functions.WordShingleHashesExpr
          .wordShingleHashesNative(col("text"), Dedup2.SpanWindow))
          .as(Seq("pos0", "h")))
      .select(col("doc_id"),
        (col("pos0") + 1).cast("long").as("pos"), col("h"))
    assert(rows(Dedup2.cachedWinRel(spark, sf)) == rows(inline))
  }

  test("cachedQaKept equals the exposed build relation and keptVecIds' id set") {
    val docs = Tables.documents(spark, sf)
    val cached = Pipeline.cachedQaKept(spark, sf)
    assert(rows(cached) == rows(Pipeline.qaKeptBuildRel(docs)))
    val cachedIds = cached.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val inlineIds = Pipeline.keptVecIds(docs).collect()
      .map(_.getLong(0)).toSet
    assert(cachedIds == inlineIds,
      "the struct-min survivor ids must equal the min-per-fp ids")
  }
}
