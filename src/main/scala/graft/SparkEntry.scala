package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AsOfJoin, CorpusOps, Dedup, Dedup2, EventAnalytics, GraphRank, HeavyHitters, MapReduceQueries, Multimodal, Pii, Pipeline, Relational, Relational2, Relational3, Relational4, Relational5, Similarity, TextAnalysis}
import graft.streaming.{DocStreams, EventStreams, VecStreams}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every `queries` key with a
  * matching `oracleSql` key is hash-checked against DuckDB by the driver at
  * sf0.01; keys without oracle SQL get a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The end-to-end corpus pipeline exercises the engine's
    * breadth in one plan: quality scoring, fingerprint dedup,
    * context-window chunking, and grouped aggregation.
    */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.pipeE2e(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Relational2.queries ++ Relational3.queries ++
      Relational4.queries ++ Relational5.queries ++
      MapReduceQueries.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Dedup2.queries ++ Similarity.queries ++ EventStreams.queries ++
      Multimodal.queries ++ AsOfJoin.queries ++ Pipeline.queries ++
      CorpusOps.queries ++ Pii.queries ++ HeavyHitters.queries ++
      EventAnalytics.queries ++ GraphRank.queries ++
      VecStreams.queries ++ DocStreams.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Relational2.oracles ++ Relational3.oracles ++
      Relational4.oracles ++ Relational5.oracles ++
      MapReduceQueries.oracles ++ TextAnalysis.oracles ++
      Dedup.oracles ++ Dedup2.oracles ++ Similarity.oracles ++ EventStreams.oracles ++
      Multimodal.oracles ++ AsOfJoin.oracles ++ Pipeline.oracles ++
      CorpusOps.oracles ++ Pii.oracles ++ HeavyHitters.oracles ++
      EventAnalytics.oracles ++ GraphRank.oracles ++
      VecStreams.oracles ++ DocStreams.oracles
}
