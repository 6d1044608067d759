package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HyperplaneBuckets, VectorExpressions}
import graft.operators.Similarity

/** Streaming similarity serving: a stream of query vectors answered
  * against a STATIC corpus — the online half of the similarity family
  * (the batch half is [[graft.operators.Similarity]]).
  */
object VecStreams {

  val ServeWindowSec = 600L

  /** Streaming ANN over a static corpus via hyperplane LSH — the
    * serving-path topology, chosen because every stage before the one
    * aggregation is STATELESS:
    *
    *  1. each arriving query explodes to its `(table, bucket)` keys in
    *     the same codegen'd one-pass kernel the batch `sim_ann_lsh`
    *     uses — probe selection is map-side (unlike IVF, whose probe
    *     ranking needs a per-query argmax — that is why the streaming
    *     arm is LSH);
    *  2. a stream-static equi-join on `(table, bucket)` attaches the
    *     bucketed corpus candidates (stateless — the static side is
    *     just a relation; at scale it is the bucket-partitioned index);
    *  3. exact cosine per candidate, map-side;
    *  4. ONE watermarked tumbling-window aggregation per (window,
    *     query) collects the candidate structs and finishes IN ARRAY
    *     SPACE: `array_distinct` dedups the multi-table collisions,
    *     a comparator `array_sort` orders by (cosine desc, c_id), and
    *     `slice` keeps k — so multi-table dedup + top-k, which in batch
    *     take a dropDuplicates plus a rank window, cost a single
    *     stateful operator whose state is bounded by (windows × queries
    *     × candidates), evicted by the watermark.
    *
    * Works identically on a batch frame (watermark no-ops, the window
    * still groups), which is how the spec oracles it against the gated
    * `sim_ann_lsh`. Output: `(win_start_s, q_id, topk_ids)` with
    * `topk_ids` the comma-joined neighbor ids in rank order.
    *
    * LATE QUERIES: Spark drops behind-watermark rows at the
    * aggregation only best-effort (measured on 4.1: a late query is
    * aggregated and emits as its own late window row). Because
    * candidate generation is stateless and watermark-independent, a
    * late query either vanishes or receives exactly its complete
    * answer — never a partial candidate set (pinned in
    * `VecStreamsSpec`). Downstream consumers keyed on (window, q_id)
    * should upsert, not append-count.
    */
  def annServe(queries: DataFrame, corpus: DataFrame,
      k: Int = Similarity.TopK): DataFrame = {
    val c = corpus.select(col("vec_id").as("c_id"),
      col("embedding").as("cv"),
      VectorExpressions.l2NormF(col("embedding")).as("cn"),
      posexplode(HyperplaneBuckets.hyperplaneBuckets(col("embedding")))
        .as(Seq("table", "bucket")))
    val qb = queries.withWatermark("ts", "1 hour")
      .select(col("vec_id").as("q_id"), col("ts"),
        col("embedding").as("qv"),
        VectorExpressions.l2NormF(col("embedding")).as("qn"),
        posexplode(HyperplaneBuckets.hyperplaneBuckets(col("embedding")))
          .as(Seq("table", "bucket")))
    val scored = qb.join(c, Seq("table", "bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("ts"), col("c_id"),
        (VectorExpressions.dotF(col("qv"), col("cv")) /
          (col("qn") * col("cn"))).as("cosine"))
    val byScore = (a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column) =>
      when(a.getField("cosine") > b.getField("cosine"), -1)
        .when(a.getField("cosine") < b.getField("cosine"), 1)
        .otherwise(signum(a.getField("c_id") - b.getField("c_id"))
          .cast("int"))
    scored
      .groupBy(window(col("ts"), s"$ServeWindowSec seconds"), col("q_id"))
      .agg(collect_list(struct(col("c_id"), col("cosine"))).as("parts"))
      .select(
        unix_timestamp(col("window.start")).as("win_start_s"),
        col("q_id"),
        concat_ws(",", transform(
          slice(array_sort(array_distinct(col("parts")), byScore), 1, k),
          p => p.getField("c_id").cast("string"))).as("topk_ids"))
  }
}
