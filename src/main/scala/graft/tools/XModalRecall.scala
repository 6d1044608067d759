package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Multimodal, Similarity}
import graft.sources.Tables

/** Cross-modal pair-mining recall ladder — the SCALING.md companion to
  * `sim_recall` for `mm_pair_mine`: recall of the served-IVF pair
  * miner against brute-force exact cosine over the same modality split
  * and quality floor, plus both arms' wall times. Recall here is pair
  * recall — |served ∩ brute| / |brute| over (img, text) pairs, with
  * the floor applied to BOTH arms after ranking so the two sets answer
  * the same question.
  *
  *   sbt "runMain graft.tools.XModalRecall /tmp/graft10x"
  */
object XModalRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // warm the index caches once so the served timing is the serve,
    // and report the cold (build+serve) time separately
    val (_, tCold) = time(Multimodal.mmPairMine(spark, dir)
      .write.format("noop").mode("overwrite").save())
    val (mined, tServe) = time(Multimodal.mmPairMine(spark, dir)
      .select(col("img_id"), col("text_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    val e = Tables.embeddings(spark, dir)
    val images = e.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id"), col("embedding"))
    val texts = e.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id"), col("embedding"))
    val (brute, tBrute) = time(
      Similarity.cosineTopK(texts, images, Multimodal.XModalTopK,
          excludeSelfIds = false)
        .filter(col("cosine") >= lit(Multimodal.XModalMinCos.toDouble))
        .select(col("q_id"), col("c_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    val recall =
      if (brute.isEmpty) 1.0
      else mined.intersect(brute).size.toDouble / brute.size
    println(f"[xmodal] dir=$dir n_served=${mined.size} n_brute=${brute.size} " +
      f"recall=$recall%.4f cold=$tCold%.2fs serve=$tServe%.2fs brute=$tBrute%.2fs")
    // The recall knob: the gate serves at the oracle-pinned
    // NumProbes=2; production scales probes with the cell count
    // (√n cells at a fixed probe count shrinks the probed FRACTION as
    // the corpus grows — the standard IVF recall law). Re-serve the
    // identical plan at wider probe sets to show where the knob takes
    // recall and what it costs.
    import org.apache.spark.sql.expressions.Window
    val cent = Similarity.cachedIvfCentroids(spark, dir)
    val textLists = Similarity.cachedIvfLists(spark, dir)
      .filter(col("c_id") % 3 =!= 0)
    for (p <- Seq(4, 8, 16)) {
      val (got, t) = time {
        val probes = Similarity.kernelProbeCells(images, cent, p,
          "img_id", "qv", "qn")
        val w = Window.partitionBy(col("img_id"))
          .orderBy(col("cosine").desc, col("text_id"))
        textLists.join(probes, Seq("cell"))
          .select(col("img_id"), col("c_id").as("text_id"),
            (graft.functions.VectorExpressions.dotF(col("qv"), col("cv_c")) /
              (col("qn") * col("cn_c"))).as("cosine"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= Multimodal.XModalTopK &&
            col("cosine") >= lit(Multimodal.XModalMinCos.toDouble))
          .select(col("img_id"), col("text_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val rc = if (brute.isEmpty) 1.0
        else got.intersect(brute).size.toDouble / brute.size
      println(f"[xmodal]   probes=$p%-2d recall=$rc%.4f serve=$t%.2fs")
    }
    spark.stop()
  }
}
