package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.TextAnalysis
import graft.sources.Tables

/** Ladder probe for the batched BPE trainers (SCALING.md's
  * amortized-per-merge rows): trains `n` merges over
  * `SPARK_GRAFT_SF_DIR`'s documents at each given batch size and
  * prints merges, Spark rounds, wall seconds, and ms/merge.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.BpeProbe 500 1 64"
  *
  * Batch size 1 is exact sequential greedy (the r9 posture: one driver
  * round per merge); larger batches run [[TextAnalysis.bpeMergesDisjoint]],
  * the standard skip-conflicts batching. The `exact` pseudo-batch size
  * runs [[TextAnalysis.bpeMerges]] (prefix-exact batching).
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bpe-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = args.headOption.map(_.toInt).getOrElse(500)
    val batches = args.drop(1).toSeq match {
      case Nil => Seq("1", "64")
      case bs => bs
    }
    val docs = Tables.documents(spark, sfDir).localCheckpoint()
    println(s"corpus $sfDir docs=${docs.count()}")
    // the first arm's inventory is the drift reference (run batch 1 or
    // `exact` first to compare the approximation against exact greedy)
    var ref: Option[Set[String]] = None
    batches.foreach { b =>
      val t0 = System.nanoTime()
      // batch args: "1", "64", "exact", or "64@0.25" (batch@qualityFrac)
      val (merges, rounds) =
        if (b == "exact")
          TextAnalysis.bpeMergesInstrumented(docs, n, exact = true,
            TextAnalysis.BpeMaxMergesPerRound)
        else b.split("@") match {
          case Array(m, f) => TextAnalysis.bpeMergesInstrumented(
            docs, n, exact = false, m.toInt, f.toDouble)
          case _ => TextAnalysis.bpeMergesInstrumented(
            docs, n, exact = false, b.toInt)
        }
      val table = merges.collect()
      val got = table.length
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"batch=$b%-6s merges=$got%5d rounds=$rounds%5d " +
        f"wall=$sec%8.2fs per-merge=${sec * 1000 / got}%8.1fms")
      val inv = table.map(_.getString(3)).toSet
      ref match {
        case None => ref = Some(inv)
        case Some(r) =>
          println(f"  inventory overlap with first arm: " +
            f"${inv.intersect(r).size * 100.0 / r.size}%5.1f%%")
      }
      // SPARK_GRAFT_BPE_APPLY=1 also times tokenizing the corpus under
      // the learned table (the chunked-vocabulary apply path)
      if (sys.env.get("SPARK_GRAFT_BPE_APPLY").contains("1")) {
        val ms = table.map(r => (r.getString(1), r.getString(2))).toSeq
        val t1 = System.nanoTime()
        val toks = TextAnalysis.bpeAppliedWith(docs, ms)
          .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens"))
          .collect()(0).getLong(0)
        println(f"  apply under $got%5d merges: " +
          f"${(System.nanoTime() - t1) / 1e9}%8.2fs  " +
          f"corpus tokens=$toks%d")
      }
    }
    spark.stop()
  }
}
