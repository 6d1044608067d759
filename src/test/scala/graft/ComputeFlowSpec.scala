package graft

import java.nio.file.Files

import graft.operators.MapReduce
import graft.sources.{Storage, Tables}

/** End-to-end mirror of the reference's `compute` lifecycle
  * (SURVEY.md §3.1): put input to the DFS → dispatch the job → map →
  * shuffle → reduce → stream results back → re-put them to the DFS
  * (`dfs/client/client.go:686-690,755-758`). Here the whole trace is
  * one Catalyst plan plus two storage verbs.
  */
class ComputeFlowSpec extends SparkTestBase {
  import spark.implicits._

  test("put → compute(wordcount) → save results → read back") {
    val st = new Storage(spark, Files.createTempDirectory("graft-dfs-").toString)

    // put: upload the input file (text layout, S3)
    val input = Tables.documents(spark, sf0001).select("text").as[String]
    st.putText("corpus.txt", input)

    // compute: run the job against the STORED copy, not the original
    val results = MapReduce.run(st.getText("corpus.txt"), MapReduce.wordCountJob)

    // sink: results re-uploaded in the reference's KV-text format (S9)
    st.putText("corpus_counts.txt", MapReduce.toKvLines(results))

    // verify: parse the stored results; equal to a direct computation
    val roundTrip = MapReduce.fromKvLines(st.getText("corpus_counts.txt"))
      .collect().toMap
    val direct = MapReduce.run(input, MapReduce.wordCountJob).collect().toMap
    assert(roundTrip == direct)
    assert(roundTrip.nonEmpty)

    // storage verbs over the artifacts
    assert(st.ls().map(_.name) == Seq("corpus.txt", "corpus_counts.txt"))
    assert(st.info().storedFiles == 2)
    assert(st.delete("corpus.txt"))
    assert(st.ls().map(_.name) == Seq("corpus_counts.txt"))
  }

  test("question-percentage job over stored dialog-format lines") {
    val st = new Storage(spark, Files.createTempDirectory("graft-dfs-").toString)
    val dialog = Seq(
      "L1 +++$+++ u0 +++$+++ m0 +++$+++ BIANCA +++$+++ Can we make this quick?",
      "L2 +++$+++ u0 +++$+++ m0 +++$+++ BIANCA +++$+++ They do not!",
      "L3 +++$+++ u2 +++$+++ m0 +++$+++ CAMERON +++$+++ Forget it.").toDS()
    st.putText("dialogs.txt", dialog)
    val out = MapReduce.run(st.getText("dialogs.txt"),
      MapReduce.questionPercentageJob).collect().toMap
    assert(out == Map("u0 BIANCA" -> "50%", "u2 CAMERON" -> "0%"))
  }
}
