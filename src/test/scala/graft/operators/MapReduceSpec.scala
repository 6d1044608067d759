package graft.operators

import graft.SparkTestBase

/** Golden tests for the two reference jobs (FIXTURES.md §A) with
  * byte-exact reference semantics: `strings.Fields` tokenization,
  * floor integer division, '%' suffix, ` <--> ` codec.
  */
class MapReduceSpec extends SparkTestBase {
  import spark.implicits._

  test("wordcount matches reference semantics on the A1 fixture") {
    val lines = Seq(
      "the quick brown fox",
      "the  quick\tbrown fox jumps",
      "fox?",
      "",
      "end end end").toDS()
    val got = MapReduce.run(lines, MapReduce.wordCountJob).collect().toMap
    val expected = Map(
      "the" -> "2", "quick" -> "2", "brown" -> "2", "fox" -> "2",
      "fox?" -> "1", "jumps" -> "1", "end" -> "3")
    assert(got == expected)
  }

  test("wordcount associative variant agrees with general runner") {
    val lines = Seq("a b a", "b c", "a").toDS()
    val general = MapReduce.run(lines, MapReduce.wordCountJob).collect().toMap
    val assoc = MapReduce
      .runAssociative[String, Int](lines,
        l => MapReduce.fields(l).map(w => (w, 1)), _ + _)
      .collect().toMap.map { case (k, v) => k -> v.toString }
    assert(assoc == general)
  }

  test("question percentage: floor division and % suffix (A2 fixture)") {
    val lines = Seq(
      "L1 +++$+++ u0 +++$+++ m0 +++$+++ BIANCA +++$+++ They do not!",
      "L2 +++$+++ u0 +++$+++ m0 +++$+++ BIANCA +++$+++ Can we make this quick?",
      "L3 +++$+++ u0 +++$+++ m0 +++$+++ BIANCA +++$+++ Well, I thought we'd start with pronunciation?",
      "L4 +++$+++ u2 +++$+++ m0 +++$+++ CAMERON +++$+++ Forget it.",
      "L5 +++$+++ u3 +++$+++ m0 +++$+++ KAT +++$+++ Really?").toDS()
    val got = MapReduce.run(lines, MapReduce.questionPercentageJob)
      .collect().toMap
    // 2 of 3 → floor(200/3) = 66, not 66.7 (dfs/questionpercentagejob.go:54)
    assert(got == Map(
      "u0 BIANCA" -> "66%", "u2 CAMERON" -> "0%", "u3 KAT" -> "100%"))
  }

  test("KV-text codec round-trips, including values containing spaces") {
    val pairs = Seq(("word", "3"), ("two words", "1"),
      ("k", "v <--> with delim")).toDS()
    val roundTripped =
      MapReduce.fromKvLines(MapReduce.toKvLines(pairs)).collect().toSeq
    // a delimiter inside the VALUE survives (split at first occurrence,
    // like the reference's index-based parse)
    assert(roundTripped.toSet == pairs.collect().toSet)
  }

  test("fromKvLines skips malformed lines instead of stopping") {
    val lines = Seq("a <--> 1", "", "x", "b <--> 2").toDS()
    assert(MapReduce.fromKvLines(lines).collect().toSet ==
      Set(("a", "1"), ("b", "2")))
  }

  test("parquet-scale wordcount query agrees with typed MR runner") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val typed = MapReduce
      .run(docs.select("text").as[String], MapReduce.wordCountJob)
      .collect().toMap
    val df = MapReduceQueries.mrWordCount(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1).toString).toMap
    assert(df == typed)
  }
}
