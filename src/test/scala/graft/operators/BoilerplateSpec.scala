package graft.operators

import graft.SparkTestBase

/** Behavior of the C4-style boilerplate scorer on planted templates. */
class BoilerplateSpec extends SparkTestBase {
  import spark.implicits._

  private val phrase = "alpha beta gamma delta epsilon"

  test("a phrase in >= BoilerMinDocs docs marks exactly its positions") {
    val docs = Seq(
      (1L, "s1", s"a1 a2 $phrase a3 a4"),
      (2L, "s1", s"b1 $phrase b2 b3"),
      (3L, "s2", s"c1 c2 c3 $phrase"),
      // phrase twice in one doc: both positions count, doc-frequency once
      (4L, "s2", s"$phrase d1 $phrase"),
      (5L, "s3", "u1 u2 u3 u4 u5 u6 u7 u8"),
      // pair-only phrase stays below the threshold
      (6L, "s3", "p q r s t e1 e2 e3"),
      (7L, "s3", "f1 p q r s t f2"),
      // too short for a single shingle
      (8L, "s3", "x y z"),
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.boilerplateScored(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap

    // doc 1: 9 tokens -> 5 positions, 1 boiler
    assert(got(1L) == ((5L, 1L, Some(0.2))))
    assert(got(2L) == ((4L, 1L, Some(0.25))))
    assert(got(3L) == ((4L, 1L, Some(0.25))))
    // doc 4: 11 tokens -> 7 positions, the phrase at both ends
    assert(got(4L) == ((7L, 2L, Some(2.0 / 7.0))))
    assert(got(5L)._2 == 0L)
    // df=2 < BoilerMinDocs: not boilerplate
    assert(got(6L)._2 == 0L && got(7L)._2 == 0L)
    // short doc survives with zero positions and a null ratio
    assert(got(8L) == ((0L, 0L, None)))
  }

  test("a planted mega-template collapses in partial aggregation, not a window") {
    // 10^4 docs of pure template: every position of every doc is boiler
    val n = 10000
    val docs = (1 to n).map(i => (i.toLong, "s", s"$phrase $phrase"))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.boilerplateScored(docs)
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(!p.contains("Window"), "boilerplate scoring must not use a window:\n" + p)
    assert(p.contains("partial_count"), "doc-frequency must partial-aggregate:\n" + p)
    val rows = out.collect()
    assert(rows.length == n)
    assert(rows.forall(_.getDouble(4) == 1.0))
  }
}
