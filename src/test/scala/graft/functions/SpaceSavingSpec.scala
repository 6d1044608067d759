package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SpaceSavingSpec extends SparkTestBase {
  import spark.implicits._

  private def sketchOf(terms: Seq[String], k: Int, parts: Int) =
    terms.toDF("term").repartition(parts)
      .agg(SpaceSaving.topK($"term", k).as("sk"))
      .select(explode($"sk").as("e"))
      .select($"e.term", $"e.est", $"e.err")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("below capacity the sketch is exact, whatever the partitioning") {
    val terms = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(3)("c")
    for (parts <- Seq(1, 7)) {
      val sk = sketchOf(scala.util.Random.shuffle(terms), k = 8, parts)
      assert(sk == Map("a" -> ((40L, 0L)), "b" -> ((25L, 0L)),
        "c" -> ((3L, 0L))), s"parts=$parts")
    }
  }

  test("over capacity: heavy terms present with valid est/err bounds") {
    // 5 heavy terms (count 100) + 200 singleton terms, k=16:
    // n = 700, heavies are way over n/k ≈ 44
    val exact = (1 to 5).map(i => s"heavy$i" -> 100L).toMap ++
      (1 to 200).map(i => s"rare$i" -> 1L).toMap
    val stream = exact.toSeq.flatMap { case (t, c) =>
      Seq.fill(c.toInt)(t)
    }
    val sk = sketchOf(scala.util.Random.shuffle(stream), k = 16, parts = 5)
    assert(sk.size == 16)
    (1 to 5).foreach { i =>
      val t = s"heavy$i"
      assert(sk.contains(t), s"$t missing from sketch")
      val (est, err) = sk(t)
      assert(est >= 100L, s"$t est $est under-counts")
      assert(est - err <= 100L, s"$t est-err ${est - err} over-counts")
    }
    // every counter's bounds bracket its true count
    sk.foreach { case (t, (est, err)) =>
      val truth = exact.getOrElse(t, 0L)
      assert(est >= truth && est - err <= truth, s"$t: ($est, $err) vs $truth")
    }
  }

  test("merge rule: a term absent from one side inherits that side's min") {
    val a = new SpaceSavingSummary(2)
    a.add("x"); a.add("x"); a.add("y") // full: x=2, y=1, minA=1
    val b = new SpaceSavingSummary(2)
    b.add("z") // not full: minB contribution is 0
    a.mergeIn(b)
    // z absent from A (full, min 1): est = 1 + 1 = 2, err = 1 + 0 = 1
    // x absent from B (not full): est = 2 + 0 = 2, err 0
    val m = a.counters.map { case (t, arr) => t -> ((arr(0), arr(1))) }
    assert(m.size == 2)
    assert(m("x") == ((2L, 0L)))
    assert(m("z") == ((2L, 1L)))
  }

  test("the aggregate is callable from SQL with a literal capacity") {
    graft.GraftExtensions.register(spark)
    Seq("p", "p", "q").toDF("t").createOrReplaceTempView("ss_terms")
    val rows = spark.sql(
      "SELECT space_saving_topk(t, 4) AS sk FROM ss_terms")
      .select(explode($"sk").as("e")).select($"e.term", $"e.est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("p" -> 2L, "q" -> 1L))
    intercept[Exception] {
      spark.sql("SELECT space_saving_topk(t, t) FROM ss_terms").collect()
    }
  }

  test("gated ta_heavy_hitters invariants hold on the corpus") {
    val got = graft.operators.HeavyHitters.taHeavyHitters(spark, sf0001)
      .collect()
    assert(got.length == graft.operators.HeavyHitters.TopN)
    assert(got.forall(r => r.getBoolean(2) && r.getBoolean(3)))
  }
}
