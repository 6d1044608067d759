package graft.operators

import graft.SparkTestBase

class LshPerfSpec extends SparkTestBase {
  test("time minhash LSH stages at sf0.1") {
    val d = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIMING $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.sources.Tables.documents(spark, d)
    time("docs.count")(docs.count())
    val sigs = Dedup.minhashSignatures(docs)
    time("sigs.count")(sigs.count())
    time("sigs.write.noop")(
      sigs.write.format("noop").mode("overwrite").save())
    val t0 = System.nanoTime()
    time("full ddMinhashLsh")(
      Dedup.ddMinhashLsh(spark, d).write.format("noop").mode("overwrite").save())
    val sec = (System.nanoTime() - t0) / 1e9
    // perf canary: the HOF formulations regressed this to 48 s twice;
    // native shingling + signatures keep it near-interactive
    assert(sec < 30, f"minhash LSH took $sec%.1f s at sf0.1 — perf regression")
  }
}
