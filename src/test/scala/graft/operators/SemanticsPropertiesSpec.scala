package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MinHashSig, RollingHash, SimHash, WordShinglesExpr}

/** ScalaCheck properties for the reference-semantics quirks called out
  * in SURVEY.md §5/§7: the ` <--> ` codec, `strings.Fields`
  * tokenization, Go floor division, and the hash kernels. Pure-JVM
  * (no SparkSession) — these pin the shared compute functions that the
  * Catalyst expressions and the typed jobs both delegate to.
  */
class SemanticsPropertiesSpec extends AnyFunSuite {

  /** scalatestplus isn't on the offline classpath; drive ScalaCheck
    * directly and fail the scalatest assertion on a falsified property.
    */
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(g) { a => f(a); true })
    assert(res.passed, res.status.toString)
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(ga, gb) { (a, b) => f(a, b); true })
    assert(res.passed, res.status.toString)
  }

  private val token: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val line: Gen[String] =
    Gen.listOf(Gen.oneOf(token, Gen.oneOf(" ", "\t", "  "))).map(_.mkString)

  test("fields == split-on-whitespace-drop-empties (strings.Fields semantics)") {
    forAll(line) { s =>
      assert(MapReduce.fields(s) ==
        s.split("\\s+").toIndexedSeq.filter(_.nonEmpty))
    }
  }

  test("question percentage uses Go integer floor division") {
    forAll(Gen.chooseNum(1, 10000), Gen.chooseNum(0, 10000)) { (total, qRaw) =>
      val q = qRaw % (total + 1)
      val vs = Seq.fill(q)("Q") ++ Seq.fill(total - q)("NOT Q")
      val (_, out) = MapReduce.questionPercentageJob.reduce("k", vs)
      assert(out == s"${(q * 100) / total}%")
    }
  }

  test("rolling hash is the left-fold mod recurrence and stays in range") {
    forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) { (a, b) =>
      val h = RollingHash.reference(a)
      assert(h >= 0 && h < RollingHash.Mod)
      // appending is the recurrence continued from the prefix hash
      val continued = b.foldLeft(h)((acc, c) =>
        (acc * 31 + c) % RollingHash.Mod)
      assert(RollingHash.reference(a + b) == continued)
    }
  }

  test("simhash of identical token multisets is identical regardless of spacing") {
    forAll(Gen.nonEmptyListOf(token)) { toks =>
      val single = toks.mkString(" ")
      val spaced = toks.mkString("  ")
      val tabbed = toks.mkString("\t")
      assert(SimHash.compute(single) == SimHash.compute(spaced))
      assert(SimHash.compute(single) == SimHash.compute(tabbed))
    }
  }

  test("native shingles: count, width, and adjacency") {
    forAll(Gen.listOf(token)) { toks =>
      val text = toks.mkString(" ")
      val sh = WordShinglesExpr.shingles(text, 3).map(_.toString).toSeq
      if (toks.length < 3) assert(sh.isEmpty)
      else {
        assert(sh.length == toks.length - 2)
        sh.zipWithIndex.foreach { case (s, i) =>
          assert(s == toks.slice(i, i + 3).mkString(" "))
        }
      }
    }
  }

  test("space-saving invariants hold under any stream split and merge order") {
    import graft.functions.SpaceSavingSummary
    val k = 8
    val stream: Gen[List[String]] =
      Gen.listOf(Gen.chooseNum(0, 19).map(i => s"t$i"))
    val cuts: Gen[List[Int]] = Gen.listOf(Gen.chooseNum(0, 1000))
    forAll(stream, cuts) { (s, rawCuts) =>
      val truth = s.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = s.size.toLong
      // split the stream at arbitrary points, summarize each piece,
      // left-fold-merge the summaries
      val bounds = (0 :: rawCuts.map(c => if (s.isEmpty) 0 else c % (s.size + 1)))
        .distinct.sorted :+ s.size
      val pieces = bounds.zip(bounds.tail).map { case (a, b) => s.slice(a, b) }
      val merged = pieces.map { p =>
        val sum = new SpaceSavingSummary(k)
        p.foreach(sum.add)
        sum
      }.reduceLeft(_.mergeIn(_))
      assert(merged.counters.size <= k)
      merged.counters.foreach { case (t, arr) =>
        val c = truth.getOrElse(t, 0L)
        assert(arr(0) >= c, s"$t est ${arr(0)} < true $c")
        assert(arr(0) - arr(1) <= c, s"$t est-err ${arr(0) - arr(1)} > true $c")
      }
      truth.foreach { case (t, c) =>
        if (c * k > n) assert(merged.counters.contains(t),
          s"$t with count $c > n/k=${n.toDouble / k} missing")
      }
    }
  }

  test("minhash signature is permutation-family-deterministic and monotone under union") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def sig(ss: Seq[String]) = MinHashSig.signature(
      new GenericArrayData(ss.map(UTF8String.fromString))).toVector
    forAll(Gen.nonEmptyListOf(token), Gen.nonEmptyListOf(token)) { (a, b) =>
      val sa = sig(a)
      assert(sa == sig(a)) // deterministic
      val sUnion = sig(a ++ b)
      // each component of the union's signature is the min of the parts'
      assert(sUnion == sa.zip(sig(b)).map { case (x, y) => math.min(x, y) })
    }
  }
}
