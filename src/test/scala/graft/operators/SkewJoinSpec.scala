package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.{Storage, Tables}

class SkewJoinSpec extends SparkTestBase {

  test("salted join returns exactly the plain join's rows") {
    val l = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey", "l_quantity")
    val p = Tables.part(spark, sf0001).select("p_partkey", "p_brand")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = l.join(p, "l_partkey")
      .groupBy("p_brand").agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = SkewJoin.salted(l, p, "l_partkey", salts = 8)
      .groupBy("p_brand").agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("key histogram surfaces the hottest keys in order") {
    val h = SkewJoin.keyHistogram(
      Tables.lineitem(spark, sf0001), col("l_returnflag"), 3).collect()
    assert(h.length == 3)
    assert(h.map(_.getLong(1)).toSeq == h.map(_.getLong(1)).sorted.reverse.toSeq)
  }

  test("skew report brackets the exact shares and flags the hot key") {
    import spark.implicits._
    // 60% one hot key (disjoint from the thin range), the rest spread
    val rows = Seq.fill(600)(1000L) ++ (0L until 400L)
    val df = scala.util.Random.shuffle(rows).toDF("k").repartition(5)
    val rep = SkewJoin.skewReport(df, Seq("k"), k = 16)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val (est, err, share) = rep("1000")
    assert(est >= 600L && est - err <= 600L)
    assert(share == est.toDouble / 1000.0)
    assert(rep.values.forall(_._1 >= 1L))
    // hot key dominates the report
    assert(rep.maxBy(_._2._1)._1 == "1000")
    // exact counts bracketed for every reported key
    rep.foreach { case (key, (e, er, _)) =>
      val truth = rows.count(_.toString == key).toLong
      assert(e >= truth && e - er <= truth, s"key $key")
    }
  }

  test("identically-bucketed tables join without an Exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket-").toString
    val st = new Storage(spark, wh)
    st.putBucketed("b_orders", Tables.orders(spark, sf0001), 4,
      Seq("o_custkey"), overwrite = true)
    st.putBucketed("b_customer", Tables.customer(spark, sf0001)
      .withColumnRenamed("c_custkey", "o_custkey"), 4,
      Seq("o_custkey"), overwrite = true)
    val joined = st.getBucketed("b_orders")
      .join(st.getBucketed("b_customer").hint("merge"), "o_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
  }

  test("AQE splits a deliberately hot-keyed join and preserves results") {
    import spark.implicits._
    // 30% of the fact rows on ONE key, dimension side uniform — the
    // shape GraftSession turns skewJoin handling on for. Thresholds are
    // scaled down to test-data volume (defaults are 256 MB partitions);
    // the MECHANISM under test — AQE detecting the hot partition and
    // splitting it — is size-relative, so this exercises exactly the
    // code path a 100 TB hot key takes.
    val confs = Seq(
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // md5 payload: incompressible, so shuffle-partition byte sizes —
      // what AQE's skew detector reads — track row counts honestly
      val fact = spark.range(200000).select(
        when($"id" % 10 < 3, lit(0L)).otherwise($"id" % 1000).as("k"),
        $"id".as("v"),
        md5(concat(lit("p"), $"id")).as("pad"))
      val dim = spark.range(1000).select($"id".as("k"),
        concat(lit("d"), $"id").as("name"))
      def agg() = fact.join(dim, "k")
        .groupBy("name").agg(count(lit(1)).as("n"), sum($"v").as("sv"))
      val skewed = agg()
      val rows = skewed.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(SkewJoin.planWasSkewSplit(skewed.queryExecution.executedPlan),
        "hot-keyed SMJ was not skew-split by AQE:\n" +
          skewed.queryExecution.executedPlan.toString)
      // same join with the handler off: identical results, so the
      // split is pure execution strategy, never semantics
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val plainRows = agg().collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == plainRows)
      assert(rows.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
