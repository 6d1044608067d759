package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Tables

class TopKPerGroupSpec extends SparkTestBase {

  private def viaWindow(k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
    Tables.orders(spark, sf001)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  test("custom operator matches the window formulation exactly") {
    val k = 3
    val custom = TopK.perGroup(
      Tables.orders(spark, sf001), Seq("o_custkey"),
      struct(col("o_totalprice"), col("o_orderkey")), k)
    val a = custom.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = viaWindow(k).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("physical plan uses TopKPerGroupExec with a single hash exchange, no sort") {
    val custom = TopK.perGroup(
      Tables.orders(spark, sf001), Seq("o_custkey"),
      struct(col("o_totalprice"), col("o_orderkey")), 3)
    val plan = custom.queryExecution.executedPlan.toString
    // exec nodes render without the Exec suffix
    assert(plan.contains("TopKPerGroup"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.toLowerCase.contains("sortexec") && !plan.contains("Sort "),
      s"unexpected sort in plan:\n$plan")
  }

  test("k larger than any group returns every row") {
    val n = Tables.supplier(spark, sf0001).count()
    val all = TopK.perGroup(Tables.supplier(spark, sf0001),
      Seq("s_nationkey"), struct(col("s_acctbal"), col("s_suppkey")), 1000)
    assert(all.count() == n)
  }

  test("k = 1 returns exactly one row per group (arg-max)") {
    val one = TopK.perGroup(Tables.customer(spark, sf0001),
      Seq("c_nationkey"), struct(col("c_acctbal"), col("c_custkey")), 1)
    val groups = Tables.customer(spark, sf0001)
      .select("c_nationkey").distinct().count()
    assert(one.count() == groups)
  }
}
