package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Top-k rows per group as a first-class operator — the full custom
  * path (logical node → Strategy → physical exec) from SURVEY.md §7's
  * preference list, used where composition genuinely loses: the
  * `row_number().over(window) <= k` form must SORT every group in full;
  * this operator keeps a size-k bounded heap per group, one pass, no
  * sort — O(n log k) instead of O(n log n), and nothing but k·groups
  * rows survive the operator.
  *
  * Requires a hash exchange on the group keys (declared via
  * `requiredChildDistribution`, so Catalyst plans the shuffle); heap
  * ordering must be a total order (pass a tie-broken struct) for
  * deterministic results.
  */
case class TopKPerGroup(
    groupCols: Seq[Expression],
    order: Expression,
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroup =
    copy(child = c)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupCols: Seq[Expression],
    order: Expression,
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupCols) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupExprs = groupCols
    val orderExpr = order
    val limit = k
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      // DESC by the order expression: the heap keeps the k largest; its
      // head is the smallest of the kept rows.
      val rowOrd = org.apache.spark.sql.catalyst.expressions.codegen
        .LazilyGeneratedOrdering.forSchema(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("o", orderExpr.dataType))))
      val orderProj = UnsafeProjection.create(Seq(orderExpr), childOutput)
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[(UnsafeRow, InternalRow)]]()
      val cmp = new java.util.Comparator[(UnsafeRow, InternalRow)] {
        override def compare(a: (UnsafeRow, InternalRow),
            b: (UnsafeRow, InternalRow)): Int = rowOrd.compare(a._1, b._1)
      }
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue(limit, cmp)
          heaps.put(key.copy(), heap)
        }
        val ordKey = orderProj(row)
        // row buffers are reused by the upstream iterator — copy on keep
        // (InternalRow.copy, not an UnsafeRow cast: rows need not be
        // unsafe for every child plan)
        if (heap.size() < limit) {
          heap.offer((ordKey.copy(), row.copy()))
        } else if (rowOrd.compare(ordKey, heap.peek()._1) > 0) {
          heap.poll()
          heap.offer((ordKey.copy(), row.copy()))
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala
        .flatMap(_.iterator().asScala.map(_._2))
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

object TopK {

  /** Top-k rows per group, ordered DESC by `orderBy` (supply a total
    * order — e.g. `struct(col("price"), col("id"))` — for determinism).
    */
  def perGroup(df: DataFrame, groupCols: Seq[String], orderBy: Column,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureRegistered(spark)
    // materialize the order key through the DataFrame API (fully
    // analyzed), then reference it by name — handing a raw Column's
    // node tree to a custom operator would bypass analysis
    val ordCol = "__graft_ord"
    val withOrd = df.withColumn(ordCol, orderBy)
    val plan = TopKPerGroup(
      groupCols.map(UnresolvedAttribute(_)),
      UnresolvedAttribute(ordCol),
      k,
      ColumnBridge.logicalPlan(withOrd))
    ColumnBridge.dataFrame(spark, plan).drop(ordCol)
  }

  def ensureRegistered(spark: SparkSession): Unit =
    ColumnBridge.registerStrategy(spark, TopKStrategy)
}
