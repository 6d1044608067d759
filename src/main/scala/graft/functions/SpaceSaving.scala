package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-saving heavy-hitters summary (Metwally et al., *Efficient
  * Computation of Frequent and Top-k Elements in Data Streams*), with
  * the mergeable-summaries combine rule (Agarwal et al., *Mergeable
  * Summaries*): `k` counters `(est, err)` where `est` upper-bounds the
  * term's true count and `est - err` lower-bounds it, and any term
  * with true count > n/k is guaranteed present.
  *
  * On merge, a term absent from one side contributes that side's
  * minimum counter (its count there can't exceed it) to both `est`
  * and `err`, and the union is trimmed back to the top `k` by `est` —
  * the trim preserves the n/k presence guarantee.
  */
final class SpaceSavingSummary(val k: Int) extends Serializable {

  /** term -> [est, err] (2-element array mutated in place). */
  val counters: mutable.HashMap[String, Array[Long]] = mutable.HashMap.empty

  def full: Boolean = counters.size >= k

  def minEst: Long =
    if (counters.isEmpty) 0L else counters.valuesIterator.map(_(0)).min

  def add(term: String): Unit = counters.get(term) match {
    case Some(a) => a(0) += 1L
    case None if counters.size < k => counters(term) = Array(1L, 0L)
    case None =>
      // evict the minimum counter (term tiebreak for determinism given
      // identical buffer contents); the newcomer inherits its estimate
      // as both base and error
      val (mt, ma) = counters.minBy { case (t, a) => (a(0), t) }
      counters.remove(mt)
      counters(term) = Array(ma(0) + 1L, ma(0))
  }

  def mergeIn(o: SpaceSavingSummary): SpaceSavingSummary = {
    val mA = if (full) minEst else 0L
    val mB = if (o.full) o.minEst else 0L
    val union = mutable.HashMap[String, Array[Long]]()
    (counters.keysIterator ++ o.counters.keysIterator).foreach { t =>
      if (!union.contains(t)) {
        val a = counters.get(t)
        val b = o.counters.get(t)
        union(t) = Array(
          a.map(_(0)).getOrElse(mA) + b.map(_(0)).getOrElse(mB),
          a.map(_(1)).getOrElse(mA) + b.map(_(1)).getOrElse(mB))
      }
    }
    val kept = union.toSeq.sortBy { case (t, arr) => (-arr(0), t) }.take(k)
    counters.clear()
    kept.foreach { case (t, arr) => counters(t) = arr }
    this
  }

  /** Entries by estimate desc (term asc tiebreak). */
  def sorted: Seq[(String, Long, Long)] =
    counters.toSeq.map { case (t, a) => (t, a(0), a(1)) }
      .sortBy { case (t, est, _) => (-est, t) }
}

/** Aggregate form of [[SpaceSavingSummary]]: per-partition summaries
  * (map-side partials) merge through the shuffle as ≤ `k` counters
  * each — the whole-vocabulary groupBy this replaces shuffles every
  * distinct term instead. Output `array<struct<term, est, err>>`, est
  * desc. The summary content depends on arrival order/partitioning, so
  * oracle-gated queries expose INVARIANTS of it (presence guarantee,
  * est/err bounds vs exact counts), not the raw sketch — the q27
  * pattern.
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingSummary] {

  require(k > 0, s"space_saving_topk capacity must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"space_saving_topk requires a string column, got $other")
  }

  override def createAggregationBuffer(): SpaceSavingSummary =
    new SpaceSavingSummary(k)

  override def update(b: SpaceSavingSummary, row: InternalRow): SpaceSavingSummary = {
    val v = child.eval(row)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: SpaceSavingSummary, o: SpaceSavingSummary): SpaceSavingSummary =
    b.mergeIn(o)

  override def eval(b: SpaceSavingSummary): Any =
    new GenericArrayData(b.sorted.map { case (t, est, err) =>
      InternalRow(UTF8String.fromString(t), est, err)
    }.toArray[Any])

  override def serialize(b: SpaceSavingSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.counters.size)
    b.counters.foreach { case (t, a) =>
      val bytes = t.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(a(0))
      out.writeLong(a(1))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new SpaceSavingSummary(in.readInt())
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      s.counters(new String(buf, "UTF-8")) = Array(in.readLong(), in.readLong())
    }
    s
  }

  override def withNewMutableAggBufferOffset(n: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SpaceSavingTopK = copy(child = c.head)
  override def prettyName: String = "space_saving_topk"
}

object SpaceSaving {
  /** `space_saving_topk(col, k)` as a Column aggregate. */
  def topK(c: Column, k: Int): Column =
    ColumnBridge.column(
      SpaceSavingTopK(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Explode a sketch column named `sk` into one row per counter
    * `(keep..., term, est, err)` — the single definition of the
    * unpack every sketch consumer shares.
    */
  def unpacked(df: org.apache.spark.sql.DataFrame, keep: String*)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, explode}
    df.select(keep.map(col) :+ explode(col("sk")).as("e"): _*)
      .select(keep.map(col) ++ Seq(col("e.term").as("term"),
        col("e.est").as("est"), col("e.err").as("err")): _*)
  }
}
