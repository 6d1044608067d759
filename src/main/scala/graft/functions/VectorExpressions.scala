package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native float-vector kernels. The higher-order-function forms
  * (`aggregate(zip_with(...))`) are interpreted with per-element boxing —
  * fine for correctness, ~100× too slow for 10^7+ pair scoring. These
  * expressions run the same left-to-right double-precision folds as the
  * HOF forms (and as the DuckDB oracle's `list_reduce`), so results are
  * bit-identical, but as tight primitive loops inside whole-stage
  * codegen.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dot_f requires two array<float> arguments, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(DotProductF.dot(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotProductF.dot($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "dot_f"
}

object DotProductF {
  /** Left-to-right double fold — identical to
    * `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, _+_)`.
    *
    * Reads the Tungsten array in place (`getFloat` is a raw offset
    * load): the earlier `toFloatArray()` form copied BOTH sides on
    * EVERY evaluation — ~2 heap allocations per scored pair, which at
    * 50M pairs (dd_embed_cosine, sf0.1) was tens of GB of young-gen
    * churn whose GC tail also landed on whatever query ran next.
    */
  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

case class L2NormF(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"l2norm_f requires an array<float> argument, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    java.lang.Double.valueOf(L2NormF.norm(a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.L2NormF.norm($a);")

  override protected def withNewChildInternal(c: Expression): L2NormF = copy(c)
  override def prettyName: String = "l2norm_f"
}

object L2NormF {
  /** In-place fold over the Tungsten array — no per-row copy. */
  def norm(x: ArrayData): Double = {
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = x.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }
}

case class AbsMaxF(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"absmax_f requires an array<float> argument, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    java.lang.Double.valueOf(AbsMaxF.absMax(a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.AbsMaxF.absMax($a);")

  override protected def withNewChildInternal(c: Expression): AbsMaxF = copy(c)
  override def prettyName: String = "absmax_f"
}

object AbsMaxF {
  /** max_i |double(x_i)| — same values as
    * `array_max(transform(v, x => abs(cast(x as double))))` (max is
    * order-insensitive; the corpus has no NaNs). 0.0 for empty arrays.
    */
  def absMax(x: ArrayData): Double = {
    val n = x.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(x.getFloat(i).toDouble)
      if (v > m) m = v
      i += 1
    }
    m
  }
}

/** Symmetric int8 quantization of a float vector in ONE native pass,
  * returned as a struct `(absmax double, scale double?, q8 string?)`
  * with q_i = floor(double(x_i)·(127/absmax) + 0.5) CSV-serialized in
  * `q8`. `scale` and `q8` are NULL when absmax ≤ 0 (all-zero or empty
  * vector) — safe with no caller-side guard, on the Column API and the
  * SQL surface alike (the earlier string-returning form divided by
  * zero and emitted "0,0,…" for a zero vector when called outside its
  * guard). The struct return also means absmax is scanned once per
  * row, not once per output column; multiple `getField` references in
  * one projection unify via codegen subexpression elimination.
  *
  * The HOF formulation (`transform` with the absmax subterm inside
  * the lambda) is interpreted AND re-evaluates absmax per element —
  * measured 11.5 s for 20k vectors vs 0.4 s native, identical output.
  */
case class QuantizeI8F(child: Expression) extends UnaryExpression {

  override def dataType: DataType = QuantizeI8F.schema
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_i8 requires an array<float> argument, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    QuantizeI8F.quantize(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.QuantizeI8F.quantize($a);")

  override protected def withNewChildInternal(c: Expression): QuantizeI8F =
    copy(c)
  override def prettyName: String = "quantize_i8"
}

object QuantizeI8F {

  val schema: StructType = StructType(Seq(
    StructField("absmax", DoubleType, nullable = false),
    StructField("scale", DoubleType, nullable = true),
    StructField("q8", StringType, nullable = true)))

  /** `q8` is exactly `array_to_string(list_transform(v, x ->
    * CAST(floor(CAST(x AS DOUBLE) * (127.0/absmax) + 0.5) AS INTEGER)),
    * ',')` — floor(x+0.5) half-up rounding, identical double ops to
    * the DuckDB oracle; absmax and the quantized string come from one
    * fused pass.
    */
  def quantize(x: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val m = AbsMaxF.absMax(x)
    if (m <= 0.0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](m, null, null))
    val n = x.numElements()
    val scale = 127.0 / m
    val sb = new java.lang.StringBuilder(n * 5)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(',')
      sb.append(math.floor(x.getFloat(i).toDouble * scale + 0.5).toInt)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](m, scale,
        org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)))
  }
}

/** Mixed-precision dot: `array<float>` corpus vector × `array<double>`
  * derived vector (a k-means centroid, a PCA direction). Same
  * left-to-right double fold as [[DotProductF]] — each float promotes
  * exactly to double, so the result equals the all-double HOF fold
  * bit-for-bit.
  */
case class DotProductFD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dot_fd requires (array<float>, array<double>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(DotProductFD.dot(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotProductFD.dot($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "dot_fd"
}

object DotProductFD {
  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getDouble(i)
      i += 1
    }
    acc
  }
}

/** L2 norm of an `array<double>` column — the double-array counterpart
  * of [[L2NormF]], same fold order.
  */
case class L2NormD(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"l2norm_d requires an array<double> argument, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    java.lang.Double.valueOf(L2NormD.norm(a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.L2NormD.norm($a);")

  override protected def withNewChildInternal(c: Expression): L2NormD = copy(c)
  override def prettyName: String = "l2norm_d"
}

object L2NormD {
  def norm(x: ArrayData): Double = {
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = x.getDouble(i)
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }
}


/** PQ encode in ONE map-side pass: for each of the `offsets.length - 1`
  * subspaces, the argmax cell of the L2-assignment score
  * `dot(sv, cv) − ‖cv‖²/2` over that subspace's codebook entries,
  * returned as one `array<int>` of codes per vector. This is the
  * one-off index-BUILD kernel: the declarative encode materializes a
  * row per (vector, subspace, cell) — n×M×K scored rows through a
  * broadcast join and an argmax window — which measured ~22 min for a
  * 200k-vector corpus; this kernel reads the Tungsten float array in
  * place and scores the same M×K cells in a tight loop, so encoding is
  * scan-bound like every other build pass. The trained codebook is
  * tiny (M×K×subDim doubles ≈ 128 KB) and rides along as plan
  * reference objects, the broadcast-LUT posture the PQ docs describe.
  *
  * Bit-parity with the declarative form ([[graft.operators.Similarity]]
  * `pqAssignAll`) and the DuckDB oracle: the dot is the same
  * left-to-right float→double fold as [[DotProductFD]]; `halfCn2`
  * must be precomputed as `0.5 * (sqrt(Σcv²) · sqrt(Σcv²))` — the
  * sqrt-then-square round-trip [[L2NormD]] + `cnrm * cnrm` takes, NOT
  * `0.5 * Σcv²` — and ties break to the LOWER cell id (`cellIds` must
  * be ascending within each subspace run), matching
  * `ORDER BY sc DESC, cell`.
  *
  * Constructor arrays are plan reference objects, not child
  * expressions (case-class equality is by reference — conservative and
  * safe for semantic dedup).
  */
case class PqEncodeF(child: Expression, offsets: Array[Int],
    cellIds: Array[Int], codebook: Array[Double], halfCn2: Array[Double],
    subDim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires an array<float> argument, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    PqEncodeF.encode(a.asInstanceOf[ArrayData], offsets, cellIds,
      codebook, halfCn2, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val off = ctx.addReferenceObj("pqOffsets", offsets, "int[]")
    val ids = ctx.addReferenceObj("pqCellIds", cellIds, "int[]")
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    val hc = ctx.addReferenceObj("pqHalfCn2", halfCn2, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PqEncodeF.encode($a, $off, $ids, $cb, $hc, $subDim);")
  }

  override protected def withNewChildInternal(c: Expression): PqEncodeF =
    copy(child = c)
  override def prettyName: String = "pq_encode"
}

object PqEncodeF {
  def encode(x: ArrayData, offsets: Array[Int], cellIds: Array[Int],
      cb: Array[Double], halfCn2: Array[Double], subDim: Int): ArrayData = {
    val m = offsets.length - 1
    val out = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      var bestCell = -1
      var bestSc = Double.NegativeInfinity
      var ci = offsets(sub)
      val end = offsets(sub + 1)
      val base = sub * subDim
      while (ci < end) {
        var acc = 0.0
        var d = 0
        val cbase = ci * subDim
        while (d < subDim) {
          acc += x.getFloat(base + d).toDouble * cb(cbase + d)
          d += 1
        }
        val sc = acc - halfCn2(ci)
        // strict > keeps the LOWEST cell on ties (ids ascend per sub)
        if (sc > bestSc) { bestSc = sc; bestCell = cellIds(ci) }
        ci += 1
      }
      out(sub) = bestCell
      sub += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}


/** Nearest IVF cell by cosine in one map-side pass — the index-BUILD
  * counterpart of [[PqEncodeF]] for the coarse quantizer: the
  * declarative corpus→cell assignment (`cellRanks` + `crank = 1`)
  * materializes n×k scored rows through a broadcast join and an argmax
  * window, which at a 100× corpus is ~1.4×10⁸ rows for ONE build
  * artifact. Scores every (broadcast-tiny) centroid against the
  * Tungsten float array in place with the exact `cellRanks` arithmetic:
  * `cos = dot_fd(vec, cv) / (l2norm_f(vec) · cnrm)` (cnrm passed in
  * from the trained table, NOT recomputed), ties to the lower cell id
  * (`cellIds` ascending), matching `ORDER BY cos_c DESC, cell`.
  */
case class NearestCellF(child: Expression, cellIds: Array[Int],
    cents: Array[Double], cnrms: Array[Double], dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell requires an array<float> argument, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    java.lang.Integer.valueOf(NearestCellF.nearest(
      a.asInstanceOf[ArrayData], cellIds, cents, cnrms, dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ids = ctx.addReferenceObj("ivfCellIds", cellIds, "int[]")
    val cs = ctx.addReferenceObj("ivfCents", cents, "double[]")
    val ns = ctx.addReferenceObj("ivfCnrms", cnrms, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NearestCellF.nearest($a, $ids, $cs, $ns, $dim);")
  }

  override protected def withNewChildInternal(c: Expression): NearestCellF =
    copy(child = c)
  override def prettyName: String = "nearest_cell"
}

object NearestCellF {
  def nearest(x: ArrayData, cellIds: Array[Int], cents: Array[Double],
      cnrms: Array[Double], dim: Int): Int = {
    // l2norm_f fold: float promoted per element, sqrt at the end
    var s = 0.0
    var i = 0
    while (i < dim) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
    val nrm = math.sqrt(s)
    var best = -1
    var bestCos = Double.NegativeInfinity
    var ci = 0
    while (ci < cellIds.length) {
      var acc = 0.0
      val base = ci * dim
      var d = 0
      while (d < dim) { acc += x.getFloat(d).toDouble * cents(base + d); d += 1 }
      val cos = acc / (nrm * cnrms(ci))
      // strict > keeps the LOWEST cell on ties (ids ascend)
      if (cos > bestCos) { bestCos = cos; best = cellIds(ci) }
      ci += 1
    }
    best
  }
}

/** Top-`p` nearest IVF cells by cosine in one map-side pass — the
  * probe-list counterpart of [[NearestCellF]]: the declarative probe
  * ranking (`cellRanks` + `crank <= p`) materializes n×k scored rows
  * through a broadcast cross join and then SHUFFLES them into a
  * per-vector rank window; this kernel emits the same top-`p` list
  * (rank order: cosine DESC, cell id ASC on ties — exactly `ORDER BY
  * cos_c DESC, cell`) as one `array<int>` without the intermediate
  * rows or the window shuffle. Arithmetic is bit-identical to
  * [[NearestCellF]]/`cellRanks`: `cos = dot_fd(vec, cv) /
  * (l2norm_f(vec) · cnrm)` with `cnrm` passed from the trained table;
  * ties keep the LOWER cell because `cellIds` ascend and the insertion
  * comparison is strict (an equal-cosine later cell never displaces an
  * earlier one). Returns fewer than `p` entries only when the trained
  * index has fewer than `p` cells.
  */
case class ProbeCellsF(child: Expression, cellIds: Array[Int],
    cents: Array[Double], cnrms: Array[Double], dim: Int, p: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"probe_cells requires an array<float> argument, got $other")
  }

  override def nullSafeEval(a: Any): Any =
    ProbeCellsF.probe(a.asInstanceOf[ArrayData], cellIds, cents, cnrms,
      dim, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ids = ctx.addReferenceObj("ivfCellIds", cellIds, "int[]")
    val cs = ctx.addReferenceObj("ivfCents", cents, "double[]")
    val ns = ctx.addReferenceObj("ivfCnrms", cnrms, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ProbeCellsF.probe($a, $ids, $cs, $ns, $dim, $p);")
  }

  override protected def withNewChildInternal(c: Expression): ProbeCellsF =
    copy(child = c)
  override def prettyName: String = "probe_cells"
}

object ProbeCellsF {
  def probe(x: ArrayData, cellIds: Array[Int], cents: Array[Double],
      cnrms: Array[Double], dim: Int, p: Int): ArrayData = {
    // l2norm_f fold: float promoted per element, sqrt at the end
    var s = 0.0
    var i = 0
    while (i < dim) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
    val nrm = math.sqrt(s)
    val cap = math.min(p, cellIds.length)
    val topCos = new Array[Double](cap)
    val topCell = new Array[Int](cap)
    var size = 0
    var ci = 0
    while (ci < cellIds.length) {
      var acc = 0.0
      val base = ci * dim
      var d = 0
      while (d < dim) { acc += x.getFloat(d).toDouble * cents(base + d); d += 1 }
      val cos = acc / (nrm * cnrms(ci))
      // insert before strictly-smaller entries only: equal-cosine
      // entries (inserted earlier = lower cell id) stay ahead
      var idx = size
      while (idx > 0 && topCos(idx - 1) < cos) idx -= 1
      if (idx < cap) {
        var m = math.min(size, cap - 1)
        while (m > idx) {
          topCos(m) = topCos(m - 1); topCell(m) = topCell(m - 1); m -= 1
        }
        topCos(idx) = cos
        topCell(idx) = cellIds(ci)
        if (size < cap) size += 1
      }
      ci += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(topCell, size))
  }
}

object VectorExpressions {
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductF(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def dotFD(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductFD(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def l2NormF(c: Column): Column =
    ColumnBridge.column(L2NormF(ColumnBridge.expression(c)))
  def l2NormD(c: Column): Column =
    ColumnBridge.column(L2NormD(ColumnBridge.expression(c)))
  def absMaxF(c: Column): Column =
    ColumnBridge.column(AbsMaxF(ColumnBridge.expression(c)))
  def quantizeI8F(c: Column): Column =
    ColumnBridge.column(QuantizeI8F(ColumnBridge.expression(c)))
  def pqEncodeF(c: Column, offsets: Array[Int], cellIds: Array[Int],
      codebook: Array[Double], halfCn2: Array[Double], subDim: Int): Column =
    ColumnBridge.column(PqEncodeF(ColumnBridge.expression(c), offsets,
      cellIds, codebook, halfCn2, subDim))
  def nearestCellF(c: Column, cellIds: Array[Int], cents: Array[Double],
      cnrms: Array[Double], dim: Int): Column =
    ColumnBridge.column(NearestCellF(ColumnBridge.expression(c), cellIds,
      cents, cnrms, dim))
  def probeCellsF(c: Column, cellIds: Array[Int], cents: Array[Double],
      cnrms: Array[Double], dim: Int, p: Int): Column =
    ColumnBridge.column(ProbeCellsF(ColumnBridge.expression(c), cellIds,
      cents, cnrms, dim, p))
}
