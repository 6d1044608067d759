package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Column-level building blocks shared across the engine.
  *
  * Everything here returns a [[Column]] built from
  * `org.apache.spark.sql.functions` built-ins (codegen'd, Catalyst-visible)
  * — never a Scala UDF — so predicate pushdown / column pruning / AQE see
  * through every operator that uses them.
  */
package object functions {

  // ---------------------------------------------------------------------
  // Cross-engine-exact numeric aggregation helpers.
  //
  // Double sums are FP-order dependent, so a Spark parallel sum and a
  // DuckDB sequential sum of the same column can differ in the last ulp
  // and fail the driver's hash compare. Casting to DECIMAL(18,6) first
  // makes the sum exact and associative (both engines round the double
  // to the same 6-decimal value: ties are impossible because no double
  // near these magnitudes has an exactly-7-digit decimal expansion).
  // Casting the exact decimal result back to double is correctly rounded
  // in both engines, giving bitwise-identical doubles.
  // ---------------------------------------------------------------------

  /** Exact 6-decimal fixed-point view of a double column. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Unscaled long of a compact decimal column (micro-units for scale
    * 6). `UnscaledValue` is the same catalyst node Spark's own
    * decimal-aggregate rewrite uses; for precision ≤ 18 it is a plain
    * field read.
    */
  private def unscaledOf(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.UnscaledValue(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))

  /** Exact sum of an unscaled-long column that may overflow a long in
    * aggregate: three 24-bit limbs (two's-complement identity
    * `u = (u>>48)·2^48 + ((u>>24)&m)·2^24 + (u&m)` holds for every
    * signed long), each limb summed as a plain long — per-row work is
    * shifts and adds inside whole-stage codegen, no BigDecimal. A limb
    * sum stays below 2^63 up to ~5·10^11 rows per group (the low/mid
    * limbs are < 2^24 each; the high limb carries the magnitude, ≤ 2^15
    * for scale-12 products of realistic prices). Recombined exactly
    * once per group by [[LimbsToDouble]].
    *
    * Replaces `sum(decimalCol)`: the decimal sum's buffer type exceeds
    * Spark's 18-digit compact representation, so every row paid a
    * BigDecimal add (and for products, a BigDecimal multiply) —
    * measured 15.9s of TPC-H Q1's 15.9s at 6M rows.
    */
  private val Limb = (1L << 24) - 1
  private def limbSum(u: Column, scale: Int): Column =
    LimbsToDouble.limbsToDouble(
      sum(shiftright(u, 48)), // arithmetic shift: sign rides the top limb
      sum(shiftright(u, 24).bitwiseAND(lit(Limb))),
      sum(u.bitwiseAND(lit(Limb))),
      scale)

  /** Order-insensitive, cross-engine-exact sum of a double column. */
  def dsum(c: Column): Column = limbSum(unscaledOf(dec(c)), 6)

  /** Cross-engine-exact average of a double column. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Exact sum of a product of two double columns (e.g. revenue =
    * extendedprice * (1 - discount)). The product of the two scale-6
    * unscaled longs is the exact scale-12 unscaled value (fits a long
    * while `|a·b| < ~9.2·10^6`, far above realistic price×fraction
    * magnitudes), limb-summed like [[dsum]]. The final correctly-
    * rounded decimal→double matches DuckDB's VARCHAR round-trip cast
    * (`dsumProdSql`); DuckDB's DIRECT decimal→double cast is NOT
    * correctly rounded past 2^53, hence the mirror's detour. A raw
    * decimal output column would also break the driver's comparator,
    * which reads Spark parquet decimals as python Decimal objects but
    * DuckDB results as float64.
    */
  def dsumProd(a: Column, b: Column): Column =
    limbSum(unscaledOf(dec(a)) * unscaledOf(dec(b)), 12)

  /** Scale-parameterized variants, for moment sums whose scale-6
    * products would overflow a long per row: `l_extendedprice²` has
    * unscaled magnitude 1e22 at scale 12 but 1e16 at scale 6 (scale-3
    * inputs). Rounding the input doubles to scale `s` is itself exact
    * cross-engine (both round the same double to the same decimal), so
    * moments over the rounded values hash-match by construction.
    */
  def decN(c: Column, scale: Int): Column = c.cast(DecimalType(18, scale))
  def dsumN(c: Column, scale: Int): Column =
    limbSum(unscaledOf(decN(c, scale)), scale)
  def dsumProdN(a: Column, b: Column, scale: Int): Column =
    limbSum(unscaledOf(decN(a, scale)) * unscaledOf(decN(b, scale)), 2 * scale)

  /** FLOOR-quantized exact sum, for scales where the decimal-CAST path
    * diverges between engines: Spark's double→decimal cast rounds the
    * SHORTEST decimal representation (`BigDecimal.valueOf`) while
    * DuckDB quantizes the exact binary value — indistinguishable at
    * scale ≤ 6 (flip probability ~ulp/10⁻⁶ ≈ 0), but at scale 12 a few
    * per 10⁵ values land on the other side of a half-grid boundary.
    * `floor(x·10^scale)` is two IEEE ops both engines perform
    * identically, so the quantized units — and their exact limb sum —
    * match bit-for-bit at ANY scale. The result is the correctly-
    * rounded double of `Σfloor(x·10^s) / 10^s`; the SQL mirror
    * ([[fsumNSql]]) matches it while the integer sum stays below 2^53
    * (exact int→double, then one division by the exactly-representable
    * 10^s) — at larger group sums give the oracle the VARCHAR detour.
    */
  def fsumN(c: Column, scale: Int): Column = {
    require(scale <= 18, s"10^$scale overflows the long quantization")
    limbSum(floor(c * math.pow(10, scale)).cast(LongType), scale)
  }

  /** SQL fragment mirrors, used when composing oracle SQL strings. */
  def decSql(e: String): String = s"CAST($e AS DECIMAL(18,6))"
  def decNSql(e: String, scale: Int): String = s"CAST($e AS DECIMAL(18,$scale))"
  def dsumNSql(e: String, scale: Int): String =
    s"CAST(SUM(${decNSql(e, scale)}) AS DOUBLE)"
  def dsumProdNSql(a: String, b: String, scale: Int): String =
    s"CAST(CAST(SUM(${decNSql(a, scale)} * ${decNSql(b, scale)}) AS VARCHAR) AS DOUBLE)"
  def fsumNSql(e: String, scale: Int): String = {
    val p = "1" + "0" * scale
    s"(CAST(SUM(CAST(floor(($e) * $p.0) AS BIGINT)) AS DOUBLE) / $p.0)"
  }
  def dsumSql(e: String): String = s"CAST(SUM(${decSql(e)}) AS DOUBLE)"
  def davgSql(e: String): String = s"(CAST(SUM(${decSql(e)}) AS DOUBLE) / COUNT(*))"
  def dsumProdSql(a: String, b: String): String =
    s"CAST(CAST(SUM(${decSql(a)} * ${decSql(b)}) AS VARCHAR) AS DOUBLE)"

  // ---------------------------------------------------------------------
  // Text primitives (reference parity: SURVEY.md §2b P1-P8).
  // ---------------------------------------------------------------------

  /** Go `strings.Fields` semantics (`dfs/wordcountjob.go:17`): split on
    * whitespace runs, dropping empty tokens (leading/trailing whitespace
    * yields empties from `split`; `filter` removes them — both are
    * Catalyst higher-order functions, no UDF).
    */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => length(t) > 0)

  /** Lower-cased, whitespace-trimmed normalization used by dedup. */
  def normText(c: Column): Column = lower(trim(c))

  /** KV-text line codec, reference format `key <--> value`
    * (`dfs/wordcountjob.go:195-196,217-221`).
    */
  val KvDelim = " <--> "
  def kvEncode(k: Column, v: Column): Column = concat_ws(KvDelim, k, v)
  def kvKey(line: Column): Column = split(line, " <--> ", 2).getItem(0)
  def kvValue(line: Column): Column = split(line, " <--> ", 2).getItem(1)

  /** MD5 fingerprint of normalized text (exact-dedup key). */
  def fingerprintMd5(c: Column): Column = md5(normText(c))

  /** Word n-gram shingles over a token-array column: element i is the
    * space-joined window `[i, i+n)`. Empty array when fewer than n
    * tokens. Pure higher-order functions — Catalyst sees through it.
    */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  // ---------------------------------------------------------------------
  // Vector primitives over Array[Float] embedding columns.
  // Higher-order functions (zip_with / aggregate) keep the whole dot
  // product inside Catalyst — no UDF, no serialization boundary.
  // Accumulation is in DOUBLE in array-index order, matching DuckDB's
  // sequential list_* fold, so results are cross-engine deterministic.
  // ---------------------------------------------------------------------

  /** Dot product of two float-array columns, accumulated in double —
    * reference HOF form (interpreted; used in tests to cross-check the
    * codegen'd expression).
    */
  def dotProductHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm, reference HOF form. */
  def l2NormHof(c: Column): Column =
    sqrt(aggregate(c, lit(0.0), (acc, x) =>
      acc + x.cast(DoubleType) * x.cast(DoubleType)))

  /** Cosine similarity of two float-array columns: codegen'd native
    * kernels ([[VectorExpressions]]), same left-fold double math as the
    * HOF form / the DuckDB oracle — bit-identical results, ~100× faster.
    */
  def cosineSim(a: Column, b: Column): Column =
    VectorExpressions.dotF(a, b) /
      (VectorExpressions.l2NormF(a) * VectorExpressions.l2NormF(b))

  // ---------------------------------------------------------------------
  // Hash partitioning parity (reference X1: md5(key) mod R,
  // `dfs/node/node.go:259-264`). Exposed for tests; real shuffles use
  // Catalyst HashPartitioning which is strictly better.
  // ---------------------------------------------------------------------

  /** First-8-hex-digits of md5 as a non-negative long — a stable,
    * cross-engine-computable hash (DuckDB: `strtol`-free via hex parse).
    */
  def md5Bucket(c: Column, buckets: Int): Column =
    pmod(conv(substring(md5(c), 1, 8), 16, 10).cast(LongType), lit(buckets))
}
