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

  /** Order-insensitive, cross-engine-exact sum of a double column. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Cross-engine-exact average of a double column. */
  def davg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(lit(1))

  /** Exact sum of a product of two double columns (e.g. revenue =
    * extendedprice * (1 - discount)). The product of two scale-6 decimals
    * is exact at scale 12; the sum stays decimal until a final cast to
    * DOUBLE. Spark's decimal→double (BigDecimal.doubleValue) is correctly
    * rounded; DuckDB's direct decimal→double cast is NOT once the unscaled
    * value exceeds 2^53, so the SQL mirror round-trips through VARCHAR
    * (exact digits, then strtod — correctly rounded). A raw decimal output
    * column would also break the driver's comparator, which reads Spark
    * parquet decimals as python Decimal objects but DuckDB results as
    * float64.
    */
  def dsumProd(a: Column, b: Column): Column =
    sum(dec(a) * dec(b)).cast(DoubleType)

  /** SQL fragment mirrors, used when composing oracle SQL strings. */
  def decSql(e: String): String = s"CAST($e AS DECIMAL(18,6))"
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
