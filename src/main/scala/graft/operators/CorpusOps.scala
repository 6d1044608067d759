package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.functions._
import graft.sources.Tables._

/** Corpus-assembly operators: the deterministic bookkeeping a training-
  * data pipeline runs between filtering and tokenization — train/val/test
  * splitting, stratified sampling, global shuffling, and domain-mixture
  * reweighting. (The reference engine stops at word-count-style MapReduce
  * — SURVEY.md §2f; this family is part of the prompt-mandated
  * training-pipeline extension surface.)
  *
  * Every operator keys on md5 of a salted record id, so results are
  * reproducible across runs, engines, and partitionings — no RNG state,
  * no `rand()`. All md5 arithmetic matches the DuckDB oracle bit-for-bit
  * (see `md5Bucket`): assignment decisions are identical in both engines.
  *
  * Scale posture: split and mixture are pure map-side (no shuffle beyond
  * the presentation sort); stratified sampling shuffles once on the
  * stratum key; the global shuffle is the two-phase bucket-enumeration
  * pattern (sort WITHIN 256 independent hash buckets + a 256-row offset
  * table) rather than a single-partition global row_number.
  */
object CorpusOps {

  /** Salted md5 hex key — the per-operator reproducible randomness. */
  private def saltedKey(salt: String, id: org.apache.spark.sql.Column) =
    md5(concat(lit(salt + ":"), id.cast("string")))

  private def saltedKeySql(salt: String, idExpr: String) =
    s"md5('$salt:' || CAST($idExpr AS VARCHAR))"

  // ---------------------------------------------------------------------
  // cp_split — deterministic train/val/test split.
  // ---------------------------------------------------------------------

  val TrainPct = 80
  val ValPct = 10 // test gets the remainder

  /** Hash-split documents 80/10/10 into train/val/test. The split is a
    * pure projection of the doc id — adding or removing OTHER documents
    * never moves a document between splits (the property `rand()`-based
    * splits lack, and the reason every production pipeline hashes).
    * Map-side only; at 100 TB this costs one md5 per row.
    */
  def cpSplit(s: SparkSession, d: String): DataFrame = {
    val b = md5Bucket(concat(lit("split:"), col("doc_id").cast("string")), 100)
    documents(s, d)
      .select(
        col("doc_id"),
        b.cast(IntegerType).as("bucket"),
        when(b < TrainPct, "train")
          .when(b < TrainPct + ValPct, "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  val cpSplitSql: String = {
    val b = s"(('0x' || substr(${saltedKeySql("split", "doc_id")}, 1, 8))::UBIGINT % 100)"
    s"""SELECT doc_id,
       |  CAST($b AS INTEGER) AS bucket,
       |  CASE WHEN $b < $TrainPct THEN 'train'
       |       WHEN $b < ${TrainPct + ValPct} THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // cp_stratified — proportional per-stratum sampling.
  // ---------------------------------------------------------------------

  val StratRate = 0.2

  /** Keep ceil(20%) of each `source` stratum, chosen by hash order — the
    * per-domain subsample that preserves domain proportions exactly
    * (uniform hash sampling only preserves them in expectation, which at
    * small-stratum sizes means entire domains can vanish). One shuffle
    * on the stratum key; the within-stratum sort is by md5, so the
    * choice of which documents survive is reproducible. Skewed strata
    * sort independently (AQE splits oversized partitions).
    */
  def cpStratified(s: SparkSession, d: String): DataFrame = {
    val key = saltedKey("strat", col("doc_id"))
    val w = Window.partitionBy(col("source")).orderBy(col("k"), col("doc_id"))
    val cw = Window.partitionBy(col("source"))
    documents(s, d)
      .select(col("doc_id"), col("source"), key.as("k"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n_source", count(lit(1)).over(cw))
      .filter(col("rk") <= ceil(col("n_source") * lit(StratRate)))
      .select(col("doc_id"), col("source"),
        col("rk").cast(IntegerType).as("rk"),
        col("n_source").cast(LongType).as("n_source"))
      .orderBy(col("doc_id"))
  }

  val cpStratifiedSql: String =
    s"""SELECT doc_id, source, CAST(rk AS INTEGER) AS rk,
       |  CAST(n_source AS BIGINT) AS n_source
       |FROM (
       |  SELECT doc_id, source,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY ${saltedKeySql("strat", "doc_id")}, doc_id) AS rk,
       |    COUNT(*) OVER (PARTITION BY source) AS n_source
       |  FROM documents) t
       |WHERE rk <= ceil(n_source * $StratRate)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // cp_shuffle — deterministic global shuffle (two-phase enumeration).
  // ---------------------------------------------------------------------

  /** Assign every document a global position in a reproducible
    * pseudo-random order (the training-order shuffle). Semantically this
    * is `row_number() OVER (ORDER BY md5(id))` — but a global window
    * collapses to ONE partition, so the implementation is the two-phase
    * form that survives 100 TB: rank within 256 independent hash buckets
    * (the bucket is the key's first hex byte, so bucket order refines
    * key order), then add per-bucket offsets from a broadcast 256-row
    * cumulative-count table. Each bucket sorts ~1/256 of the corpus in
    * parallel; no single-machine sort anywhere. The oracle IS the naive
    * global-window form — the equivalence is what's being checked.
    */
  def cpShuffle(s: SparkSession, d: String): DataFrame = {
    val ranked = documents(s, d)
      .select(col("doc_id"),
        saltedKey("shuf", col("doc_id")).as("k"))
      .withColumn("b", substring(col("k"), 1, 2))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("b")).orderBy(col("k"), col("doc_id"))))
    val offsets = ranked.groupBy(col("b"))
      .agg(count(lit(1)).as("n"))
      .withColumn("off",
        coalesce(
          sum(col("n")).over(Window.orderBy(col("b"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("b"), col("off"))
    ranked.join(broadcast(offsets), Seq("b"))
      .select(col("doc_id"), (col("off") + col("rk")).cast(LongType).as("pos"))
      .orderBy(col("doc_id"))
  }

  val cpShuffleSql: String =
    s"""SELECT doc_id,
       |  CAST(ROW_NUMBER() OVER (
       |    ORDER BY ${saltedKeySql("shuf", "doc_id")}, doc_id) AS BIGINT) AS pos
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // cp_mixture — domain-mixture reweighting.
  // ---------------------------------------------------------------------

  /** Downsample each source to its mixture rate (1.0 / 0.5 / 0.25 by
    * source-number mod 3 — a stand-in for the per-domain weights a real
    * data recipe assigns) and report per-source kept counts and the
    * surviving character budget. Keep/drop is the same salted-hash
    * threshold as [[cpSplit]] — map-side, reproducible; the only shuffle
    * is the per-source count aggregation.
    */
  def cpMixture(s: SparkSession, d: String): DataFrame = {
    val srcNum = regexp_extract(col("source"), "(\\d+)", 1).cast(IntegerType)
    val rate = when(srcNum % 3 === 0, 1.0)
      .when(srcNum % 3 === 1, 0.5)
      .otherwise(0.25)
    val kept = md5Bucket(concat(lit("mix:"), col("doc_id").cast("string")), 1000) <
      (rate * 1000).cast(IntegerType)
    documents(s, d)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(kept.cast(LongType)).as("n_kept"),
        sum(when(kept, col("n_chars")).otherwise(0).cast(LongType))
          .as("chars_kept"),
        first(rate).as("rate"))
      .select(col("source"), col("n_docs").cast(LongType),
        col("n_kept").cast(LongType), col("chars_kept").cast(LongType),
        col("rate").cast(DoubleType))
      .orderBy(col("source"))
  }

  val cpMixtureSql: String = {
    val rate = """CASE WHEN CAST(regexp_extract(source, '(\d+)', 1) AS INTEGER) % 3 = 0 THEN 1.0
                 |       WHEN CAST(regexp_extract(source, '(\d+)', 1) AS INTEGER) % 3 = 1 THEN 0.5
                 |       ELSE 0.25 END""".stripMargin
    val kept = s"(('0x' || substr(${saltedKeySql("mix", "doc_id")}, 1, 8))::UBIGINT % 1000)" +
      s" < CAST(($rate) * 1000 AS INTEGER)"
    s"""SELECT source,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN $kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN $kept THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept,
       |  CAST(($rate) AS DOUBLE) AS rate
       |FROM documents
       |GROUP BY source
       |ORDER BY source""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cp_split"      -> cpSplit _,
    "cp_stratified" -> cpStratified _,
    "cp_shuffle"    -> cpShuffle _,
    "cp_mixture"    -> cpMixture _,
  )

  val oracles: Map[String, String] = Map(
    "cp_split"      -> cpSplitSql,
    "cp_stratified" -> cpStratifiedSql,
    "cp_shuffle"    -> cpShuffleSql,
    "cp_mixture"    -> cpMixtureSql,
  )
}
