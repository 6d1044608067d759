package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. All reads go through
  * `spark.read.parquet` so Catalyst sees a declarative scan — filter
  * pushdown, column pruning and partition-parallel split reads apply
  * automatically (the reference's hand-rolled parallel chunk fetch,
  * `dfs/client/client.go:558-577`, is subsumed by the split-parallel
  * parquet scan).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** `events.ts` normalized to a Long of epoch nanos (`ts_ns`). The test
    * corpus is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * without the legacy flag (it then reads as a Long of nanos); an
    * events table written by a standard engine carries micros-precision
    * TIMESTAMP instead, which converts via `unix_micros · 1000`. All
    * window math downstream uses integer `DIV` — double division at
    * 1e18 magnitudes would lose precision past 2^53.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
      case _ =>
        // CAST handles TIMESTAMP_NTZ too (reinterpreted in the session
        // zone, which GraftSession pins to UTC)
        raw.withColumn("ts_ns",
          org.apache.spark.sql.functions
            .expr("unix_micros(CAST(ts AS TIMESTAMP)) * 1000L"))
          .drop("ts")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
