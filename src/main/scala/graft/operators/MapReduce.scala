package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** The reference's entire extensibility model re-expressed on Dataset.
  *
  * Reference contract (`dfs/wordcountjob.go:16,29`): a user job exports
  * `Map(lineNumber, line) → []keyValuePair` (a 1→N generator) and
  * `Reduce(key, values) → keyValuePair` (N→1 per group). The reference
  * ships the job as a compiled Go binary exec'd per chunk
  * (`dfs/node/node.go:233-257`); here the job is a Scala closure and
  * shipping/isolation is Spark's closure serialization + executor model.
  *
  * `lineNumber` is accepted by the reference but unused by both example
  * jobs, so the Scala contract drops it.
  */
final case class MapReduceJob[K, V](
    map: String => Seq[(K, V)],
    reduce: (K, Seq[V]) => (K, V))

object MapReduce {

  /** General runner, shape-equivalent to the reference's
    * map → md5-hash shuffle → groupByKey → reduce pipeline
    * (`dfs/node/node.go:259-334`, `dfs/wordcountjob.go:41-86`):
    * flatMap → Exchange hashpartitioning → mapGroups.
    *
    * Like the reference's `Preprocess` (which materializes every group
    * fully in memory, `dfs/wordcountjob.go:46`), `reduce` sees the whole
    * value list; Spark streams groups from sorted shuffle output so only
    * one group is resident per task. For associative reducers prefer
    * [[runAssociative]], which adds map-side partial aggregation the
    * reference explicitly lacks (SURVEY.md §2d A4).
    */
  def run[K, V](lines: Dataset[String], job: MapReduceJob[K, V])(implicit
      ek: Encoder[K], ekv: Encoder[(K, V)]): Dataset[(K, V)] =
    lines
      .flatMap(job.map)
      .groupByKey(_._1)
      .mapGroups((k, it) => job.reduce(k, it.map(_._2).toSeq))

  /** Associative/commutative variant: `reduceGroups` lowers to a typed
    * Aggregator, so Spark performs partial (map-side) aggregation before
    * the shuffle — at 100 TB the shuffle carries one partial per key per
    * partition instead of every raw pair.
    */
  def runAssociative[K, V](lines: Dataset[String], mapFn: String => Seq[(K, V)],
      combine: (V, V) => V)(implicit
      ek: Encoder[K], ev: Encoder[V], ekv: Encoder[(K, V)]): Dataset[(K, V)] =
    lines
      .flatMap(mapFn)
      .groupByKey(_._1)
      .mapValues(_._2)
      .reduceGroups(combine)

  /** Go `strings.Fields` (`dfs/wordcountjob.go:17`): split on whitespace
    * runs, no empty tokens. (Go splits on Unicode whitespace; Java `\s`
    * is the ASCII subset — identical on the corpus and fixtures.)
    */
  def fields(line: String): Seq[String] =
    line.split("\\s+").toIndexedSeq.filter(_.nonEmpty)

  /** Word count, reference job 1 (`dfs/wordcountjob.go:16-39`): map emits
    * `(token, "1")`, reduce sums int-parsed values back to a string.
    */
  val wordCountJob: MapReduceJob[String, String] = MapReduceJob(
    map = line => fields(line).map(w => (w, "1")),
    reduce = (k, vs) => (k, vs.map(_.toInt).sum.toString))

  /** Question percentage, reference job 2
    * (`dfs/questionpercentagejob.go:16-64`): key = fields 1 and 3 of the
    * ` +++$+++ `-delimited line joined by a space; value = "Q" iff the
    * utterance (field 4) contains '?'; reduce emits
    * `(100 * countQ) / total` with Go integer floor division and a '%'
    * suffix (`dfs/questionpercentagejob.go:54`).
    */
  val questionPercentageJob: MapReduceJob[String, String] = MapReduceJob(
    map = line => {
      val t = line.split(java.util.regex.Pattern.quote(" +++$+++ "))
      if (t.length < 5) Seq.empty
      else {
        val key = t(1) + " " + t(3)
        val v = if (t(4).contains("?")) "Q" else "NOT Q"
        Seq((key, v))
      }
    },
    reduce = (k, vs) => {
      val total = vs.size
      val q = vs.count(_ == "Q")
      (k, ((q * 100) / total).toString + "%")
    })

  /** Serialize results in the reference's KV-text sink format
    * `key <--> value` (`dfs/wordcountjob.go:217-221`).
    */
  def toKvLines(ds: Dataset[(String, String)]): Dataset[String] = {
    import ds.sparkSession.implicits._
    ds.map { case (k, v) => s"$k${graft.functions.KvDelim}$v" }
  }

  /** Parse KV-text lines back (`dfs/wordcountjob.go:51-68`). The
    * reference's parser *breaks* at the first line shorter than 4 bytes
    * (a bug — SURVEY.md §7); this one skips malformed lines instead.
    */
  def fromKvLines(ds: Dataset[String]): Dataset[(String, String)] = {
    import ds.sparkSession.implicits._
    ds.flatMap { line =>
      val i = line.indexOf(graft.functions.KvDelim)
      if (i < 0) None
      else Some((line.substring(0, i),
                 line.substring(i + graft.functions.KvDelim.length)))
    }
  }
}
