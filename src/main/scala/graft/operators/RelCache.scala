package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for build-once relation artifacts (trained
  * centroids, inverted lists, shingle/signature/candidate relations,
  * BM25 postings). At 100 TB these artifacts are persisted offline
  * ONCE; within a suite/bench run this memo is that materialization.
  *
  * Guarantees the bare `TrieMap.getOrElseUpdate` pattern did not:
  *
  *  - the builder runs AT MOST ONCE per key — concurrent first access
  *    is serialized on a per-key lock, so a lost race can never orphan
  *    a `localCheckpoint`'s block-manager blocks (ScalaTest suites
  *    share one session across parallel specs);
  *  - entries whose owning session has stopped are purged on the next
  *    access of ANY key — their blocks died with the session's block
  *    manager, so dropping the map references is the whole cleanup —
  *    bounding growth across sessions in a long-lived JVM. Within one
  *    live session, entries are bounded by the corpus dirs actually
  *    touched (the intended working set: one index per corpus).
  *
  * `sessionOf` extracts the owning session from a key (keys embed the
  * session because a checkpointed value is only valid in the session
  * whose block manager holds it).
  */
private[graft] final class RelCache[K](sessionOf: K => SparkSession) {
  private val entries = new scala.collection.concurrent.TrieMap[K, DataFrame]
  private val locks = new scala.collection.concurrent.TrieMap[K, Object]

  def getOrBuild(key: K)(build: => DataFrame): DataFrame = {
    purgeStopped()
    entries.get(key) match {
      case Some(df) => df
      case None =>
        // TrieMap.getOrElseUpdate may build two lock Objects under a
        // race but returns the single winner to both threads, so both
        // synchronize on the same monitor and the DataFrame builder
        // (the expensive, checkpointing one) runs exactly once.
        val lock = locks.getOrElseUpdate(key, new Object)
        lock.synchronized(entries.getOrElseUpdate(key, build))
    }
  }

  private def purgeStopped(): Unit =
    entries.keysIterator.foreach { k =>
      if (sessionOf(k).sparkContext.isStopped) {
        entries.remove(k)
        locks.remove(k)
      }
    }
}
