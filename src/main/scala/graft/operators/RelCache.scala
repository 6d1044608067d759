package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

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
  *    bounding growth across sessions in a long-lived JVM;
  *  - WITHIN a live session growth is bounded too: the cache holds at
  *    most [[RelCache.MaxEntriesPerSession]] entries per session in
  *    least-recently-used order — a long-lived production session
  *    cycling through many corpora no longer pins every index it ever
  *    built (the round-9 GC diagnosis: these working sets are real
  *    storage, not just map references). Automatic LRU eviction drops
  *    only the MAP REFERENCE: a frame the cache already handed out may
  *    still be mid-consumption, and a local checkpoint cannot
  *    recompute, so the blocks are left to the ContextCleaner (freed
  *    when the last reference to the checkpointed RDD is GC'd). Only
  *    the explicit verbs ([[evictWhere]], [[RelCache.evictCorpus]],
  *    handle `close()`) free blocks eagerly — their caller contract is
  *    "this corpus is done". The default bound is sized for "every
  *    index family over a handful of concurrently-hot corpora"; a
  *    suite touching 2–3 corpus dirs never evicts.
  *
  * Callers that KNOW a corpus is done (the fluent API handles'
  * `close()`, a bench teardown) evict eagerly via [[evictWhere]].
  *
  * `sessionOf` extracts the owning session from a key (keys embed the
  * session because a checkpointed value is only valid in the session
  * whose block manager holds it); `dirOf` extracts the corpus dir, the
  * retirement unit [[RelCache.evictCorpus]] frees across every cache.
  */
private[graft] final class RelCache[K](sessionOf: K => SparkSession,
    dirOf: K => String,
    maxPerSession: Int = RelCache.MaxEntriesPerSession) {
  private val entries = new scala.collection.concurrent.TrieMap[K, DataFrame]
  private val locks = new scala.collection.concurrent.TrieMap[K, Object]
  // LRU clock: bump on every hit/build; evict the per-session minimum
  private val ticks = new scala.collection.concurrent.TrieMap[K, Long]
  private val clock = new java.util.concurrent.atomic.AtomicLong(0L)
  RelCache.register(this)

  def getOrBuild(key: K)(build: => DataFrame): DataFrame = {
    purgeStopped()
    val df = entries.get(key) match {
      case Some(v) =>
        // bump the LRU tick BEFORE returning: were it bumped after,
        // a concurrent insert's bound check could see this entry as
        // the per-session minimum and evict the frame just handed out
        ticks.put(key, clock.incrementAndGet()); v
      case None =>
        // TrieMap.getOrElseUpdate may build two lock Objects under a
        // race but returns the single winner to both threads, so both
        // synchronize on the same monitor and the DataFrame builder
        // (the expensive, checkpointing one) runs exactly once.
        val lock = locks.getOrElseUpdate(key, new Object)
        lock.synchronized {
          val v = entries.getOrElseUpdate(key, build)
          ticks.put(key, clock.incrementAndGet())
          v
        }
    }
    boundSession(key)
    df
  }

  /** Evict every entry matching `pred`, freeing its checkpoint blocks.
    * Returns the number of entries evicted. Safe to call while other
    * keys are being built; an evicted key simply rebuilds on next use.
    * (The caller contract: don't evict a corpus another thread is
    * actively serving — an already-handed-out DataFrame dies with its
    * blocks.)
    */
  def evictWhere(pred: K => Boolean): Int = {
    val victims = entries.keysIterator.filter(pred).toSeq
    victims.foreach(evictOne(_, free = true))
    victims.size
  }

  private[graft] def evictCorpus(session: SparkSession, dir: String): Int =
    evictWhere(k => (sessionOf(k) eq session) && dirOf(k) == dir)

  private def evictOne(k: K, free: Boolean): Unit =
    entries.remove(k).foreach { df =>
      locks.remove(k); ticks.remove(k)
      if (free && !sessionOf(k).sparkContext.isStopped)
        RelCache.freeLocalCheckpoint(df)
    }

  private def boundSession(key: K): Unit = {
    val s = sessionOf(key)
    while (entries.keysIterator.count(k => sessionOf(k) eq s) > maxPerSession) {
      val lru = entries.keysIterator.filter(k => sessionOf(k) eq s)
        .minBy(k => ticks.getOrElse(k, 0L))
      // AUTOMATIC eviction only drops the map reference — a caller the
      // cache handed this frame to may still be consuming it (a local
      // checkpoint cannot recompute, so eager freeing would fail that
      // caller with missing blocks). The blocks are reclaimed by the
      // ContextCleaner once the last reference to the checkpointed RDD
      // is garbage-collected. Eager freeing is reserved for the
      // EXPLICIT verbs (evictWhere / evictCorpus / handle close()),
      // whose caller contract is "the corpus is done".
      evictOne(lru, free = false)
    }
  }

  private def purgeStopped(): Unit =
    entries.keysIterator.foreach { k =>
      if (sessionOf(k).sparkContext.isStopped) {
        entries.remove(k)
        locks.remove(k)
        ticks.remove(k)
      }
    }
}

private[graft] object RelCache {

  /** Per-session LRU entry bound. Each entry is one checkpointed index
    * artifact (centroids, inverted lists, a candidate relation, a
    * postings table); the engine defines ~30 cached families, so 64
    * comfortably holds every family for two concurrently-hot corpora
    * while guaranteeing a corpus-cycling session's storage working set
    * stays flat.
    */
  val MaxEntriesPerSession = 64

  // every RelCache instance is a static val in an operator object, so
  // this registry is a fixed ~7-element set, never a leak
  private val instances =
    new scala.collection.concurrent.TrieMap[RelCache[_], Unit]

  private def register(c: RelCache[_]): Unit = instances.put(c, ())

  /** Retire a corpus: evict every cached index artifact any operator
    * family built for `(session, dir)` and free its checkpoint blocks —
    * the explicit form of the LRU bound, for sessions that KNOW a
    * corpus is done (suite teardown, a pipeline moving to the next
    * day's partition). Returns the number of artifacts freed. Exposed
    * on the fluent API as `graft.api.Corpus.evictCaches`.
    */
  def evictCorpus(session: SparkSession, dir: String): Int =
    instances.keysIterator.map(_.evictCorpus(session, dir)).sum

  /** Free the block-manager blocks behind a `localCheckpoint`ed
    * DataFrame: walk its logical plan for the [[LogicalRDD]] leaves a
    * checkpoint materializes into and unpersist their RDDs. After this
    * the DataFrame must not be used again (a local checkpoint cannot
    * recompute) — callers evict the reference in the same motion.
    * Non-blocking: block removal proceeds asynchronously.
    */
  def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ =>
    }
}
