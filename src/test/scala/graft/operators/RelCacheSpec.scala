package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.SparkTestBase

class RelCacheSpec extends SparkTestBase {

  /** RDD ids currently persisted in the shared session's context. */
  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** The persisted RDD ids backing a localCheckpointed frame. */
  private def idsOf(df: DataFrame): Set[Int] = {
    val ids = scala.collection.mutable.Set.empty[Int]
    df.queryExecution.logical.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => ids += l.rdd.id
      case _ =>
    }
    ids.toSet
  }

  test("evictWhere frees the evicted entry's checkpoint blocks") {
    val cache = new RelCache[(SparkSession, String)](_._1, _._2)
    var builds = 0
    def build(): DataFrame = {
      builds += 1
      spark.range(100).toDF("x").localCheckpoint()
    }
    val df = cache.getOrBuild((spark, "/corpus/a"))(build())
    val ids = idsOf(df)
    assert(ids.nonEmpty, "localCheckpoint must register a persisted RDD")
    assert(ids.subsetOf(persistedIds), "blocks live while cached")
    // a second access is a hit, not a rebuild
    cache.getOrBuild((spark, "/corpus/a"))(build())
    assert(builds == 1)
    assert(cache.evictWhere(_._2 == "/corpus/a") == 1)
    assert(ids.intersect(persistedIds).isEmpty,
      "eviction must unpersist the checkpointed RDD")
    // an evicted key rebuilds on next use
    cache.getOrBuild((spark, "/corpus/a"))(build())
    assert(builds == 2)
  }

  test("the per-session LRU bound evicts the least recently used entry without killing handed-out frames") {
    val cache = new RelCache[(SparkSession, String)](_._1, _._2,
      maxPerSession = 2)
    def build(n: Int): DataFrame =
      spark.range(n).toDF("x").localCheckpoint()
    val a = cache.getOrBuild((spark, "a"))(build(1))
    val b = cache.getOrBuild((spark, "b"))(build(2))
    val aIds = idsOf(a)
    val bIds = idsOf(b)
    // touch a so b is now the LRU entry
    var rebuiltA = false
    cache.getOrBuild((spark, "a")) { rebuiltA = true; build(1) }
    assert(!rebuiltA, "a is cached; the touch must be a hit")
    val c = cache.getOrBuild((spark, "c"))(build(3))
    // automatic eviction drops only the map reference: the frame `b`
    // this test still holds (standing in for a caller mid-consumption)
    // must stay usable — its checkpoint blocks are the ContextCleaner's
    // to reclaim once the last reference is GC'd, never evictOne's
    assert(bIds.subsetOf(persistedIds),
      "auto-LRU eviction must not eagerly free a possibly-in-use checkpoint")
    assert(b.count() == 2L, "the handed-out frame must survive eviction")
    assert(aIds.subsetOf(persistedIds) && idsOf(c).subsetOf(persistedIds),
      "recently used entries keep their blocks")
    // b rebuilds on next use (the reference is gone from the map)
    var rebuiltB = false
    cache.getOrBuild((spark, "b")) { rebuiltB = true; build(2) }
    assert(rebuiltB)
    // the explicit verb DOES free eagerly — the caller-contract split
    cache.evictWhere(_._2 == "c")
    assert(idsOf(c).intersect(persistedIds).isEmpty,
      "explicit evictWhere must free the evicted entry's blocks")
  }

  test("RelCache.evictCorpus retires a corpus dir across every registered cache") {
    val c1 = new RelCache[(SparkSession, String)](_._1, _._2)
    val c2 = new RelCache[(SparkSession, String, String)](_._1, _._2)
    val d1 = c1.getOrBuild((spark, "/corpus/x"))(
      spark.range(10).toDF("x").localCheckpoint())
    val d2 = c2.getOrBuild((spark, "/corpus/x", "lists"))(
      spark.range(20).toDF("x").localCheckpoint())
    val keep = c1.getOrBuild((spark, "/corpus/y"))(
      spark.range(30).toDF("x").localCheckpoint())
    val freed = RelCache.evictCorpus(spark, "/corpus/x")
    assert(freed >= 2, s"both caches' /corpus/x entries must retire: $freed")
    assert(idsOf(d1).intersect(persistedIds).isEmpty)
    assert(idsOf(d2).intersect(persistedIds).isEmpty)
    assert(idsOf(keep).subsetOf(persistedIds),
      "another corpus's artifacts must survive")
    // the facade delegates to the same registry
    assert(graft.api.Corpus.evictCaches(spark, "/corpus/y") >= 1)
    assert(idsOf(keep).intersect(persistedIds).isEmpty)
  }

  test("AnnIndex.close frees the handle's centroid and list blocks") {
    import spark.implicits._
    val vecs = (0L until 64L).map(i =>
      (i, Array.tabulate(8)(j => ((i * 31 + j * 7) % 23 / 23.0f))))
      .toDF("vec_id", "embedding")
    val idx = graft.api.Corpus.buildAnnIndex(vecs)
    val ids = idsOf(idx.centroids) ++ idsOf(idx.lists)
    assert(ids.nonEmpty && ids.subsetOf(persistedIds))
    // the handle serves before close
    assert(idx.topK(vecs.filter($"vec_id" < 2), k = 3,
      excludeSelf = true).count() > 0)
    idx.close()
    assert(ids.intersect(persistedIds).isEmpty,
      "close() must unpersist the index artifacts")
  }
}
