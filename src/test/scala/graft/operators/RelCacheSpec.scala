package graft.operators

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkTestBase

/** The population guards [[RelCache]] exists for: concurrent first
  * access must run the (expensive, checkpointing) builder exactly
  * once — a lost race would orphan a localCheckpoint's blocks in the
  * block manager for the life of the session.
  */
class RelCacheSpec extends SparkTestBase {
  import spark.implicits._

  test("concurrent first access builds once; all callers get the same frame") {
    val cache = new RelCache[(org.apache.spark.sql.SparkSession, String)](_._1)
    val builds = new AtomicInteger(0)
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[org.apache.spark.sql.DataFrame] {
          def call(): org.apache.spark.sql.DataFrame = {
            gate.await()
            cache.getOrBuild((spark, "corpus-a")) {
              builds.incrementAndGet()
              Seq(1L, 2L, 3L).toDF("v").localCheckpoint()
            }
          }
        })
      }
      gate.countDown()
      val frames = futures.map(_.get(120, TimeUnit.SECONDS))
      assert(builds.get() == 1,
        s"builder ran ${builds.get()} times under 8-way first access")
      // every caller got the one built frame (same checkpointed plan)
      assert(frames.map(_.queryExecution.logical).distinct.size == 1)
      assert(frames.head.collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L, 3L))
    } finally pool.shutdownNow()
  }

  test("distinct keys build independently; repeat access is a pure hit") {
    val cache = new RelCache[(org.apache.spark.sql.SparkSession, String)](_._1)
    val builds = new AtomicInteger(0)
    def get(d: String) = cache.getOrBuild((spark, d)) {
      builds.incrementAndGet()
      Seq(d.length.toLong).toDF("v").localCheckpoint()
    }
    val a1 = get("a"); val b1 = get("bb"); val a2 = get("a")
    assert(builds.get() == 2)
    assert(a1 eq a2, "repeat access must return the cached instance")
    assert(b1.collect().head.getLong(0) == 2L)
  }
}
