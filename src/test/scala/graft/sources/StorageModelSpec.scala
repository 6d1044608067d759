package graft.sources

import java.nio.file.Files

import graft.SparkTestBase

/** Model-based fuzz of the versioned-table commit protocol. A random
  * program of puts, appends, idempotent batch appends, replays,
  * compactions, rollbacks, and vacuums runs against BOTH the real
  * [[Storage]] and a trivial in-memory model (retained versions → row
  * sets). After every op, every read the storage offers must either
  * match the model exactly or refuse honestly:
  *
  *  - `versions` equals the model's retained version ids;
  *  - `readVersioned(latest)` and time travel to any retained version
  *    equal the model's content for that version;
  *  - `readVersionedSince(v)` either returns EXACTLY the rows added
  *    after `v` (success implies correctness — the content-equal
  *    `#base=` chain must never fabricate or drop a row, whatever
  *    compaction/rollback chain the program produced) or throws the
  *    documented refusal; and a successful since-read is only legal
  *    when no consumed row was rolled away;
  *  - a replayed batch id commits nothing (its junk rows would poison
  *    every later equality if it did).
  *
  * Hand-written fixtures pin each verb; this pins their COMPOSITIONS
  * — the chains (rollback → append → compact → vacuum → CDC diff) a
  * long-lived production table actually accumulates. Seeded, so a
  * failure replays deterministically.
  */
class StorageModelSpec extends SparkTestBase {
  import spark.implicits._

  test("commit-protocol fuzz: random op programs match the model or refuse honestly") {
    Seq(11L, 20260816L).foreach(fuzz)
  }

  private def fuzz(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val st = new Storage(spark,
      Files.createTempDirectory(s"graft-fuzz$seed-").toString)
    val name = s"fuzz$seed"
    def df(xs: Seq[Long]) = xs.map(Tuple1(_)).toDF("x")
    var nextRow = 0L
    def fresh(k: Int): Seq[Long] =
      (0 until k).map { _ => nextRow += 1; nextRow }
    // the model: retained versions in commit order, each with its
    // full row-set content
    var model = Vector.empty[(Long, Set[Long])]
    var nextBatch = 0L

    val r0 = fresh(2)
    model :+= ((st.putVersioned(name, df(r0)), r0.toSet))

    for (op <- 1 to 90) {
      rnd.nextInt(6) match {
        case 0 => // plain append
          val r = fresh(1 + rnd.nextInt(3))
          val v = st.appendVersioned(name, df(r))
          model :+= ((v, model.last._2 ++ r))
        case 1 => // idempotent batch append, a NEW batch id
          val r = fresh(1 + rnd.nextInt(2))
          val res = st.appendBatchIdempotent(name, df(r), nextBatch)
          assert(res.nonEmpty, s"seed=$seed op=$op: new batch must commit")
          model :+= ((res.get, model.last._2 ++ r))
          nextBatch += 1
        case 2 => // replay a past batch id: must be a no-op, junk rows
          // must never land (they would break every later equality)
          if (nextBatch > 0) {
            val replayId = (rnd.nextLong().abs) % nextBatch
            assert(st.appendBatchIdempotent(name,
              df(Seq(900000L + op)), replayId).isEmpty,
              s"seed=$seed op=$op: replay of batch $replayId must skip")
          }
        case 3 => // compaction (content-equal re-snapshot)
          val v = st.compactVersions(name)
          model :+= ((v, model.last._2))
        case 4 => // rollback to a random RETAINED version
          val (tv, tc) = model(rnd.nextInt(model.size))
          val v = st.rollbackVersioned(name, tv)
          model :+= ((v, tc))
        case 5 => // vacuum, keeping a random tail
          val keep = 1 + rnd.nextInt(model.size)
          st.vacuumVersions(name, keep)
          model = model.takeRight(keep)
      }

      // ---- invariants after every op ----
      assert(st.versions(name) == model.map(_._1),
        s"seed=$seed op=$op: retained versions diverged")
      // compare as sorted SEQUENCES, not sets: row values are unique
      // by construction, so a duplicate — the double-indexing failure
      // class the idempotent machinery exists to prevent — shows up
      // as a longer sequence instead of vanishing into a set
      def read(v: Long): Seq[Long] =
        st.readVersioned(name, v).collect().map(_.getLong(0))
          .sorted.toSeq
      assert(read(model.last._1) == model.last._2.toSeq.sorted,
        s"seed=$seed op=$op: latest content diverged")
      // time travel to a random retained version
      val (rv, rc) = model(rnd.nextInt(model.size))
      assert(read(rv) == rc.toSeq.sorted,
        s"seed=$seed op=$op: time travel to $rv")
      // CDC diff from a random retained version: success must be
      // exact; refusal must be the documented exception; success is
      // only legal when nothing consumed was rolled away
      val (av, ac) = model(rnd.nextInt(model.size))
      try {
        val got = st.readVersionedSince(name, av).collect()
          .map(_.getLong(0)).sorted.toSeq
        assert(ac.subsetOf(model.last._2),
          s"seed=$seed op=$op: since($av) succeeded after rows consumed " +
            "at that version were rolled away — it must refuse")
        assert(got == (model.last._2 -- ac).toSeq.sorted,
          s"seed=$seed op=$op: since($av) returned a wrong delta")
      } catch {
        case _: IllegalArgumentException => () // honest refusal
      }
    }
    // a vacuumed-away version refuses time travel (when any exists)
    val retained = model.map(_._1).toSet
    (1L until model.last._1).filterNot(retained).take(1).foreach { v =>
      intercept[IllegalArgumentException] { st.readVersioned(name, v) }
    }
    st.delete(name)
  }
}
