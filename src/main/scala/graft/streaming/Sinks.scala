package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.Storage

/** Streaming sinks that marry Structured Streaming to the engine's
  * lakehouse-lite storage verbs ([[graft.sources.Storage]]).
  *
  * Structured Streaming's own guarantee is end-to-end exactly-once
  * ONLY when the sink is idempotent per batch id (replayable source +
  * checkpointed offsets mean every failure re-delivers the same
  * `(batchId, rows)`); the stock file sink gets this from its own
  * commit log. [[sinkVersionedExactlyOnce]] gets it from the versioned
  * table's atomic manifest commit instead
  * ([[Storage.appendBatchIdempotent]]) — so the stream lands in a
  * table with TIME TRAVEL (`readVersioned` at any version), O(batch)
  * appends, and compare-and-swap against concurrent batch writers:
  * the production shape for continuously ingesting events or closed
  * SCD2 intervals into the corpus store.
  */
object Sinks {

  /** Start an exactly-once append of a streaming frame into versioned
    * table `name`. Restart-safe: a batch replayed after ANY crash —
    * including one that died between the table commit and the
    * streaming checkpoint update, the classic duplicate window — is
    * recognized by its batch id and skipped (spec-pinned by
    * kill-after-commit fixtures, including the corpus-ingest
    * composition). The claim is UNCONDITIONAL: replay detection rides
    * the manifest's monotone high-water batch id, so it survives
    * [[Storage.compactVersions]] and re-snapshots too — a checkpoint
    * restored from before a compaction still cannot double-append.
    * Readers see each micro-batch atomically as one new version.
    */
  def sinkVersionedExactlyOnce(ds: DataFrame, storage: Storage,
      name: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    ds.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (storage.appendBatchIdempotent(name, batch, id).isEmpty)
          // replayed batch: the TABLE write is skipped, but a stateful
          // query's state stores only commit when every partition of
          // the batch executes AND its row iterator drains to the end
          // (commit rides a CompletionIterator) — a skip that never
          // touches the frame would leave the operator state
          // un-advanced, and Spark validates exactly this
          // (STATE_STORE_COMMIT_VALIDATION_FAILED). Drain every
          // partition's iterator through a no-op full pass instead.
          batch.foreachPartition(
            (it: Iterator[org.apache.spark.sql.Row]) => it.foreach(_ => ()))
        ()
      }
      .trigger(trigger)
      .start()
}
