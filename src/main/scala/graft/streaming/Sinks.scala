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
    *
    * WRITER IDENTITY: the checkpoint location is passed as the
    * table's writer token, so the table is FENCED to this stream —
    * a different stream (a rebuilt checkpoint, a second query
    * pointed at the same table) fails its first append with an
    * actionable error instead of having its restarted batch ids
    * silently swallowed by the replay check; handover is the explicit
    * [[Storage.takeOverVersioned]]. Schema drift from the producer is
    * likewise refused at the write ([[Storage.appendBatchIdempotent]]'s
    * schema gate); pass `allowSchemaEvolution = true` to accept
    * widened batches (read them with `mergeSchema = true`).
    *
    * AUTO-MAINTENANCE: a long-lived stream's manifest grows one line
    * per batch and its history one version per batch. `compactEvery =
    * N` re-snapshots the table every N committed batches (manifest
    * back to one directory; O(table-bytes) rewrite, so pick N large
    * enough that the rewrite amortizes over the appends — the same
    * dial as any lakehouse OPTIMIZE cadence); `vacuumKeep = K` then
    * retains the last K versions and frees unreferenced directories
    * (O(listing) metadata work). Both run inside foreachBatch AFTER
    * the batch commit; a maintenance CAS lost to a concurrent writer
    * ([[graft.sources.ConcurrentCommitException]], the one retryable
    * condition) is skipped and retried at the next boundary, never
    * failing the stream — any OTHER maintenance failure fails the
    * stream loudly — and exactly-once is unaffected either way (the high
    * water rides every maintenance commit — kill-injection across an
    * auto-compaction boundary is spec-pinned). Keep `vacuumKeep`
    * larger than the longest concurrent time-travel reader AND than
    * any incremental consumer's lag: a CDC reader or index refresh
    * diffs from the version it last consumed, which must still be
    * retained (compaction alone is harmless to them — the `#base=`
    * content-equal chain lets [[Storage.readVersionedSince]] diff
    * straight through a re-snapshot).
    *
    * HOOK: `onBatchCommitted` runs AFTER a batch's table commit (and
    * after any auto-maintenance), with the committed batch id — the
    * hook a downstream consumer chains continuous work onto (e.g. a
    * periodic index refresh, [[graft.api.Corpus.sinkWithAnnRefresh]]).
    * It does NOT run for replayed (skipped) batches, so hook work is
    * exactly-once per batch id; an exception from it fails the stream
    * LOUDLY (the batch itself stays committed — on restart the batch
    * replays as a skip and the hook runs again at the next boundary,
    * which is self-healing for consumers like the index refresh that
    * always consume everything since their own checkpoint).
    */
  def sinkVersionedExactlyOnce(ds: DataFrame, storage: Storage,
      name: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 0, vacuumKeep: Int = 0,
      allowSchemaEvolution: Boolean = false,
      onBatchCommitted: Long => Unit = _ => ()): StreamingQuery = {
    require(compactEvery >= 0, s"compactEvery must be >= 0, got $compactEvery")
    require(vacuumKeep >= 0, s"vacuumKeep must be >= 0, got $vacuumKeep")
    ds.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val committed = storage.appendBatchIdempotent(name, batch, id,
          writer = checkpointDir,
          allowSchemaEvolution = allowSchemaEvolution)
        if (committed.isEmpty)
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
        // maintenance AFTER the commit, by BATCH count (deterministic
        // under replay: a skipped batch runs no maintenance twice)
        if (committed.nonEmpty && compactEvery > 0 &&
            (id + 1) % compactEvery == 0) {
          try {
            storage.compactVersions(name, writer = checkpointDir)
            if (vacuumKeep > 0)
              storage.vacuumVersions(name, vacuumKeep,
                writer = checkpointDir)
          } catch {
            // ONLY a lost CAS to a concurrent commit is best-effort
            // (the next boundary retries on the winner's manifest).
            // Any other failure — an invariant violation inside
            // compact/vacuum, a fence refusal after a hostile
            // takeover — fails the stream loudly; swallowing it would
            // hide a real defect at every boundary forever.
            case _: graft.sources.ConcurrentCommitException => ()
          }
        }
        if (committed.nonEmpty) onBatchCommitted(id)
        ()
      }
      .trigger(trigger)
      .start()
  }
}
