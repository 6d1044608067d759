package graft

/** The engine's user-facing library surface, in one place.
  *
  * A user of the reference system
  * (`bpatrickporter/dfs-w-mapreduce`) maps onto this library as:
  *
  *  - **storage verbs** (`put`/`get`/`delete`/`ls`/`info`, text or
  *    parquet/csv/json, partitioned or bucketed) →
  *    [[graft.sources.Storage]];
  *  - **MapReduce jobs** (the `Map`/`Reduce` binary contract) →
  *    [[graft.operators.MapReduceJob]] run by
  *    [[graft.operators.MapReduce.run]] (general) /
  *    [[graft.operators.MapReduce.runAssociative]] (map-side partials);
  *    the `" <--> "` KV codec lives in
  *    [[graft.operators.MapReduce.toKvLines]]/`fromKvLines`;
  *  - **relational queries** → plain `DataFrame`/`spark.sql`, with the
  *    engine's native functions registered by [[graft.GraftSession]] /
  *    [[graft.GraftExtensions]] (`rolling_hash`, `simhash`,
  *    `minhash_sig`, `word_shingles_3`, `hyperplane_buckets`, `dot_f`,
  *    …);
  *  - **corpus / training-data ops** (normalize, quality, fingerprint,
  *    exact + incremental dedup — optionally bloom-prefiltered — LSH
  *    near-dup pairs, chunking, cosine/PQ/kNN top-k, contrastive pair
  *    mining) → [[graft.api.Corpus]] (+ fluent `Corpus.implicits`);
  *  - **temporal / streaming ops** (as-of join, sessionization batch +
  *    streaming, streaming exact/near dedup) → [[graft.api.Events]];
  *    streaming ANN serving → [[graft.streaming.VecStreams.annServe]];
  *  - **scale machinery** → [[graft.operators.Percentiles.exactSelect]]
  *    (distributed-selection percentiles),
  *    [[graft.plans.TopK.perGroup]] (bounded-heap top-k, custom
  *    physical operator), [[graft.operators.SkewJoin.salted]],
  *    [[graft.operators.RangeJoin.binned]],
  *    [[graft.sources.Storage.putBucketed]] (exchange-free joins).
  *
  * Every operator family is certified by the DuckDB oracle gate
  * (`SparkEntry` registry — see COVERAGE.md) and the ScalaTest suite.
  */
package object api
