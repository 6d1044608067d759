#!/usr/bin/env python3
"""Build scale-up probe corpora for SCALING.md's measured tables.

Two modes over the sf0.1 corpus:

- replica (default): replicate the fact tables N x with shifted keys
  (events, embeddings, documents, lineitem, orders; key shifts keep
  joins matched within each replica) and copy the dimension tables
  unchanged. Replicated documents/embeddings carry IDENTICAL
  text/vectors, so pair-based dedup ops see k^2 same-bucket growth --
  inherent to a duplicated corpus, not to the bucketing. Good for
  "what does redelivery/duplication do" probes.

- distinct (--distinct): same key shifts, but each replica's content is
  put through a replica-keyed bijection so replicas are NOT near-dups
  of each other while within-replica structure is preserved exactly:
    * documents: every word gets an "x<i>" suffix (a bijective token
      renaming -- no sf0.1 word contains 'x', so the map is collision-
      free; Jaccard/minhash/simhash relations WITHIN a replica are
      unchanged; ACROSS replicas shingle overlap is zero). The suffix
      is ALPHANUMERIC on purpose: an earlier "_<i>" suffix made every
      suffixed word invisible to the ^[A-Za-z0-9]+$ vocabulary filter
      the BPE family uses, so their 100x rows measured the corpus scan
      over an EMPTY vocabulary -- a probe artifact, fixed here;
    * embeddings: dims circular-shifted by i and sign-flipped by a
      hash of (i, dim) -- an orthogonal transform, so within-replica
      cosines are bit-preserved while cross-replica pairs decorrelate.
  This is the "N independent corpora of the same nature" shape -- the
  right model for a 100x distinct-row scale probe.

Run:

    python3 tools/make_10x.py [outdir] [factor] [--distinct]
    # e.g. the SCALING.md 100x ladder corpus:
    python3 tools/make_10x.py /tmp/graft100x 100 --distinct

then probe single queries with:

    SPARK_GRAFT_SF_DIR=<outdir> sbt "runMain graft.Bench <query> ..."

Notes for interpreting probe ratios (see SCALING.md):
- events.ts round-trips through DuckDB as micros TIMESTAMP (the nanos
  variant only exists in the driver-generated originals); Tables.events
  and EventStreams.readEventStream handle both.
"""
import os
import shutil
import sys

import duckdb

DIM = 64  # embedding dims in the driver corpus


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    distinct = "--distinct" in sys.argv
    out = args[0] if len(args) > 0 else "/tmp/graft10x"
    factor = int(args[1]) if len(args) > 1 else 10
    sf = "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    if distinct:
        doc_text = r"""regexp_replace(text, '(\w+)',
                         '\1x' || CAST(i AS VARCHAR), 'g')"""
        documents = f"""SELECT doc_id + i*10000000 AS doc_id,
                               {doc_text} AS text, lang, source,
                               CAST(length({doc_text}) AS BIGINT) AS n_chars"""
        embeddings = f"""SELECT vec_id + i*10000000 AS vec_id,
                                list_transform(range({DIM}), j ->
                                  CAST(embedding[((j + i) % {DIM}) + 1] *
                                    (CASE WHEN hash(i * 1000003 + j) % 2 = 0
                                          THEN 1 ELSE -1 END) AS FLOAT))
                                  AS embedding,
                                label"""
    else:
        documents = """SELECT doc_id + i*10000000 AS doc_id,
                              text, lang, source, n_chars"""
        embeddings = """SELECT vec_id + i*10000000 AS vec_id,
                               embedding, label"""

    reps = {
        "events": """SELECT event_id + i*100000000 AS event_id, ts,
                            user_id + i*10000000 AS user_id,
                            event_type, value, props""",
        "embeddings": embeddings,
        "documents": documents,
        "lineitem": """SELECT l_orderkey + i*100000000 AS l_orderkey,
                              l_partkey, l_suppkey, l_linenumber,
                              l_quantity, l_extendedprice, l_discount,
                              l_tax, l_returnflag, l_linestatus,
                              l_shipdate""",
        "orders": """SELECT o_orderkey + i*100000000 AS o_orderkey,
                            o_custkey, o_orderstatus, o_totalprice,
                            o_orderdate, o_orderpriority""",
    }
    for table, select in reps.items():
        con.execute(
            f"""COPY ({select}
                      FROM '{sf}/{table}.parquet'
                      CROSS JOIN range({factor}) r(i))
                TO '{out}/{table}.parquet' (FORMAT PARQUET)""")
        print(f"wrote {table}")
    for t in ["region", "nation", "customer", "supplier", "part"]:
        shutil.copy(f"{sf}/{t}.parquet", f"{out}/{t}.parquet")
    mode = "distinct" if distinct else "replica"
    print(f"{factor}x {mode} probe corpus ready at {out}")


if __name__ == "__main__":
    main()
