#!/usr/bin/env python3
"""Build the 10x scale-up probe corpus used by SCALING.md's measured table.

Replicates the sf0.1 fact tables 10x with shifted keys (events,
embeddings, documents, lineitem, orders; key shifts keep joins matched
within each replica) and copies the dimension tables unchanged. Run:

    python3 tools/make_10x.py [outdir=/tmp/graft10x]

then probe single queries with:

    SPARK_GRAFT_SF_DIR=/tmp/graft10x sbt "runMain graft.Bench <query> ..."

Notes for interpreting probe ratios (see SCALING.md):
- documents/embeddings replicas carry IDENTICAL text/vectors, so
  pair-based dedup ops see k^2 same-bucket growth (inherent to a
  duplicated corpus, not to the bucketing) and dedup-first pipelines
  collapse the replicas early.
- events.ts round-trips through DuckDB as micros TIMESTAMP (the nanos
  variant only exists in the driver-generated originals); Tables.events
  handles both.
"""
import os
import shutil
import sys

import duckdb


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft10x"
    sf = "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    reps = {
        "events": """SELECT event_id + i*100000000 AS event_id, ts,
                            user_id + i*10000000 AS user_id,
                            event_type, value, props""",
        "embeddings": """SELECT vec_id + i*10000000 AS vec_id,
                                embedding, label""",
        "documents": """SELECT doc_id + i*10000000 AS doc_id,
                               text, lang, source, n_chars""",
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
                      FROM '{sf}/{table}.parquet' CROSS JOIN range(10) r(i))
                TO '{out}/{table}.parquet' (FORMAT PARQUET)""")
        print(f"wrote {table}")
    for t in ["region", "nation", "customer", "supplier", "part"]:
        shutil.copy(f"{sf}/{t}.parquet", f"{out}/{t}.parquet")
    print(f"10x probe corpus ready at {out}")


if __name__ == "__main__":
    main()
