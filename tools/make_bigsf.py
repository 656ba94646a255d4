"""Generate a larger scale factor by FK-consistent replication of an
existing fixture directory (default: sf0.1 ×10 → "sf1").

The driver ships sf0.001/0.01/0.1 only; per-query benchmarking at
sf0.1 mostly measures Spark's ~0.15 s job-scheduling floor (VERDICT
r1). This tool scales the data so plan quality dominates: every table
is replicated ``factor`` times with all primary/foreign keys offset by
``replica * OFFSET`` consistently on both sides of each relationship,
so join cardinalities and per-key group sizes are preserved exactly
and every query's semantics carry over (outputs scale ~linearly).

Fixed-size dims (region, nation) are copied once — they are fixed at
every TPC-H scale factor by definition.

Usage: python tools/make_bigsf.py [src_dir] [dst_dir] [factor]
Writes parquet per table into dst (default /tmp/sfbig). Not committed;
regenerate on demand.
"""

from __future__ import annotations

import os
import sys

import duckdb

#: key-space stride between replicas — far above any sf0.1 key
OFFSET = 100_000_000

#: per-table key columns to offset (FK-consistent on both sides)
KEY_OFFSETS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

FIXED_DIMS = {"region", "nation"}


def make(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table, keys in KEY_OFFSETS.items():
        src_path = f"{src}/{table}.parquet"
        dst_path = f"{dst}/{table}.parquet"
        if table in FIXED_DIMS:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src_path}')) TO "
                f"'{dst_path}' (FORMAT PARQUET)"
            )
            continue
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src_path}')"
            ).fetchall()
        ]
        selects = []
        for r in range(factor):
            proj = ", ".join(
                f"({c} + {r * OFFSET}) AS {c}"
                if c in keys
                # preserve the fixture's TIMESTAMP(NANOS) physical type:
                # tables.load() special-cases the ns encoding
                else (
                    f"CAST(ts AS TIMESTAMP_NS) AS ts"
                    if table == "events" and c == "ts"
                    else c
                )
                for c in cols
            )
            selects.append(
                f"SELECT {proj} FROM read_parquet('{src_path}')"
            )
        # small row groups so Spark's scan planner can split the
        # single output file across cores (a 122880-row default group
        # leaves documents/embeddings as ONE task at any core count)
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{dst_path}' "
            "(FORMAT PARQUET, ROW_GROUP_SIZE 16384)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst_path}')"
        ).fetchone()[0]
        print(f"{table}: {n} rows", flush=True)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make(src, dst, factor)
