#!/usr/bin/env python3
"""Synthesize a scaled-up testdata dir from sf0.1 by K-fold replication
(dev-only; the driver provides sf{0.001,0.01,0.1} only). Fact-table keys
are OFFSET per copy so join fan-out and group cardinality scale
linearly, like real data; dimension tables (region, nation) stay 1x,
exactly the 100 TB shape (broadcast dims, scaled facts).

Content columns:
- documents.text is replicated VERBATIM: each doc becomes a K-exact-copy
  cluster, deliberately stressing the dedup paths' caps (q30 exact
  groups, q31/q38 64-representative bucket caps).
- embeddings get a per-copy nudge on dimension 0 (distinct vectors, but
  near-duplicate clusters of K) — stresses the LSH band caps and the
  exact-verify stage rather than letting identical vectors alias.

Usage: tools/mksf.py [src=/root/testdata/sf0.1] [dst=/tmp/sf1] [K=10]
"""
import sys
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

con = duckdb.connect()
con.execute(f"CREATE TABLE copies AS SELECT range AS c FROM range({K})")

# table -> columns to offset by c * (1 + max(key)) of the source table
OFFSET = {
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

import os
os.makedirs(dst, exist_ok=True)
for t, keys in OFFSET.items():
    p = f"{src}/{t}.parquet"
    if not keys:  # dimensions stay 1x
        con.execute(f"COPY (SELECT * FROM read_parquet('{p}')) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows (1x dim)")
        continue
    desc = con.execute(f"DESCRIBE SELECT * FROM read_parquet('{p}')").fetchall()
    strides = {k: con.execute(f"SELECT 1 + max({k}) FROM read_parquet('{p}')").fetchone()[0]
               for k in keys}
    cols = []
    for name, typ, *_ in desc:
        if name in keys:
            cols.append(f"CAST({name} + c * {strides[name]} AS {typ}) AS {name}")
        elif t == "events" and name == "ts":
            # keep whatever dtype the driver fixture carries (since the
            # 2026-08 refresh: TIMESTAMP_MICROS; DuckDB COPY preserves
            # it). The engine's Tables.eventMicros dispatches on the
            # bound dtype, so no defensive rewrite is needed here.
            cols.append("ts")
        elif t == "embeddings" and name == "embedding":
            # distinct-but-near copies: +0.003*c on dim 0 only
            cols.append(
                "CAST(list_concat([embedding[1] + CAST(0.003 * c AS FLOAT)],"
                " embedding[2:]) AS FLOAT[]) AS embedding")
        else:
            cols.append(name)
    con.execute(f"""COPY (SELECT {', '.join(cols)}
                    FROM read_parquet('{p}') CROSS JOIN copies
                    ORDER BY {keys[0]})
                    TO '{dst}/{t}.parquet' (FORMAT PARQUET)""")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows ({K}x, offset {keys})")
print(f"wrote {dst}")
