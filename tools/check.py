#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run Verify's parquet
output against the DuckDB oracle and diff. Dev-only (NOT part of the
shipped Scala library).

Usage: tools/check.py <sfdir> <verify_outdir> [query ...]
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            err = os.path.join(outdir, name + ".err")
            msg = open(err).read().strip() if os.path.exists(err) else "no spark output"
            print(f"FAIL {name}: {msg}"); n_fail += 1; continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        want = want.reindex(sorted(want.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
            n_fail += 1; continue
        if want.shape != got.shape:
            print(f"FAIL {name}: shape want={want.shape} got={got.shape}")
            n_fail += 1; continue
        diffs = []
        for c in want.columns:
            w, g = want[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(w, g)):
                if a != b and not (a is None and b is None) and str(a) != str(b):
                    try:
                        import math
                        if isinstance(a, float) and isinstance(b, float):
                            if (math.isnan(a) and math.isnan(b)):
                                continue
                    except Exception:
                        pass
                    diffs.append((c, i, a, b))
        if diffs:
            print(f"FAIL {name}: {len(diffs)} cell diffs; first: col={diffs[0][0]} row={diffs[0][1]} want={diffs[0][2]!r} got={diffs[0][3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({want.shape[0]} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skip")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
