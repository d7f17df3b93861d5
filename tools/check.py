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

# DuckDB aggregate widenings that the driver's hasher canonicalizes
# differently from Spark's BIGINT/DOUBLE (e.g. list_sum -> HUGEINT
# hashed as "123.0" vs Spark's "123").  Any oracle emitting one of
# these WILL hash-mismatch at the driver even when values are
# cell-identical — fail locally, before the driver sees it.
BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER",
                       "USMALLINT", "UTINYINT")

def type_class(t):
    """Collapse a DuckDB type string to the equivalence class the
    driver's value-hasher distinguishes (int vs float vs str ...)."""
    t = t.upper()
    if t.startswith(("DECIMAL", "HUGEINT", "UHUGEINT")):
        return "wide"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.endswith("[]") or t.startswith(("LIST", "STRUCT", "MAP")):
        return "nested:" + t
    return t

def dtype_gate(con, name, sql, files):
    """Return a list of dtype-parity problems for one query: banned
    DuckDB widenings in the oracle output, and oracle-vs-Spark column
    type-class mismatches (strict, not str()-lenient)."""
    problems = []
    otypes = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
    stypes = {r[0]: r[1] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()}
    for col, t in sorted(otypes.items()):
        if any(t.upper().startswith(b) for b in BANNED_ORACLE_TYPES):
            problems.append(f"oracle col {col} has widened type {t} "
                            f"(cast it: driver hash canonicalizes {t} as float)")
    for col in sorted(set(otypes) & set(stypes)):
        oc, sc = type_class(otypes[col]), type_class(stypes[col])
        if oc != sc:
            problems.append(f"col {col}: oracle type {otypes[col]} ({oc}) "
                            f"!= spark type {stypes[col]} ({sc})")
    return problems

def lint(con, oracle):
    """Fast oracle-only gate: DESCRIBE-compile every oracle (catches
    SQL that DuckDB can't parse/bind BEFORE the driver's report does)
    and flag banned widened output types. No Spark output needed."""
    n_fail = 0
    for name in sorted(oracle):
        try:
            otypes = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle does not compile: {e}")
            n_fail += 1; continue
        bad = [f"{c}: {t}" for c, t, *_ in otypes
               if any(t.upper().startswith(b) for b in BANNED_ORACLE_TYPES)]
        if bad:
            print(f"FAIL {name}: DTYPE widened oracle output ({'; '.join(bad)})")
            n_fail += 1
        else:
            print(f"PASS {name} (compiles, {len(otypes)} cols)")
    print(f"== lint: {len(oracle) - n_fail} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    do_lint = "--lint" in sys.argv
    only = set(a for a in sys.argv[3:] if a != "--lint")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    if do_lint:
        lint(con, {k: v for k, v in oracle.items() if not only or k in only})
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
        try:
            dtype_problems = dtype_gate(con, name, oracle[name], files)
        except Exception as e:
            dtype_problems = [f"dtype gate error: {e}"]
        if dtype_problems:
            print(f"FAIL {name}: DTYPE {'; '.join(dtype_problems)}")
            n_fail += 1; continue
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
