#!/usr/bin/env python3
"""Round-over-round perf gate: diff the working-tree bench medians
against the last committed baseline and fail loudly on regressions.

Usage: tools/perfgate.py [--ref REF] [--cur FILE] [--ratio R] [--abs S]

Compares per-query medians in --cur (default bench_full.json, the
committed 3-JVM-median map tools/bench.sh maintains) against the same
file at --ref (default HEAD, i.e. "what the repo last shipped").
A query REGRESSES when  cur >= ratio * old  AND  cur - old >= abs
seconds — the two-sided guard keeps sub-second noise (PERF_NOTES
documents +/-20-40% single-run and ~15% median drift on tiny queries)
from crying wolf while still catching the real 1.5x-on-2s slides that
previously took manual archaeology (VERDICT r11 "What's missing" #4).

Output: every changed query sorted by ratio (worst first), a summary
line, exit 1 iff any regression. New/removed keys are reported but
never gate (suite growth is normal). Run after tools/bench.sh; wire
into the pre-commit ritual for any perf-touching change.
"""
import argparse, json, subprocess, sys

p = argparse.ArgumentParser()
p.add_argument("--ref", default="HEAD")
p.add_argument("--cur", default="bench_full.json")
p.add_argument("--ratio", type=float, default=1.4)
p.add_argument("--abs", dest="abs_s", type=float, default=0.25)
p.add_argument("--top", type=int, default=15, help="changed rows to print")
a = p.parse_args()

try:
    old = json.loads(subprocess.check_output(
        ["git", "show", f"{a.ref}:bench_full.json"], text=True))
except subprocess.CalledProcessError:
    print(f"[perfgate] no bench_full.json at {a.ref}; nothing to gate")
    sys.exit(0)
cur = json.load(open(a.cur))

common = [k for k in cur if k in old and cur[k] > 0 and old[k] > 0]
added = sorted(k for k in cur if k not in old)
removed = sorted(k for k in old if k not in cur)
rows = sorted(((cur[k] / old[k], k) for k in common), reverse=True)

regress = [(r, k) for r, k in rows
           if r >= a.ratio and cur[k] - old[k] >= a.abs_s]
improved = sum(1 for r, _ in rows if r <= 1 / a.ratio)

print(f"[perfgate] {len(common)} common keys vs {a.ref}"
      f" (+{len(added)} new, -{len(removed)} removed)")
for r, k in rows[:a.top]:
    mark = " <-- REGRESSION" if (r, k) in regress else ""
    print(f"  {r:5.2f}x  {k}: {old[k]:.3f} -> {cur[k]:.3f}{mark}")
if added:
    print(f"[perfgate] new keys (not gated): {', '.join(added)}")
if removed:
    print(f"[perfgate] removed keys: {', '.join(removed)}")

# empty-common guard: first baseline, wholesale renames, or all-zero
# medians leave nothing to compare — report and pass instead of
# crashing on median-of-empty / divide-by-zero
if not rows:
    print("[perfgate] no comparable keys; nothing to gate")
    sys.exit(0)

tot_old = sum(old[k] for k in common)
tot_cur = sum(cur[k] for k in common)
print(f"[perfgate] common-key total {tot_old:.1f} -> {tot_cur:.1f} s"
      f" ({tot_cur / tot_old:5.2f}x); median ratio"
      f" {sorted(r for r, _ in rows)[len(rows) // 2]:.2f};"
      f" {improved} improved >={a.ratio:.1f}x")
if regress:
    print(f"[perfgate] FAIL: {len(regress)} regression(s)"
          f" (>= {a.ratio}x and >= {a.abs_s}s):"
          f" {', '.join(k for _, k in regress)}")
    sys.exit(1)
print("[perfgate] OK")
