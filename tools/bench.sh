#!/bin/bash
# Reproducible bench: run graft.Bench in N fresh JVMs (default 5) and
# report the per-query MEDIAN across runs. Dev-only — the committed
# answer to run-to-run noise (BENCH_r06 showed ±20-40% swings on
# sub-2 s queries from single runs): any perf claim in a commit message
# must cite this runner's output, not a single Bench line.
#
# Usage: tools/bench.sh [N] (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_ONLY,
#        SPARK_GRAFT_CPUS — passed through to graft.Bench)
# Output: one JSON line (same shape as Bench's contract line) on
#         stdout, per-run lines and >20% spread warnings on stderr;
#         full map saved to bench_median.json (or
#         bench_median_partial.json under ONLY).
#
# Since round 10 Bench prints THREE lines (compact contract line first,
# sized for the driver's truncated capture; then shapes; then family
# subtotals) and keeps full precision in bench_last.json. Full runs
# take their per-run map from bench_last.json; ONLY-filtered runs (no
# bench_last write) parse the 3-decimal contract+shapes lines, which is
# plenty for focused iteration.
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-5}"

OUT="$(mktemp -d)"
trap 'rm -rf "$OUT"' EXIT
for i in $(seq 1 "$N"); do
  echo "[bench.sh] run $i/$N" >&2
  tools/run.sh graft.Bench 2>/dev/null | grep -E '"metric":"(total|shapes)"' > "$OUT/stdout$i.jsonl"
  if [ -z "${SPARK_GRAFT_ONLY:-}" ]; then
    python3 - "$OUT/stdout$i.jsonl" bench_last.json "$OUT/run$i.json" <<'PYEOF'
import json, sys
total = json.loads(open(sys.argv[1]).readline())
m = json.load(open(sys.argv[2]))  # full precision, all keys
json.dump({"queries": m, "sf": total.get("sf", "?")}, open(sys.argv[3], "w"))
PYEOF
  else
    python3 - "$OUT/stdout$i.jsonl" "$OUT/run$i.json" <<'PYEOF'
import json, sys
qs, sf = {}, "?"
for line in open(sys.argv[1]):
    d = json.loads(line)
    qs.update(d.get("queries", {}))
    sf = d.get("sf", sf)
json.dump({"queries": qs, "sf": sf}, open(sys.argv[2], "w"))
PYEOF
  fi
  tail -c 200 "$OUT/run$i.json" >&2; echo >&2
done

python3 - "$OUT" "$N" <<'PYEOF'
import json, sys, glob, statistics, os
runs = [json.load(open(p)) for p in sorted(glob.glob(sys.argv[1] + "/run*.json"))]
names = runs[0]["queries"].keys()
med, spread = {}, []
for q in names:
    ts = [r["queries"][q] for r in runs if r["queries"].get(q, -1) > 0]
    if not ts:
        med[q] = -1; continue
    med[q] = round(statistics.median(ts), 4)
    if min(ts) > 0 and (max(ts) - min(ts)) / min(ts) > 0.20:
        spread.append(f"{q}: median {med[q]:.3f} spread [{min(ts):.3f}, {max(ts):.3f}]")
total = round(sum(v for k, v in med.items() if k.startswith("q") and v > 0), 4)
line = {"metric": "total", "value": total, "unit": "sec", "queries": med,
        "sf": runs[0]["sf"], "runs": len(runs)}
fname = "bench_median_partial.json" if os.environ.get("SPARK_GRAFT_ONLY") else "bench_median.json"
open(fname, "w").write(json.dumps(med))
# the committed perf baseline: only FULL median runs may update it
# (graft.Bench itself writes single-run numbers to bench_last.json)
if not os.environ.get("SPARK_GRAFT_ONLY"):
    open("bench_full.json", "w").write(json.dumps(med))
for s in spread:
    print("[bench.sh] spread>20%: " + s, file=sys.stderr)
print(json.dumps(line))
PYEOF

# Gate every FULL baseline refresh (VERDICT r12 next-round #6): a
# >=1.4x AND >=0.25s regression vs the committed bench_full.json
# blocks the refresh — the new medians are parked in
# bench_full.rejected.json and the committed baseline restored —
# unless PERFGATE_ADJUDICATED=1, which records that PERF_NOTES.md
# carries an adjudication block for the regression (deliberate plan
# rewrites legitimately slow a family at toy scale; see round-13b).
if [ -z "${SPARK_GRAFT_ONLY:-}" ]; then
  if ! python3 tools/perfgate.py >&2; then
    if [ "${PERFGATE_ADJUDICATED:-0}" = "1" ]; then
      echo "[bench.sh] perfgate FAILED but PERFGATE_ADJUDICATED=1 — baseline refreshed; PERF_NOTES.md must adjudicate" >&2
    else
      cp bench_full.json bench_full.rejected.json
      git checkout -- bench_full.json
      # bench_median.json was already overwritten above — park the
      # refused medians there too and restore the accepted baseline,
      # so no bench_*.json a reader might consult holds refused
      # numbers (VERDICT r13 "what's wrong" #2).
      mv bench_median.json bench_median.rejected.json
      cp bench_full.json bench_median.json
      echo "[bench.sh] perfgate FAILED — refresh REFUSED (new medians in bench_full.rejected.json / bench_median.rejected.json; adjudicate in PERF_NOTES.md then re-run with PERFGATE_ADJUDICATED=1)" >&2
      exit 1
    fi
  fi
fi
