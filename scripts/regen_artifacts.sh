#!/bin/bash
# Regenerate the two registry-derived committed artifacts TOGETHER so
# they cannot drift from the registry or from each other (VERDICT r6
# task 3 — r5 and r6 both caught a stale/uncommitted BENCH_FULL.json):
#
#   PLANS.md        — full-registry plan-quality audit (plan_audit.py)
#   BENCH_FULL.json — full-registry per-query timings + rounds (bench.py)
#
# Run from anywhere; both land in the repo root. ~10-15 min total at
# the default SFs (plan audit at sf0.01, bench at sf0.1). After it
# finishes: git add PLANS.md BENCH_FULL.json and commit — `git status`
# must be clean on both before a round ends.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
echo "== plan audit (sf0.01) -> PLANS.md" >&2
python scripts/plan_audit.py > PLANS.md.tmp && mv PLANS.md.tmp PLANS.md
# snapshot the last COMMITTED rounds_total before bench overwrites the
# file (the working-tree copy may be the driver's post-round overwrite)
git show HEAD:BENCH_FULL.json > /tmp/bench_full_committed.json 2>/dev/null || echo '{}' > /tmp/bench_full_committed.json
echo "== full bench (sf0.1) -> BENCH_FULL.json" >&2
python bench.py 2>/dev/null | tail -1
# Silent-convergence-drift gate (VERDICT r7 task 5): a fixpoint query
# whose round count moved without a driver code change means the
# convergence behavior changed under it. Legitimate driver changes
# acknowledge the new counts with ROUNDS_DRIFT_OK=1.
python - <<'PY'
import json, os, sys
old = json.load(open("/tmp/bench_full_committed.json")).get("rounds_total", {})
new = json.load(open("BENCH_FULL.json")).get("rounds_total", {})
drift = {k: (old[k], new[k]) for k in old.keys() & new.keys() if old[k] != new[k]}
if drift:
    for k, (a, b) in sorted(drift.items()):
        print(f"ROUNDS DRIFT: {k}: {a} -> {b}", file=sys.stderr)
    if os.environ.get("ROUNDS_DRIFT_OK") != "1":
        print("fixpoint round counts moved vs committed BENCH_FULL.json;"
              " if a driver code change explains it, rerun with"
              " ROUNDS_DRIFT_OK=1", file=sys.stderr)
        sys.exit(1)
PY
n_reg=$(python -c "from pagerank_hadoop_spark import queries as q; print(len(q.queries()))")
n_bench=$(python -c "import json; print(json.load(open('BENCH_FULL.json'))['n_queries'])")
n_plans=$(grep -oE '[0-9]+ queries audited' PLANS.md | grep -oE '^[0-9]+' || echo 0)
echo "registry=$n_reg bench=$n_bench plans=$n_plans" >&2
if [ "$n_reg" != "$n_bench" ] || [ "$n_reg" != "$n_plans" ]; then
  echo "DRIFT: registry=$n_reg bench=$n_bench plans=$n_plans" >&2
  exit 1
fi
echo "OK: both artifacts cover all $n_reg registered queries" >&2
