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
echo "== full bench (sf0.1) -> BENCH_FULL.json" >&2
python bench.py 2>/dev/null | tail -1
n_reg=$(python -c "from pagerank_hadoop_spark import queries as q; print(len(q.queries()))")
n_bench=$(python -c "import json; print(json.load(open('BENCH_FULL.json'))['n_queries'])")
n_plans=$(grep -oE '[0-9]+ queries audited' PLANS.md | grep -oE '^[0-9]+' || echo 0)
echo "registry=$n_reg bench=$n_bench plans=$n_plans" >&2
if [ "$n_reg" != "$n_bench" ] || [ "$n_reg" != "$n_plans" ]; then
  echo "DRIFT: registry=$n_reg bench=$n_bench plans=$n_plans" >&2
  exit 1
fi
echo "OK: both artifacts cover all $n_reg registered queries" >&2
