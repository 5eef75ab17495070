#!/bin/bash
# Same-box interleaved bench A/B of two git refs (the round-5 drift
# forensics, made repeatable): clones REF_A to a temp dir, runs
# `bench.py <headline queries>` alternating A, B, A, B with 3 timed
# passes per invocation (bench.py reports per-query MIN), and prints
# the four JSON lines. Interleaving controls for slow ambient drift;
# per-query deltas inside the same binary's run-to-run spread mean
# "environment", consistent one-sided deltas mean "code".
# CAVEAT (r9): the fixed A-then-B cell order turns a monotone ambient
# slope into a spurious one-sided delta — for SINGLE-query attribution
# run a second pass with the order reversed (SCALE.md round-9 note);
# multi-query sweeps amortize the slope across the cell and are fine.
#
# Usage: scripts/bench_ab.sh <ref_a> [queries...]   (B = worktree HEAD)
set -euo pipefail
REF_A="${1:?usage: bench_ab.sh <ref_a> [queries...]}"
shift
Q=("$@")
if [ ${#Q[@]} -eq 0 ]; then
  Q=(wiki_pagerank pagerank_topk ppr_from_part connected_components
     cosine_topk pq_topk stream_tumbling walk_skipgram_assoc)
fi
REPO="$(cd "$(dirname "$0")/.." && pwd)"
A_DIR="$(mktemp -d /tmp/bench_ab_XXXX)"
git clone -q "$REPO" "$A_DIR" && git -C "$A_DIR" checkout -q "$REF_A"
for i in 1 2; do
  echo "== $REF_A run$i"
  (cd "$A_DIR" && SPARK_GRAFT_BENCH_RUNS=3 python bench.py "${Q[@]}" 2>/dev/null)
  echo "== HEAD run$i"
  (cd "$REPO" && SPARK_GRAFT_BENCH_RUNS=3 python bench.py "${Q[@]}" 2>/dev/null)
done
rm -rf "$A_DIR"
