"""Per-query profiling: split plan-BUILD time (Python/py4j driver work
in the query fn) from EXECUTION time (count action), optionally dump
.explain('formatted'). Usage:

    python scripts/profile_queries.py name [name ...]
    python scripts/profile_queries.py --top N     # N slowest from BENCH_FULL.json
    python scripts/profile_queries.py --plans DIR name ...  # also write plans

Prints one line per query: build_s exec_s total_s rounds name.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pagerank_hadoop_spark import queries as _registry
from pagerank_hadoop_spark import runtime_counters
from pagerank_hadoop_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
        os.makedirs(plans_dir, exist_ok=True)
    suffix = ""
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        args = args[:i] + args[i + 2 :]
    qs = _registry.queries()
    if args and args[0] == "--top":
        n = int(args[1])
        full = json.load(
            open(os.path.join(os.path.dirname(__file__), "..", "BENCH_FULL.json"))
        )
        names = [
            k
            for k, _ in sorted(
                full["queries"].items(), key=lambda kv: -kv[1]
            )[:n]
        ]
    else:
        names = args
    spark = get_spark("profile")
    # same engine warmup as bench.py so first-touch JIT is off-ledger
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_sf = os.environ.get("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")
    for name in names:
        try:
            qs[name](spark, warm_sf).count()
        except Exception as exc:
            # a failed warm-up means this query is profiled COLD (its
            # first timed row includes JIT/first-touch) — say so
            print(
                f"# WARN warm-up failed for {name}: "
                f"{type(exc).__name__} — profiled cold",
                file=sys.stderr,
            )
    print(f"{'build_s':>8} {'exec_s':>8} {'total_s':>8} {'rounds':>6}  name")
    for name in names:
        runtime_counters.reset()
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        t1 = time.time()
        n = df.count()
        t2 = time.time()
        rounds = runtime_counters.snapshot()["rounds"]
        print(
            f"{t1 - t0:8.3f} {t2 - t1:8.3f} {t2 - t0:8.3f} {rounds:6d}  {name} rows={n}",
            flush=True,
        )
        if plans_dir:
            p = os.path.join(plans_dir, f"{name}{suffix}.txt")
            with open(p, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                ))


if __name__ == "__main__":
    main()
