"""Re-measure every pinned-value gate and verify/rewrite the _PINNED
block in queries.py.

The r8 gates pin measured sf0.01 quantities (ANN per-query recall@5,
simhash/embedding found-pair counts, SemDeDup resolved-pair counts)
directly in the oracle SQL, so any movement hash-reddens the driver
check. Those constants live in ONE marker-delimited block
(``# --- BEGIN PINNED GATES ---`` … ``# --- END PINNED GATES ---``)
in ``pagerank_hadoop_spark/queries.py``; this script is the only
supported way to change them:

    python scripts/repin_gates.py            # verify: exit 1 on drift
    REPIN_OK=1 python scripts/repin_gates.py # accept: rewrite block

A legitimate ANN-path change is therefore one re-run with REPIN_OK=1
instead of hand-editing four scattered dicts (r8 VERDICT task 3).
The script runs ONLY the Spark side (the measured quantity); the
oracle pins whatever this block says, so verify-mode drift means the
code now produces different numbers than the committed gates.
"""

from __future__ import annotations

import ast
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
QUERIES_PY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pagerank_hadoop_spark",
    "queries.py",
)
BEGIN = "# --- BEGIN PINNED GATES ---"
END = "# --- END PINNED GATES ---"
HEADER = """\
# Measured-at-sf0.01 constants the oracles pin (deterministic seeded /
# xxhash pipelines; any movement hash-reddens the driver check).
# Maintained by scripts/repin_gates.py: it re-measures every value and
# rewrites THIS block (REPIN_OK=1 to accept a legitimate change) —
# never hand-edit. Keys: "<query>.<field>" scalars and
# "ann_recall.<query>" per-q_id recall@5 dicts.
"""


def measure(pinned: dict) -> dict:
    """Run the Spark side of every pinned query at SF_DIR and return
    the freshly measured quantities, same key scheme as _PINNED."""
    import __spark_entry__ as entry
    from pagerank_hadoop_spark.session import get_spark

    spark = get_spark("repin-gates")
    qs = entry.queries()
    out: dict = {}
    for key in sorted(pinned):
        if key.startswith("ann_recall."):
            name = key.split(".", 1)[1]
            rows = qs[name](spark, SF_DIR).collect()
            out[key] = {int(r.q_id): float(r.recall) for r in rows}
        else:
            name, field = key.split(".", 1)
            row = qs[name](spark, SF_DIR).collect()
            assert len(row) == 1, f"{name}: expected 1 summary row"
            out[key] = int(row[0][field])
        print(f"measured {key} = {out[key]}", flush=True)
    return out


def render_block(values: dict) -> str:
    lines = [BEGIN, HEADER.rstrip("\n"), "_PINNED: dict = {"]
    for key in sorted(values):
        v = values[key]
        if isinstance(v, dict):
            body = ", ".join(f"{q}: {v[q]!r}" for q in sorted(v))
            lines.append(f'    "{key}": {{{body}}},')
        else:
            lines.append(f'    "{key}": {v!r},')
    lines += ["}", END]
    return "\n".join(lines)


def read_block(src: str) -> tuple[str, dict]:
    m = re.search(
        re.escape(BEGIN) + r"\n(.*?)" + re.escape(END), src, re.DOTALL
    )
    if not m:
        sys.exit(f"FATAL: pinned-gates markers not found in {QUERIES_PY}")
    block = m.group(0)
    dm = re.search(r"_PINNED: dict = (\{.*?\n\})", block, re.DOTALL)
    if dm is None:
        sys.exit(
            f"FATAL: pinned-gates markers found but no '_PINNED: dict ="
            f" {{...}}' header inside the block in {QUERIES_PY}"
        )
    return block, ast.literal_eval(dm.group(1))


def main() -> None:
    src = open(QUERIES_PY).read()
    old_block, pinned = read_block(src)

    measured = measure(pinned)

    drift = {
        k: (pinned.get(k), measured[k])
        for k in measured
        if measured[k] != pinned.get(k)
    }
    if not drift:
        print(f"OK: all {len(measured)} pinned gates match at {SF_DIR}")
        return
    for k, (old, new) in sorted(drift.items()):
        print(f"DRIFT {k}: pinned={old} measured={new}")
    if os.environ.get("REPIN_OK") != "1":
        sys.exit(
            f"FAIL: {len(drift)} pinned gate(s) drifted. If the change is"
            " intentional, re-run with REPIN_OK=1 to rewrite the block."
        )

    new_src = src.replace(old_block, render_block(measured), 1)
    with open(QUERIES_PY, "w") as f:
        f.write(new_src)
    # verify the rewrite round-trips
    _, reread = read_block(open(QUERIES_PY).read())
    assert reread == measured, "rewrite verification failed"
    print(
        f"REPINNED: wrote {len(drift)} changed gate(s) to {QUERIES_PY}."
        " Re-run scripts/check_oracle.py on the affected queries."
    )


if __name__ == "__main__":
    main()
