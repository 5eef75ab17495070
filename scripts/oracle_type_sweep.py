"""Sweep every oracle for DuckDB result types the driver renders
differently from Spark's (VERDICT r2 "What's wrong" #1).

DuckDB's integer aggregates widen: ``SUM(INTEGER) -> HUGEINT``
(int128). The driver's fetch/normalize path renders HUGEINT
differently from Spark's BIGINT, so an uncast integer SUM hash-
mismatches even when the values are equal (the one red r2 row,
``json_badrecords``). This script DESCRIBEs each oracle (no data
read) and flags any output column with a type Spark cannot produce:
HUGEINT/UHUGEINT and the unsigned family.

Usage: python scripts/oracle_type_sweep.py  (exit 1 if any flagged)
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

BAD_TYPES = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"}


def main() -> None:
    from pagerank_hadoop_spark import queries as Q

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    flagged = 0
    errors = 0
    for name, sql in sorted(Q.oracle_sql().items()):
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as exc:  # noqa: BLE001 — report and continue
            errors += 1
            print(f"{name:36s} DESCRIBE-ERROR {type(exc).__name__}: {exc}")
            continue
        bad = [
            (col, typ)
            for col, typ, *_ in rows
            if typ.split("(")[0].upper() in BAD_TYPES
        ]
        if bad:
            flagged += 1
            print(f"{name:36s} {bad}")
    print(f"-- swept {len(Q.oracle_sql())} oracles: {flagged} flagged, {errors} errors")
    sys.exit(1 if (flagged or errors) else 0)


if __name__ == "__main__":
    main()
