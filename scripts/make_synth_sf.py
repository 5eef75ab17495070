"""Synthesize a larger scale factor by FK-consistent replication.

Each replica i of the base tables shifts every key family (order,
customer, part, supplier, document, vector, event/user) by
i x (max_key + 1), so joins land exactly as in the base data and every
query's selectivity is preserved — row counts scale linearly, value
distributions stay identical. nation/region are dimension-stable and
are not replicated.

Usage:
    python scripts/make_synth_sf.py [replicas] [base_sf_dir] [out_dir]

Defaults: 10 replicas of /root/testdata/sf0.1 -> /tmp/sf1_synth
(~6M lineitem rows, a synthetic "sf1"), for validating the SCALE.md
claims one order of magnitude above the driver's bench SF.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pagerank_hadoop_spark.session import get_spark  # noqa: E402

# key column -> family; every column in a family shifts by the same
# stride so foreign keys stay aligned across replicas
FAMILIES = {
    "o_orderkey": "order", "l_orderkey": "order",
    "o_custkey": "cust", "c_custkey": "cust",
    "l_partkey": "part", "p_partkey": "part",
    "l_suppkey": "supp", "s_suppkey": "supp",
    "doc_id": "doc", "vec_id": "vec",
    "event_id": "event", "user_id": "user",
}

REPLICATED = (
    "customer supplier part orders lineitem events documents embeddings"
).split()
STABLE = ("region", "nation")


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1_synth"
    spark = get_spark("make-synth-sf")

    strides: dict[str, int] = {}
    for tbl in REPLICATED:
        df = spark.read.parquet(os.path.join(base, f"{tbl}.parquet"))
        for c in df.columns:
            fam = FAMILIES.get(c)
            if fam and fam not in strides:
                strides[fam] = int(
                    df.agg(F.max(c)).first()[0]
                ) + 1

    for tbl in STABLE:
        spark.read.parquet(os.path.join(base, f"{tbl}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{tbl}.parquet"))

    for tbl in REPLICATED:
        df = spark.read.parquet(os.path.join(base, f"{tbl}.parquet"))
        shifted = None
        for i in range(replicas):
            rep = df
            for c in df.columns:
                fam = FAMILIES.get(c)
                if fam:
                    rep = rep.withColumn(
                        c, F.col(c) + F.lit(i * strides[fam])
                    )
            shifted = rep if shifted is None else shifted.unionByName(rep)
        shifted.write.mode("overwrite").parquet(
            os.path.join(out, f"{tbl}.parquet")
        )
        print(tbl, "rows:", spark.read.parquet(os.path.join(out, f"{tbl}.parquet")).count())


if __name__ == "__main__":
    main()
