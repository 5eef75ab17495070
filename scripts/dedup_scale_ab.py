"""Decade stress for the two quadratic-worst-case exact dedup joins
(VERDICT r7 task 3): set_similarity_join (PPJoin prefix filter) and
containment_join (asymmetric prefix-vs-postings).

Measures, at two corpus scales a decade apart, with and without a
planted hub gram (one shared token appended to 10% of docs):

  - candidate-pair count (the quantity the prefix filter bounds)
  - the analytic candidate bound: sym  = sum_tok P_t*(P_t-1)/2,
                                  cont = sum_tok P_t*F_t
    (P_t = per-token PREFIX occurrences, F_t = full posting count)
  - verified output pairs and wall time of the full operator
  - hub-token forensics: its global df and how often it lands in a
    prefix (the rarity ordering is the defense — a token shared by
    10% of docs is only a prefix token for docs whose rare tail is
    thinner than the prefix window)

Two corpus families:
  zipf  — seeded synthetic docs over a 20k-word Zipf(1.5) vocabulary
          (Heaps-like df growth: the realistic 100 TB shape) at
          N=5000 and N=50000
  fixture — the driver documents table (31-word vocabulary: every
          token hot, the adversarial all-hot regime) at sf0.01 (500
          docs) and sf0.1 (5000 docs)

Usage: python scripts/dedup_scale_ab.py [zipf|fixture|all]
Prints one JSON line per (family, scale, plant) cell.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pagerank_hadoop_spark.session import get_spark  # noqa: E402
from pagerank_hadoop_spark.operators.dedup import (  # noqa: E402
    _rarity_sorted_sets,
    containment_candidates,
    containment_join,
    ppjoin_candidates,
    set_similarity_join,
)

HUB = "zzhubgram"
CAND_CAP = 40_000_000  # skip the full verify above this, log why


def zipf_corpus(spark, n_docs: int, plant: bool):
    rng = np.random.default_rng(42)
    v = 20_000
    toks = rng.zipf(1.5, size=(n_docs, 60)) % v
    rows = []
    for i in range(n_docs):
        words = " ".join(f"w{t:05d}" for t in toks[i])
        if plant and i % 10 == 0:
            words += " " + HUB
        rows.append((i, words))
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(32)


def fixture_corpus(spark, sf_dir: str, plant: bool):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    if plant:
        docs = docs.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 == 0, F.concat("text", F.lit(" " + HUB))
            ).otherwise(F.col("text")).alias("text"),
        )
    return docs


def prefix_stats(sets, t: float):
    prefix_len = F.col("sz") - F.ceil(F.col("sz") * F.lit(t)).cast("int") + 1
    prefixes = sets.select(
        "id", F.explode(F.slice("toks", 1, prefix_len)).alias("tok")
    )
    per_tok = prefixes.groupBy("tok").agg(F.count(F.lit(1)).alias("p"))
    full = sets.select(F.explode("toks").alias("tok")).groupBy("tok").agg(
        F.count(F.lit(1)).alias("f")
    )
    joined = per_tok.join(full, "tok")
    agg = joined.agg(
        F.sum(F.expr("p * (p - 1) / 2")).alias("bound_sym"),
        F.sum(F.expr("cast(p as double) * f")).alias("bound_cont"),
    ).first()
    hub = joined.where(F.col("tok") == HUB).first()
    return (
        int(agg.bound_sym or 0),
        int(agg.bound_cont or 0),
        (int(hub.p), int(hub.f)) if hub else (0, 0),
    )


def run_cell(spark, family: str, corpus, n_docs: int, plant: bool):
    out = {"family": family, "n_docs": n_docs, "plant": plant}
    sets = _rarity_sorted_sets(corpus, "text", "doc_id")

    for name, t, cand_fn, join_fn in (
        ("sym", 0.8, ppjoin_candidates, set_similarity_join),
        ("cont", 0.9, containment_candidates, containment_join),
    ):
        bound_sym, bound_cont, (hub_p, hub_f) = prefix_stats(sets, t)
        t0 = time.monotonic()
        n_cand = cand_fn(sets, t).count()
        t_cand = time.monotonic() - t0
        out[f"{name}_bound"] = bound_sym if name == "sym" else bound_cont
        out[f"{name}_cands"] = n_cand
        out[f"{name}_cand_sec"] = round(t_cand, 2)
        out[f"{name}_hub_prefix_count"] = hub_p
        out[f"{name}_hub_df"] = hub_f
        if n_cand <= CAND_CAP:
            t0 = time.monotonic()
            n_pairs = join_fn(corpus, threshold=t).count()
            out[f"{name}_pairs"] = n_pairs
            out[f"{name}_total_sec"] = round(time.monotonic() - t0, 2)
        else:
            out[f"{name}_pairs"] = None
            out[f"{name}_total_sec"] = None
            out[f"{name}_skipped"] = f"candidates > {CAND_CAP}"
    sets.unpersist()
    print(json.dumps(out), flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("dedup-scale-ab")
    spark.sparkContext.setLogLevel("ERROR")
    if which in ("zipf", "all"):
        for n in (5_000, 50_000):
            for plant in (False, True):
                run_cell(spark, "zipf", zipf_corpus(spark, n, plant), n, plant)
    if which in ("fixture", "all"):
        for sf, n in (("/root/testdata/sf0.01", 500), ("/root/testdata/sf0.1", 5000)):
            for plant in (False, True):
                run_cell(
                    spark, "fixture", fixture_corpus(spark, sf, plant), n, plant
                )


if __name__ == "__main__":
    main()
