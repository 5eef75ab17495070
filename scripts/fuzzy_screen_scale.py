"""Decade scaling attribution for fuzzy_contamination_screen
(VERDICT r12 task 5): the screen's three stages — MinHash SIGNATURE
computation, LSH BAND JOIN, exact-Jaccard VERIFY — timed separately
at sf0.1 (5k docs) and the 10x FK-replicated /tmp/sf1_synth (50k
docs), with the BENCHMARK SIDE HELD FIXED (the base replica's
doc_id % 97 == 0 slice) so the measured axis is corpus growth, the
100 TB question. The broadcast design predicts linear-in-corpus for
all three stages; superlinearity in band-join or verify would flag
a candidate blow-up the broadcast economy does not cover.

Note on the synth corpus: FK replication copies TEXT verbatim, so a
10x corpus carries every benchmark text 10x (replica copies of the
% 97 == 0 docs land in the corpus) plus 10x planted leaks — true
positives grow linearly BY CONSTRUCTION, which is exactly the
prediction under test for the verify stage.

Usage: python scripts/fuzzy_screen_scale.py
Prints one JSON line per (scale, stage) cell plus a summary row.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pagerank_hadoop_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
SYNTH = "/tmp/sf1_synth"
STRIDE = None  # base max doc_id + 1, resolved at run time


def corpus_and_bench(spark, sf_dir: str, stride: int):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # FIXED benchmark: the BASE replica's slice only, at every scale
    bench = docs.where(
        (F.col("doc_id") % 97 == 0) & (F.col("doc_id") < stride)
    ).select("doc_id", "source", "text")
    leaked = bench.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        "source",
        F.concat(F.col("text"), F.lit(" benchmark leak tail")).alias("text"),
    )
    corpus = (
        docs.where(F.col("doc_id") % 97 != 0)
        .select("doc_id", "source", "text")
        .unionByName(leaked)
    )
    return corpus, bench


def staged_run(spark, sf_dir: str, stride: int, label: str):
    """fuzzy_contaminated_pairs (operators/curation.py:227) unrolled
    into its three stages so each gets its own wall clock; the plan
    per stage is identical to the operator's (same kernels, same
    broadcast, same checkpoint boundaries)."""
    from pagerank_hadoop_spark.operators.curation import (
        fuzzy_contaminated_pairs,
    )
    from pagerank_hadoop_spark.operators.dedup import (
        _band_cols,
        _minhash_sig_arrow,
        md5_shingle_hashes,
    )

    num_hashes, bands, shingle_n, threshold = 32, 4, 5, 0.7
    corpus, bench = corpus_and_bench(spark, sf_dir, stride)
    sig_kernel = _minhash_sig_arrow(num_hashes)

    def sigs(df, out_id):
        return df.select(
            F.col("doc_id").alias(out_id),
            md5_shingle_hashes(F.col("text"), shingle_n).alias("sh"),
        ).select(out_id, "sh", sig_kernel(F.col("sh")).alias("sig"))

    rows = []

    t0 = time.monotonic()
    corp = sigs(corpus, "doc_id").localCheckpoint(eager=True)
    n_corp = corp.count()
    t_sig_c = time.monotonic() - t0
    t0 = time.monotonic()
    bsig = sigs(bench, "bench_id").localCheckpoint(eager=True)
    n_bench = bsig.count()
    t_sig_b = time.monotonic() - t0
    rows.append(dict(scale=label, stage="signature", wall=round(t_sig_c, 3),
                     wall_bench_side=round(t_sig_b, 3),
                     corpus_docs=n_corp, bench_docs=n_bench))

    bcols = _band_cols(num_hashes, bands)
    banded_c = corp.select(
        "doc_id", F.posexplode(F.array(*bcols)).alias("band", "bh")
    )
    banded_b = bsig.select(
        "bench_id", F.posexplode(F.array(*bcols)).alias("band", "bh")
    )
    t0 = time.monotonic()
    cand = (
        banded_c.join(F.broadcast(banded_b), ["band", "bh"])
        .select("doc_id", "bench_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_cand = cand.count()
    t_band = time.monotonic() - t0
    rows.append(dict(scale=label, stage="band_join", wall=round(t_band, 3),
                     candidates=n_cand))

    t0 = time.monotonic()
    verified = (
        cand.join(corp.select("doc_id", "sh"), "doc_id")
        .join(
            F.broadcast(bsig.select("bench_id", F.col("sh").alias("sh_b"))),
            "bench_id",
        )
        .select(
            "doc_id",
            "bench_id",
            F.size(F.array_intersect("sh", "sh_b")).alias("__i"),
            F.size("sh").alias("__na"),
            F.size("sh_b").alias("__nb"),
        )
        .where(
            F.col("__i")
            >= F.lit(threshold) * (F.col("__na") + F.col("__nb") - F.col("__i"))
        )
    )
    n_ver = verified.count()
    t_ver = time.monotonic() - t0
    rows.append(dict(scale=label, stage="verify", wall=round(t_ver, 3),
                     verified_pairs=n_ver))

    # cross-check: the packaged operator agrees on the verified count
    n_op = fuzzy_contaminated_pairs(corpus, bench,
                                    threshold=threshold).count()
    rows.append(dict(scale=label, stage="operator_crosscheck",
                     operator_pairs=n_op, staged_pairs=n_ver,
                     agree=bool(n_op == n_ver)))
    return rows


def main() -> None:
    spark = get_spark("fuzzy-screen-scale")
    base_docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    stride = base_docs.agg(F.max("doc_id")).collect()[0][0] + 1
    # warm-up: JIT + Arrow + Python-worker start-up must not land in
    # the first timed cell (it inflated sf0.1's signature wall 10x in
    # the un-warmed run)
    staged_run(spark, BASE, stride, "warmup")
    out = []
    for sf_dir, label in ((BASE, "sf0.1"), (SYNTH, "sf1_synth_10x")):
        out.extend(staged_run(spark, sf_dir, stride, label))
    for r in out:
        print(json.dumps(r))
    by = {(r["scale"], r["stage"]): r for r in out}
    summary = {
        "metric": "fuzzy_screen_decade_growth",
        "corpus_growth": round(
            by[("sf1_synth_10x", "signature")]["corpus_docs"]
            / by[("sf0.1", "signature")]["corpus_docs"], 2),
        "stage_growth": {
            s: round(by[("sf1_synth_10x", s)]["wall"]
                     / max(by[("sf0.1", s)]["wall"], 1e-9), 2)
            for s in ("signature", "band_join", "verify")
        },
        "candidate_growth": round(
            by[("sf1_synth_10x", "band_join")]["candidates"]
            / max(by[("sf0.1", "band_join")]["candidates"], 1), 2),
        "verified_growth": round(
            by[("sf1_synth_10x", "verify")]["verified_pairs"]
            / max(by[("sf0.1", "verify")]["verified_pairs"], 1), 2),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
