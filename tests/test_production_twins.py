"""Self-consistency gates for the rows-only PRODUCTION paths
(VERDICT r4 item 5): the xxhash64/sketch-based registry entries whose
math is oracle-verified through portable twins get one pin each,
closing the gap between "math verified" and "shipped path verified".

Each pin asserts the production query/operator against either its
driver-verified md5 twin, exact ground truth recomputed in-test, or a
structural theorem of the algorithm — all on the planted fixture
corpora the registry queries themselves use, at sf0.001.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_hadoop_spark import queries as Q

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r.id_a, r.id_b) for r in df.collect()}


def test_simhash_banding_catches_all_hamming3_pairs(spark):
    """Pigeonhole theorem gate: 4 bands of 16 bits MUST catch every
    pair at Hamming distance ≤ 3 (3 differing bits can dirty at most
    3 bands). So production simhash_pairs == brute-force all-pairs
    filtered to hamming ≤ 3 over the SAME production fingerprints —
    banding loses exactly nothing."""
    from pagerank_hadoop_spark.operators.dedup import simhash

    corpus = Q._near_dup_corpus(spark, SF)
    fps = {
        r.doc_id: r.fp
        for r in corpus.select(
            "doc_id", simhash(F.col("text")).alias("fp")
        ).collect()
    }
    ids = sorted(fps)
    mask = (1 << 64) - 1
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((fps[a] ^ fps[b]) & mask).count("1") <= 3
    }
    from pagerank_hadoop_spark.operators.dedup import simhash_candidates

    # the operator directly — the registry entry became an
    # oracle-backed self-check summary in r6
    prod = _pairs(simhash_candidates(corpus, "doc_id", "text"))
    assert prod == brute
    assert len(prod) > 0  # the fixture plants real near-dups


def test_minhash_lsh_catches_high_jaccard_planted_pairs(spark):
    """The production xxhash64 LSH candidates must contain every
    planted pair whose TRUE 5-shingle Jaccard ≥ 0.9 (at J=0.9 with
    8 bands x 8 rows the per-pair catch probability is
    1-(1-0.9^8)^8 ≈ 0.98 as a random-family statement; for the FIXED
    seeded family on the fixed fixture the outcome is deterministic —
    this pins it at 100%, so a banding/signature regression that
    starts dropping obvious dups fails loudly)."""
    corpus = Q._near_dup_corpus(spark, SF)
    texts = {r.doc_id: r.text.lower() for r in corpus.collect()}

    def shingle_set(t: str) -> set:
        return {t[i : i + 5] for i in range(max(len(t) - 4, 1))}

    planted_high = set()
    for d, t in texts.items():
        if d >= 1000000 or d % 3 != 0:
            continue
        a, b = shingle_set(texts[d]), shingle_set(texts[d + 1000000])
        if len(a & b) / len(a | b) >= 0.9:
            planted_high.add((d, d + 1000000))
    assert planted_high, "fixture must plant high-Jaccard pairs"
    from pagerank_hadoop_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    # the operator directly — the registry entry became an
    # oracle-backed self-check summary in r6
    prod = _pairs(minhash_lsh_candidates(corpus, "doc_id", "text"))
    assert planted_high <= prod, sorted(planted_high - prod)[:5]


def test_near_dup_clusters_match_unionfind_of_confirmed_pairs(spark):
    """The production clustering (LSH -> exact-Jaccard confirm ->
    distributed connected components -> min-id canonical) must equal
    a driver-side union-find over the same confirmed pair set — pins
    the CC + canonicalization machinery independently."""
    from pagerank_hadoop_spark.operators.dedup import (
        confirmed_near_dup_pairs,
        near_dup_clusters,
    )

    corpus = Q._near_dup_corpus(spark, SF)
    confirmed = confirmed_near_dup_pairs(corpus, "doc_id", "text")
    pair_list = [(r.id_a, r.id_b) for r in confirmed.collect()]
    assert pair_list, "fixture must confirm real near-dup pairs"

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pair_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {
        r.doc_id: find(r.doc_id) if r.doc_id in parent else r.doc_id
        for r in corpus.select("doc_id").collect()
    }
    got = {
        r.id: r.cluster
        for r in near_dup_clusters(
            corpus, "doc_id", "text", pairs=confirmed
        ).collect()
    }
    assert got == want


def test_incremental_admits_equal_md5_blocked_twin(spark):
    """The production xxhash64-blocked incremental dedup admits
    EXACTLY the docs the driver-verified md5-blocked twin admits on
    the planted batch (both end in the same exact-Jaccard verify, so
    any divergence is a blocking-recall regression)."""
    prod = {r.doc_id for r in Q._QUERIES["incremental_dedup_admits"](spark, SF).collect()}
    twin = {r.doc_id for r in Q._QUERIES["incremental_dedup_blocked"](spark, SF).collect()}
    assert prod == twin
    assert prod  # some docs are genuinely new


def test_hll_shard_distinct_within_sketch_error(spark):
    """The shard-built, union-merged HLL estimate must sit within the
    sketch's standard error envelope of the exact distinct count per
    group (generous 5% — lgK default gives ~1.6%/~2.3% RSE; at
    sf0.001 cardinalities the sketch is typically still exact)."""
    import os

    li = spark.read.parquet(os.path.join(SF, "lineitem.parquet"))
    exact = {
        r.l_returnflag: r.d
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("d"))
        .collect()
    }
    from pagerank_hadoop_spark.operators.sketches import hll_distinct

    got = hll_distinct(
        li, "l_partkey", ["l_returnflag"], shard=F.col("l_suppkey") % 16
    ).collect()
    assert len(got) == len(exact)
    for r in got:
        e = exact[r.l_returnflag]
        assert abs(r.approx_distinct - e) <= max(1, 0.05 * e), (
            r.l_returnflag, r.approx_distinct, e,
        )
    # the registry entry (now an oracle-backed self-check summary)
    # must agree that the estimate is inside its tighter 2% gate and
    # that the union estimate is shard-layout-invariant
    summ = Q._QUERIES["hll_shard_distinct"](spark, SF).collect()
    assert all(
        r.est_within_2pct == 1 and r.shard_merge_consistent == 1
        for r in summ
    )


@pytest.mark.parametrize("qname", ["lsh_topk", "ivf_topk"])
def test_ann_production_sims_are_exact_cosines(spark, qname):
    """lsh_topk / ivf_topk claim 'exact cosine re-rank inside probed
    buckets': every returned sim must equal the true cosine of the
    returned (query, vector) pair recomputed with NumPy (rounded to
    the 6dp ranking discipline), and each query must return exactly
    k sorted rows. Runs the OPERATORS directly — the registry
    entries were reshaped in r6 to oracle-backed recall-flag
    summaries. (Recall vs the exact answer is gated separately in
    test_similarity.py on the same production functions.)"""
    import numpy as np

    from pagerank_hadoop_spark.operators.similarity import (
        ivf_topk,
        lsh_topk,
    )

    emb = {
        r.vec_id: np.array(r.v)
        for r in spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    }
    fn = {"lsh_topk": lsh_topk, "ivf_topk": ivf_topk}[qname]
    emb_df, qs_df = Q._ann_inputs(spark, SF)
    rows = (
        fn(emb_df, qs_df, k=5)
        .orderBy("q_id", F.desc("sim"), "vec_id")
        .collect()
    )
    assert rows
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    for q, rs in by_q.items():
        assert len(rs) == 5
        sims = [r.sim for r in rs]
        assert sims == sorted(sims, reverse=True)
        qv = emb[q]
        for r in rs:
            v = emb[r.vec_id]
            true = float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v)))
            assert abs(r.sim - round(true, 6)) <= 1e-6, (q, r.vec_id)
