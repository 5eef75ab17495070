"""Similarity search tests ([EXT] E3): exact top-k, LSH and IVF
approximate variants measured for recall against the exact answer."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pagerank_hadoop_spark.operators.similarity import cosine_topk, ivf_topk, lsh_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .cache()
    )


@pytest.fixture(scope="module")
def queries_df(emb):
    return emb.where(F.col("vec_id") % 250 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )


@pytest.fixture(scope="module")
def exact(emb, queries_df):
    return cosine_topk(emb, queries_df, k=5).collect()


def test_exact_topk_shape_and_range(exact):
    by_q = {}
    for r in exact:
        by_q.setdefault(r["q_id"], []).append(r)
    for q, rows in by_q.items():
        assert len(rows) == 5
        sims = [r["sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(-1.0 <= s <= 1.0 for s in sims)
        assert all(r["vec_id"] != q for r in rows)


def test_exact_topk_matches_numpy(emb, queries_df, exact):
    import numpy as np

    vecs = {r["vec_id"]: np.array(r["v"]) for r in emb.collect()}
    qs = {r["q_id"]: np.array(r["qv"]) for r in queries_df.collect()}
    for q_id, qv in qs.items():
        sims = {
            vid: float(np.dot(qv, v) / (np.linalg.norm(qv) * np.linalg.norm(v)))
            for vid, v in vecs.items()
            if vid != q_id
        }
        want = sorted(sims, key=lambda k: (-round(sims[k], 6), k))[:5]
        got = [r["vec_id"] for r in exact if r["q_id"] == q_id]
        assert got == want


@pytest.mark.parametrize("fn", [lsh_topk, ivf_topk], ids=["lsh", "ivf"])
def test_approximate_recall(emb, queries_df, exact, fn):
    approx = fn(emb, queries_df, k=5).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    got_sets = {}
    for r in approx:
        got_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & got_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    # approximate methods must find a reasonable share of true neighbors
    assert sum(recalls) / len(recalls) >= 0.2, recalls


def test_ivf_kmeans_recall_against_exact(spark, sf_dir):
    from pagerank_hadoop_spark.operators.similarity import cosine_topk, ivf_kmeans_topk
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    exact = {
        (r.q_id, r.vec_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.q_id, r.vec_id)
        for r in ivf_kmeans_topk(emb, queries, k=5, nprobe=8).collect()
    }
    # trained quantizer with wide probing: decent recall on tiny data
    assert len(approx & exact) / len(exact) >= 0.5

    # determinism: seeded fit -> identical result sets across runs
    again = {
        (r.q_id, r.vec_id)
        for r in ivf_kmeans_topk(emb, queries, k=5, nprobe=8).collect()
    }
    assert approx == again


def test_pq_recall_against_exact(emb, queries_df, exact):
    from pagerank_hadoop_spark.operators.similarity import pq_topk

    approx = pq_topk(emb, queries_df, k=5).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    got_sets = {}
    for r in approx:
        got_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    for q, rows in got_sets.items():
        assert len(rows) == 5
    recalls = [
        len(exact_sets[q] & got_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    # 8x16 codebooks + 4x refine on 64-dim data: strong recall
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_pq_explicit_books_validation(emb, queries_df):
    """Explicit codebooks are validated up front: a ragged book or a
    corpus-dim mismatch must raise, not silently F.slice short
    subvectors into wrong ADC codes (ADVICE r3)."""
    from pagerank_hadoop_spark.operators.similarity import pq_topk

    # ragged: second book has a different n_codes
    ragged = [[[0.0] * 8] * 4, [[0.0] * 8] * 3]
    with pytest.raises(ValueError, match="uniform"):
        pq_topk(emb, queries_df, books=ragged)

    # uniform but wrong total dim (2 books x 8 dims = 16 != 64)
    short = [[[0.0] * 8] * 4, [[1.0] * 8] * 4]
    with pytest.raises(ValueError, match="dim"):
        pq_topk(emb, queries_df, books=short)


def test_morton_key_known_values_and_locality(spark):
    from pagerank_hadoop_spark.functions.vectors import morton_key
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (2**31 - 1, 2**31 - 1)],
        "a long, b long",
    )
    got = [
        r["z"]
        for r in df.select(morton_key(F.col("a"), F.col("b")).alias("z"))
        .orderBy("a", "b")
        .collect()
    ]

    def py_morton(a, b):
        z = 0
        for i in range(32):
            z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z

    want = [py_morton(a, b) for a, b in [(0, 0), (0, 1), (1, 0), (3, 5), (2**31 - 1, 2**31 - 1)]]
    assert got == want
    # locality: adjacent morton-sorted cells differ little in (a, b)
    cells = [(a, b) for a in range(16) for b in range(16)]
    keys = sorted(cells, key=lambda ab: py_morton(*ab))
    jumps = [abs(x1 - x0) + abs(y1 - y0) for (x0, y0), (x1, y1) in zip(keys, keys[1:])]
    assert sum(jumps) / len(jumps) < 3  # vs ~8 expected for random order


def test_mrl_truncate_unit_norm_and_proportionality(spark):
    import math

    from pagerank_hadoop_spark.functions.vectors import mrl_truncate

    df = spark.createDataFrame(
        [(1, [3.0, 4.0, 100.0, -7.0]), (2, [0.0, 0.0, 5.0, 5.0])],
        "id long, v array<double>",
    )
    got = {r["id"]: r["m"] for r in df.select("id", mrl_truncate("v", 2).alias("m")).collect()}
    # renormalized prefix keeps direction, gains unit norm
    assert abs(got[1][0] - 0.6) < 1e-12 and abs(got[1][1] - 0.8) < 1e-12
    assert abs(math.hypot(*got[1]) - 1.0) < 1e-12
    # zero prefix stays zero instead of NaN
    assert got[2] == [0.0, 0.0]


def test_hard_negatives_exclude_same_label(spark, sf_dir):
    from pagerank_hadoop_spark.operators.similarity import hard_negative_topk
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    q = emb.limit(3).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("label").alias("q_label"),
    )
    out = hard_negative_topk(emb, q, k=4)
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    qlabels = {r["q_id"]: r["q_label"] for r in q.collect()}
    rows = out.collect()
    assert len(rows) == 12  # 3 queries x k
    for r in rows:
        assert labels[r["vec_id"]] != qlabels[r["q_id"]]


def test_multivector_maxsim_late_interaction(spark):
    """MaxSim finds the best-matching token PER query token: doc A
    matches both query tokens exactly (score 2), doc B matches one
    strongly (3) but misses the other — single-vector cosine would
    prefer B's bigger norm; MaxSim scores them 2.0 vs 3.0 honestly
    and exact values are pinned."""
    from pagerank_hadoop_spark.operators.similarity import (
        multivector_maxsim_topk,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 1.0]),    # tokens [1,0] and [0,1]
            (2, [3.0, 0.0, 0.0, 0.0]),    # tokens [3,0] and [0,0]
            (3, [0.0, 0.0, 0.0, 0.0]),
        ],
        "vec_id long, v array<double>",
    )
    q = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 1.0])], "q_id long, qv array<double>"
    )
    rows = multivector_maxsim_topk(corpus, q, k=3, n_sub=2).collect()
    got = {r.vec_id: r.score for r in rows}
    # doc1: max(1,0)+max(0,1)=2; doc2: max(3,0)+max(0,0)=3; doc3: 0
    assert got == {1: 2.0, 2: 3.0, 3: 0.0}
    order = [r.vec_id for r in sorted(rows, key=lambda r: (-r.score, r.vec_id))]
    assert order == [2, 1, 3]

def test_multivector_maxsim_rejects_indivisible_length(spark):
    """A vector length not divisible by n_sub would silently mis-slice
    (int-cast truncation -> overlapping/short token slices); the kernel
    must raise a typed error instead."""
    from pagerank_hadoop_spark.operators.similarity import (
        multivector_maxsim_topk,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 1.0, 5.0])],  # length 5, n_sub 2
        "vec_id long, v array<double>",
    )
    q = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 1.0])], "q_id long, qv array<double>"
    )
    with pytest.raises(Exception, match="not divisible"):
        multivector_maxsim_topk(corpus, q, k=1, n_sub=2).collect()

def test_maxsim_screened_recall_floor(spark, sf_dir):
    """The production screened MaxSim (token-IVF membership screen +
    centroid-LUT shortlist + exact re-rank) vs the brute referee on
    the UNIFORM-GAUSSIAN test embeddings: no cluster structure means
    centroid proxies are weak and recall is shortlist-bound (the
    pq untrained-codebook posture) — a permissive floor plus a hard
    sanity: a big-enough shortlist must recover everything."""
    from pagerank_hadoop_spark.operators.similarity import (
        maxsim_screened_topk,
        multivector_maxsim_topk,
        recall_vs_exact,
    )
    from pagerank_hadoop_spark.queries import _MAXSIM_CENTROIDS

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.where("vec_id % 200 = 0").select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    n = emb.count()
    exact = multivector_maxsim_topk(emb, q, k=5, n_sub=8).localCheckpoint()

    # shortlist covering the whole membership-screened corpus: the
    # machinery itself loses nothing (screen + LUT + re-rank plumbing)
    full = recall_vs_exact(
        maxsim_screened_topk(
            emb, q, k=5, refine=(n + 4) // 5, centroids=_MAXSIM_CENTROIDS
        ),
        exact,
        5,
    ).agg(F.min("recall").alias("r")).collect()[0].r
    assert full == 1.0, f"full-shortlist recall {full}"

    trained_rec = recall_vs_exact(
        maxsim_screened_topk(emb, q, k=5, refine=24), exact, 5
    ).agg(F.avg("recall").alias("r")).collect()[0].r
    # genuine (permissive) floor for the trained path: a 24-doc
    # shortlist over this gaussian fixture lands well above chance;
    # exact values are value-checked via the oracle twin
    # (recall_maxsim_topk), this pins against silent total collapse
    assert trained_rec >= 0.2, f"trained-path recall {trained_rec}"


def test_maxsim_screened_exact_on_clustered(spark):
    """On CLUSTERED data (every token near a codebook centroid — the
    regime PLAID screening targets) the screened path with a tight
    shortlist returns exactly the brute top-k: centroid LUT scores
    rank-order the true scores, so screening is lossless."""
    from pagerank_hadoop_spark.operators.similarity import (
        maxsim_screened_topk,
        multivector_maxsim_topk,
        recall_vs_exact,
    )
    from pagerank_hadoop_spark.queries import _MAXSIM_CENTROIDS

    # 40 docs; doc d's token t sits exactly on centroid (7*d + t) % 32
    # scaled by a deterministic weight -> dots with the query LUT are
    # the true token sims
    rows = []
    for d in range(40):
        vec = []
        for t in range(8):
            c = _MAXSIM_CENTROIDS[(7 * d + t) % 32]
            w = 1.0 + ((d * 13 + t * 5) % 7) / 10.0
            vec.extend([w * x for x in c])
        rows.append((d, vec))
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
    q = emb.where("vec_id % 10 = 0").select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    exact = multivector_maxsim_topk(emb, q, k=5, n_sub=8)
    approx = maxsim_screened_topk(
        emb, q, k=5, nprobe=4, refine=4, centroids=_MAXSIM_CENTROIDS
    )
    rec = recall_vs_exact(approx, exact, 5).agg(
        F.min("recall").alias("r")
    ).collect()[0].r
    assert rec >= 0.8, f"clustered min recall {rec}"

def test_ivf_pq_recall_floor(spark, sf_dir):
    """Composed IVF-PQ (coarse-quantizer pruning + residual PQ + ADC
    with centroid correction + exact re-rank) retrieves a solid share
    of the exact top-5 on the gaussian test embeddings. Floors sit
    under the measured sf0.001 recall (avg 0.52 / min 0.4) with
    margin; machinery building blocks are oracle-pinned by
    recall_{ivf,pq}_topk."""
    from pagerank_hadoop_spark.operators.similarity import (
        cosine_topk,
        ivf_pq_topk,
        recall_vs_exact,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.where("vec_id % 100 = 0").select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    exact = cosine_topk(emb, q, k=5, round_dp=6)
    rec = recall_vs_exact(ivf_pq_topk(emb, q, k=5), exact, 5).agg(
        F.avg("recall").alias("a"), F.min("recall").alias("m")
    ).collect()[0]
    assert rec.a >= 0.35, f"avg recall {rec.a}"
    assert rec.m >= 0.2, f"min recall {rec.m}"

    # a full-corpus shortlist must recover the exact top-5 everywhere
    # when every cell is probed (machinery-losslessness sanity)
    n = emb.count()
    full = recall_vs_exact(
        ivf_pq_topk(emb, q, k=5, nprobe=16, refine=(n + 4) // 5),
        exact,
        5,
    ).agg(F.min("recall").alias("m")).collect()[0].m
    assert full == 1.0, f"full recall {full}"

def test_trained_ann_paths_deterministic(spark, sf_dir):
    """Seeded training (Lloyd samples + argmins) must make the trained
    production paths pure functions of the data: identical result SETS
    across two independent fits — the ivf_kmeans determinism pin,
    extended to the round-5 trained paths."""
    from pagerank_hadoop_spark.operators.similarity import (
        ivf_pq_topk,
        maxsim_screened_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.where("vec_id % 200 = 0").select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    for fn in (ivf_pq_topk, maxsim_screened_topk):
        a = {(r[0], r[1]) for r in fn(emb, q, k=5).collect()}
        b = {(r[0], r[1]) for r in fn(emb, q, k=5).collect()}
        assert a == b and len(a) > 0, fn.__name__

def test_maxsim_null_vector_scores_null_not_crash(spark):
    """Review finding: a NULL vector must score NULL (sorts last), not
    kill the job with a misleading 'not divisible' raise; a present
    but mis-sized vector still raises typed."""
    from pagerank_hadoop_spark.operators.similarity import (
        multivector_maxsim_topk,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 1.0]), (2, None)],
        "vec_id long, v array<double>",
    )
    q = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 1.0])], "q_id long, qv array<double>"
    )
    rows = multivector_maxsim_topk(corpus, q, k=5, n_sub=2).collect()
    got = {r.vec_id: r.score for r in rows}
    assert got[1] == 2.0
    assert got[2] is None  # null vector -> null score, no crash


def test_sql_dlit_refuses_non_finite():
    """r15 ADVICE: repr(nan)+'D' is not SQL — a NaN/Inf centroid or
    plane component must raise a typed ValueError naming the value,
    not an opaque ParseException on a huge generated string."""
    import math

    import pytest

    from pagerank_hadoop_spark.operators.similarity import _sql_dlit

    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(ValueError, match="non-finite"):
            _sql_dlit(bad)
    # finite values still round-trip exactly
    assert _sql_dlit(0.1) == repr(0.1) + "D"
    assert float(_sql_dlit(math.pi)[:-1]) == math.pi


def test_sql_ident_escapes_backticks():
    """r15 ADVICE: column names interpolated into generated SQL must
    escape embedded backticks (doubled, the Spark SQL escape)."""
    from pagerank_hadoop_spark.operators.similarity import _sql_ident

    assert _sql_ident("v") == "`v`"
    assert _sql_ident("odd`name") == "`odd``name`"
