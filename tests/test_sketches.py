"""Mergeable-sketch operators (operators/sketches.py).

Checks the properties the DuckDB oracle cannot express: HLL error
bounds, CMS over-count-only guarantees, bitmap exactness on edge keys
(0, bucket boundaries), and shard-merge equivalence (sketch-of-union
== union-of-sketches).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pagerank_hadoop_spark.operators.sketches import (
    bitmap_distinct,
    cms_frequencies,
    cms_group_estimates,
    hll_distinct,
)


def test_bitmap_distinct_exact_with_edge_keys(spark):
    # keys straddling bucket boundaries and including 0 (1-based
    # bit-position shift) — duplicates everywhere
    rows = [(k % 3, v) for k in range(6) for v in (0, 1, 32767, 32768, 65536)]
    df = spark.createDataFrame(rows + rows, "g int, k long")
    got = {
        r["g"]: r["n_distinct"]
        for r in bitmap_distinct(df, "k", ["g"]).collect()
    }
    assert got == {0: 5, 1: 5, 2: 5}


def test_bitmap_distinct_matches_count_distinct(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = {
        r[0]: r[1]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey"))
        .collect()
    }
    got = {
        r[0]: r[1]
        for r in bitmap_distinct(
            orders, "o_custkey", ["o_orderpriority"]
        ).collect()
    }
    assert got == exact


def test_hll_estimate_within_error_bound(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {
        r[0]: r[1]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey"))
        .collect()
    }
    est = {
        r[0]: r[1]
        for r in hll_distinct(li, "l_partkey", ["l_returnflag"]).collect()
    }
    assert est.keys() == exact.keys()
    for k, e in exact.items():
        assert abs(est[k] - e) <= max(2, 0.05 * e), (k, est[k], e)


def test_hll_shard_union_equals_unsharded(spark, sf_dir):
    """union-of-per-shard-sketches must give the same registers (and
    so the same estimate) as one sketch over everything — the property
    that makes incremental no-rescan pipelines sound."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    one = hll_distinct(li, "l_partkey", ["l_returnflag"]).collect()
    sharded = hll_distinct(
        li, "l_partkey", ["l_returnflag"], shard=F.col("l_suppkey") % 16
    ).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, sharded))


def test_cms_never_undercounts_and_is_tight_here(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {r[0]: r[1] for r in ev.groupBy("event_type").count().collect()}
    est = {
        r[0]: r[1] for r in cms_group_estimates(ev, "event_type").collect()
    }
    n = sum(exact.values())
    for k, e in exact.items():
        assert est[k] >= e  # CMS can only over-count
        assert est[k] <= e + 0.0001 * n  # eps * N bound

    blob, sketch = cms_frequencies(ev, "event_type")
    assert sketch.totalCount() == n
    # blob round-trips through the serialized form (storable/mergeable)
    jvm = spark._jvm
    again = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(blob)
    )
    for k in exact:
        assert again.estimateCount(k) == sketch.estimateCount(k)


def test_jl_projection_preserves_distances(spark, sf_dir):
    """JL guarantee, empirically: pairwise distances in the 16-dim
    projection stay within a modest distortion band of the 64-dim
    originals, and the Spark expression matches a NumPy reference."""
    import numpy as np

    from pagerank_hadoop_spark.functions.vectors import (
        jl_project,
        jl_sign_matrix,
    )

    signs = jl_sign_matrix(64, 16)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(64)
    rows = (
        emb.select("vec_id", "embedding",
                   jl_project("embedding", signs).alias("proj"))
        .orderBy("vec_id")
        .collect()
    )
    S = np.array(signs, dtype=np.float64)  # (16, 64)
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    P = np.array([r["proj"] for r in rows])
    np.testing.assert_allclose(P, X @ S.T / np.sqrt(16), rtol=1e-12)

    rng = np.random.default_rng(7)
    idx = rng.integers(0, len(rows), size=(200, 2))
    ratios = []
    for a, b in idx:
        if a == b:
            continue
        d0 = np.linalg.norm(X[a] - X[b])
        d1 = np.linalg.norm(P[a] - P[b])
        if d0 > 0:
            ratios.append(d1 / d0)
    ratios = np.array(ratios)
    # 16 dims from 64: distortion is loose but bounded; the median
    # ratio must sit near 1 and no pair may collapse to ~0
    assert 0.7 < np.median(ratios) < 1.3
    assert ratios.min() > 0.2 and ratios.max() < 2.5


def test_cms_group_estimates_integer_key(spark, sf_dir):
    from pagerank_hadoop_spark.operators.sketches import cms_group_estimates

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(500)
    est = {r[0]: r[1] for r in cms_group_estimates(ev, "user_id").collect()}
    exact = {r[0]: r[1] for r in ev.groupBy("user_id").count().collect()}
    assert est.keys() == exact.keys()
    for k, e in exact.items():
        assert est[k] >= e


def test_histogram_sketch_merge_law_and_quantiles(spark):
    from pagerank_hadoop_spark.operators.sketches import (
        histogram_quantile_micro,
        histogram_sketch,
        merge_histograms,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, float(i % 100)) for i in range(1000)], "id long, v double"
    )
    direct = {
        (r.bin, r.cnt)
        for r in histogram_sketch(df, "v", 0.0, 100.0, 20).collect()
    }
    merged = {
        (r.bin, r.cnt)
        for r in merge_histograms(
            histogram_sketch(df, "v", 0.0, 100.0, 20, shard_col=F.col("id") % 4)
        ).collect()
    }
    assert direct == merged  # mergeability law
    assert sum(c for _, c in direct) == 1000
    # uniform 0..99: p50 ≈ 50 within one 5-wide bin
    hist = merge_histograms(
        histogram_sketch(df, "v", 0.0, 100.0, 20, shard_col=F.col("id") % 4)
    )
    p50 = histogram_quantile_micro(hist, 0.5, 0.0, 100.0, 20).collect()[0].q_micro
    assert 45_000_000 <= p50 <= 55_000_000
    # clamping: out-of-range values land in edge bins
    df2 = spark.createDataFrame([(1, -5.0), (2, 500.0)], "id long, v double")
    bins = {r.bin for r in histogram_sketch(df2, "v", 0.0, 100.0, 20).collect()}
    assert bins == {0, 19}


def test_bloom_no_false_negatives_and_merge_law(spark):
    """Bloom screen invariants on the PRODUCTION (xxhash64) path:
    (1) no false negatives — every key that was inserted must probe
    bloom_new=0; (2) merge law — per-shard filters bit_or'ed together
    equal the filter built over the union (bit_or is associative and
    commutative), so shards never need rescanning; (3) the portable
    md5 path (the oracle-gated form) obeys the same no-FN law."""
    from pagerank_hadoop_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    seen = spark.range(0, 400).select(
        F.concat(F.lit("key_"), F.col("id")).alias("k")
    )
    novel = spark.range(400, 600).select(
        F.concat(F.lit("key_"), F.col("id")).alias("k")
    )
    for portable in (False, True):
        words, m = bloom_build(seen, "k", portable=portable)
        got = bloom_probe(seen, "k", words, m, portable=portable)
        assert (
            got.where(F.col("bloom_new") != 0).count() == 0
        ), f"false negative (portable={portable})"
        # novel keys: mostly new; any 0 is a legitimate false positive
        fresh = bloom_probe(novel, "k", words, m, portable=portable)
        n_new = fresh.where(F.col("bloom_new") == 1).count()
        assert n_new >= 150, f"FP rate implausibly high: {200 - n_new}/200"

    # merge law: build per shard at the UNION's m, OR the words
    n = seen.count()
    m = 64 * ((8 * n + 63) // 64)
    import pagerank_hadoop_spark.operators.sketches as sk

    sh_a = seen.where(F.pmod(F.xxhash64("k"), F.lit(2)) == 0)
    sh_b = seen.where(F.pmod(F.xxhash64("k"), F.lit(2)) == 1)

    def words_at_m(df):
        pos = F.array(*sk._bloom_positions(F.col("k"), m, 3, False))
        return (
            df.select(F.explode(pos).alias("pos"))
            .distinct()
            .select(
                (F.col("pos") / 64).cast("long").alias("word_idx"),
                F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("bit"),
            )
            .groupBy("word_idx")
            .agg(F.bit_or("bit").alias("word"))
        )

    union_words = {
        (r.word_idx, r.word) for r in words_at_m(seen).collect()
    }
    merged = {
        (r.word_idx, r.word)
        for r in words_at_m(sh_a)
        .unionByName(words_at_m(sh_b))
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
        .collect()
    }
    assert merged == union_words


def test_bloom_probe_preserves_multiplicity_and_never_shuffles_batch(spark):
    """An ingestion stream legitimately contains byte-identical rows:
    the probe must return one output row per input row (an earlier
    draft collapsed duplicates through a groupBy over every batch
    column), and the screen must stay map-side — the probe plan may
    contain broadcast exchanges (the m/64-word table) but no shuffle
    Exchange on the batch. Internal-name collisions must be refused
    loudly rather than mis-joined."""
    import pytest

    from pagerank_hadoop_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    seen = spark.range(0, 100).select(
        F.concat(F.lit("key_"), F.col("id")).alias("k")
    )
    words, m = bloom_build(seen, "k", portable=False)
    # materialize the filter so the probe plan below is ONLY the probe
    # (the build's own word_idx groupBy legitimately shuffles m/64 rows)
    words = words.localCheckpoint(eager=True)
    # three copies of one seen key + two of one novel key
    batch = spark.createDataFrame(
        [("key_7",)] * 3 + [("key_999999",)] * 2, "k string"
    )
    got = bloom_probe(batch, "k", words, m, portable=False)
    rows = [(r.k, r.bloom_new) for r in got.collect()]
    assert len(rows) == 5, "duplicate batch rows were collapsed"
    assert rows.count(("key_7", 0)) == 3

    plan = got._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line and "Broadcast" not in line:
            raise AssertionError(f"batch-side shuffle in probe: {line}")

    with pytest.raises(ValueError, match="__bloom_"):
        bloom_probe(
            batch.withColumn("__bloom_pos_0", F.lit(1)), "k", words, m
        )


def test_bloom_param_guards_raise_early(spark):
    """Invalid k_hashes/bits_per_key/m fail loudly at call time, not
    as an IndexError deep in the probe plan (ADVICE r7)."""
    import pytest

    from pagerank_hadoop_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    df = spark.range(10).selectExpr("cast(id as string) as k")
    with pytest.raises(ValueError, match="k_hashes"):
        bloom_build(df, "k", k_hashes=0)
    with pytest.raises(ValueError, match="bits_per_key"):
        bloom_build(df, "k", bits_per_key=0)
    words, m = bloom_build(df, "k")
    with pytest.raises(ValueError, match="k_hashes"):
        bloom_probe(df, "k", words, m, k_hashes=0)
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_probe(df, "k", words, m=100)
