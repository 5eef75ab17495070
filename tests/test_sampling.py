"""Deterministic sampling / ordering operators (operators.sampling)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pagerank_hadoop_spark.operators.sampling import (
    deterministic_shuffle,
    hash_sample,
    reservoir_per_key,
    sample_key,
    stratified_sample,
)


def _py_key(val: str, salt: str = "") -> int:
    return int(hashlib.md5((salt + val).encode()).hexdigest()[:6], 16)


def test_sample_key_matches_python_md5(spark):
    df = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    got = {
        r["doc_id"]: r["k"]
        for r in df.select(
            "doc_id", sample_key(F.col("doc_id"), "s").alias("k")
        ).collect()
    }
    assert got == {i: _py_key(str(i), "s") for i in range(20)}


def test_hash_sample_deterministic_and_stable_under_growth(spark):
    small = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    big = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    pick_small = {r[0] for r in hash_sample(small, "doc_id", 0.2).collect()}
    pick_big = {r[0] for r in hash_sample(big, "doc_id", 0.2).collect()}
    # growing the corpus never changes membership of existing rows
    assert pick_small == {i for i in pick_big if i < 500}
    # rate lands near the target (md5 is uniform)
    assert 0.1 < len(pick_big) / 1000 < 0.3


def test_stratified_sample_respects_fractions(spark):
    rows = [(i, "en" if i % 2 == 0 else "fr") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, "doc_id", {"en": 0.1, "fr": 1.0}, "lang")
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_lang["fr"] == 500  # fraction 1.0 keeps everything
    assert 20 <= by_lang["en"] <= 120
    # a stratum absent from fractions is dropped
    df2 = df.withColumn("lang", F.lit("zh"))
    assert stratified_sample(df2, "doc_id", {"en": 1.0}, "lang").count() == 0


def test_deterministic_shuffle_is_total_and_reproducible(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    a = [r[0] for r in deterministic_shuffle(df, "doc_id").collect()]
    b = [r[0] for r in deterministic_shuffle(df.repartition(7), "doc_id").collect()]
    assert a == b  # partitioning-independent
    assert sorted(a) == list(range(100))
    assert a != sorted(a)  # actually shuffled


def test_reservoir_per_key_exact_k(spark):
    rows = [(i, f"g{i % 5}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, g string")
    out = reservoir_per_key(df, ["g"], "doc_id", 7)
    counts = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {f"g{i}": 7 for i in range(5)}
    # small groups keep everything
    tiny = spark.createDataFrame([(1, "a"), (2, "a")], "doc_id long, g string")
    assert reservoir_per_key(tiny, ["g"], "doc_id", 7).count() == 2


def test_hash_sample_filter_reaches_scan(spark, sf_dir):
    """The sample predicate must stay a scan-side filter: no shuffle,
    no extra exchange beyond the aggregation's."""
    from pagerank_hadoop_spark.plans.checks import count_exchanges

    from pagerank_hadoop_spark.plans.checks import formatted_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sampled = hash_sample(docs, "doc_id", 0.1).groupBy("lang").count()
    # formatted explain lists each Exchange node twice (tree + details):
    # exactly the aggregation's single shuffle, nothing from the sample
    assert count_exchanges(sampled) <= 2, formatted_plan(sampled)


def test_mixture_rebalance_equal_shares(spark):
    from pagerank_hadoop_spark.operators.sampling import mixture_rebalance

    # one dominant source (80% of mass), three light ones
    rows = []
    did = 0
    for src, n, chars in [("big", 800, 100), ("a", 70, 100),
                          ("b", 70, 100), ("c", 60, 100)]:
        for _ in range(n):
            rows.append((did, src, chars))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = mixture_rebalance(df, "doc_id", "source", "n_chars", 0.5)
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # equal share = 0.5 * 100000 / 4 = 12500 chars = 125 docs per source
    assert got["a"] == 70 and got["b"] == 70 and got["c"] == 60  # kept whole
    # dominant source downsampled to ~125 docs (Bernoulli, hash jitter)
    assert 90 <= got["big"] <= 160
    # idempotent: re-applying with the same budget keeps survivors'
    # fractions >= before only for "big"; light sources unchanged
    again = mixture_rebalance(out, "doc_id", "source", "n_chars", 1.0)
    assert again.count() == out.count()


def test_weighted_sample_prefers_heavy_weights(spark):
    from pagerank_hadoop_spark.operators.sampling import weighted_sample

    rows = [(i, 1000.0 if i < 20 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = [r.id for r in weighted_sample(df, "w", 20, "id").collect()]
    assert len(got) == len(set(got)) == 20  # without replacement
    # 20 heavy rows at 1000x weight should crowd out the 180 light ones
    assert sum(1 for i in got if i < 20) >= 15

    # deterministic: same draw twice
    again = [r.id for r in weighted_sample(df, "w", 20, "id").collect()]
    assert got == again

    # zero/negative weights never selected
    df2 = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 5.0)], "id long, w double"
    )
    assert [r.id for r in weighted_sample(df2, "w", 5, "id").collect()] == [3]


def test_dedup_aware_mixture_atomic_and_budget(spark, sf_dir):
    """The r11 cluster-aware mixture query: every confirmed near-dup
    pair is kept or dropped atomically (split_pairs == 0), the budget
    counts representatives only (budget_chars <= raw_chars, strictly
    less wherever a kept cluster has a planted dup member), and every
    cluster id appearing in the output is a representative of itself."""
    from pagerank_hadoop_spark.queries import q_dedup_aware_mixture

    rows = q_dedup_aware_mixture(spark, sf_dir).collect()
    assert rows, "expected at least one source"
    assert all(r["split_pairs"] == 0 for r in rows)
    assert all(r["n_clusters"] <= r["n_docs"] for r in rows)
    assert all(r["budget_chars"] <= r["raw_chars"] for r in rows)
    # planted dups exist in every sf fixture, so at least one kept
    # cluster somewhere has >1 member and the double-count shows up
    assert sum(r["n_docs"] for r in rows) > sum(
        r["n_clusters"] for r in rows
    )
    assert sum(r["raw_chars"] for r in rows) > sum(
        r["budget_chars"] for r in rows
    )
