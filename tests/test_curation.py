"""Unit tests for corpus-curation operators (splits, packing,
decontamination) and the as-of join."""

from __future__ import annotations

import datetime

from pyspark.sql import Row, functions as F

from pagerank_hadoop_spark.operators.curation import (
    contaminated_ids,
    pack_bins,
    with_split,
    word_ngrams,
)
from pagerank_hadoop_spark.operators.joins import asof_join


def test_split_deterministic_and_total(spark):
    docs = spark.range(1000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in with_split(docs).collect()}
    b = {r.doc_id: r.split for r in with_split(docs).collect()}
    assert a == b  # stateless hash: identical across runs
    counts = {
        s: sum(1 for v in a.values() if v == s) for s in set(a.values())
    }
    assert sum(counts.values()) == 1000
    # 90/5/5 within loose tolerance (md5 is uniform-ish)
    assert 850 <= counts["train"] <= 950
    assert counts["validation"] + counts["test"] <= 150


def test_split_stable_under_corpus_growth(spark):
    small = spark.range(100).withColumnRenamed("id", "doc_id")
    grown = spark.range(1000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in with_split(small).collect()}
    b = {r.doc_id: r.split for r in with_split(grown).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_pack_bins_boundaries(spark):
    rows = [Row(doc_id=i, lang="en", n_tokens=t) for i, t in
            enumerate([100, 900, 30, 100])]
    out = {
        r.doc_id: (r.start_offset, r.bin)
        for r in pack_bins(
            spark.createDataFrame(rows), "n_tokens", 1000
        ).collect()
    }
    # offsets 0, 100, 1000, 1030 -> bins 0, 0, 1, 1
    assert out == {0: (0, 0), 1: (100, 0), 2: (1000, 1), 3: (1030, 1)}


def test_pack_bins_streams_independent(spark):
    rows = [
        Row(doc_id=1, lang="en", n_tokens=1100),
        Row(doc_id=2, lang="en", n_tokens=600),
        Row(doc_id=1, lang="de", n_tokens=1100),
    ]
    out = pack_bins(spark.createDataFrame(rows), "n_tokens", 1000).collect()
    bins = {(r.lang, r.doc_id): r.bin for r in out}
    assert bins[("en", 2)] == 1  # second en doc spills into bin 1
    assert bins[("de", 1)] == 0  # de stream starts fresh


def test_word_ngrams(spark):
    df = spark.createDataFrame(
        [("a b c d e f",), ("one two",)], ["text"]
    ).select(word_ngrams(F.col("text"), 5).alias("g"))
    grams, short = [r.g for r in df.collect()]
    assert grams == ["a b c d e", "b c d e f"]
    assert short == []


def test_contaminated_ids(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text with no overlap at all here"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "we saw the quick brown fox jumps today")], ["doc_id", "text"]
    )
    hits = [r.doc_id for r in contaminated_ids(corpus, bench).collect()]
    assert hits == [1]


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 12, minute)


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(20), "p2"), (2, _ts(5), "p3")],
        ["uid", "ts", "pid"],
    )
    right = spark.createDataFrame(
        [(1, _ts(10), "c1"), (1, _ts(15), "c2"), (3, _ts(0), "c3")],
        ["uid", "ts", "cid"],
    )
    out = {r.pid: r.cid for r in asof_join(left, right, "uid", "ts").collect()}
    # p1 at ts=10 matches c1 at ts=10 (inclusive); p2 takes latest (c2);
    # p3's user has no clicks -> null
    assert out == {"p1": "c1", "p2": "c2", "p3": None}


def test_asof_join_inner_drops_unmatched(spark):
    left = spark.createDataFrame([(1, _ts(1), "p")], ["uid", "ts", "pid"])
    right = spark.createDataFrame([(1, _ts(2), "c")], ["uid", "ts", "cid"])
    assert asof_join(left, right, "uid", "ts", how="inner").count() == 0


def test_asof_join_rejects_column_overlap(spark):
    df = spark.createDataFrame([(1, _ts(0), "x")], ["uid", "ts", "v"])
    try:
        asof_join(df, df, "uid", "ts")
    except ValueError as e:
        assert "overlap" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_range_join_band_edges(spark):
    from pagerank_hadoop_spark.operators.joins import range_join

    left = spark.createDataFrame(
        [(1, 1000, "a"), (2, 1000, "b")], ["uid", "lt", "lid"]
    )
    right = spark.createDataFrame(
        [(1, 999, "early"), (1, 1000, "lo"), (1, 1100, "hi"),
         (1, 1101, "late"), (2, 1100, "other")],
        ["uid", "rt", "rid"],
    )
    out = range_join(left, right, ["uid"], "lt", "rt", 0, 100)
    got = {(r.lid, r.rid) for r in out.collect()}
    # inclusive band [lt, lt+100]; keys partition; no duplicates
    assert got == {("a", "lo"), ("a", "hi"), ("b", "other")}
    assert out.count() == len(got)


def test_observe_metrics_ride_the_action(spark, sf_dir):
    # the observe() metrics must equal what a separate pass would
    # compute, without costing one
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    obs = Observation("q")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("rows_scanned"),
        F.sum((F.col("n_chars") < 200).cast("int")).alias("rows_too_short"),
    )
    observed.where(F.col("n_chars") >= 200).groupBy("lang").count().collect()
    got = obs.get
    assert got["rows_scanned"] == docs.count()
    assert got["rows_too_short"] == docs.where(F.col("n_chars") < 200).count()


def test_incremental_refresh_equals_full_agg(spark):
    """Invariant: refresh(agg(T0), D) == agg(T0 ∪ D) for several
    base/delta splits, including new-group deltas and an empty base."""
    from pagerank_hadoop_spark.operators.maintenance import (
        incremental_refresh,
        partial_agg,
    )
    from pyspark.sql import functions as F

    rows = [(i, ["a", "b", "c"][i % 3], float(i * 7 % 13)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, k string, v double")
    keys, measures = ["k"], {
        "s": ("sum", "v"), "n": ("count", "v"),
        "mn": ("min", "v"), "mx": ("max", "v"),
    }
    want = {
        tuple(r)
        for r in partial_agg(df, keys, measures)
        .select("k", F.col("s").cast("double"), "n", "mn", "mx")
        .collect()
    }
    for cut in (0, 17, 40, 60):
        base, delta = df.where(F.col("id") < cut), df.where(F.col("id") >= cut)
        state = partial_agg(base, keys, measures)
        got = {
            tuple(r)
            for r in incremental_refresh(state, delta, keys, measures)
            .select("k", F.col("s").cast("double"), "n", "mn", "mx")
            .collect()
        }
        assert got == want, cut


def test_partial_agg_rejects_unmergeable():
    import pytest

    from pagerank_hadoop_spark.operators.maintenance import partial_agg

    with pytest.raises(ValueError):
        partial_agg(None, ["k"], {"a": ("avg", "v")})


def test_rendezvous_assign_minimal_remap(spark):
    """The HRW property: dropping one shard remaps ONLY that shard's
    keys; every other key keeps its assignment."""
    from pagerank_hadoop_spark.operators.curation import rendezvous_assign

    df = spark.createDataFrame([(i,) for i in range(300)], "id long")
    five = {r.id: r.shard for r in rendezvous_assign(df, "id", ["a", "b", "c", "d", "e"]).collect()}
    four = {r.id: r.shard for r in rendezvous_assign(df, "id", ["a", "b", "c", "d"]).collect()}
    moved = [i for i in five if five[i] != four[i]]
    assert all(five[i] == "e" for i in moved)  # only e's keys moved
    assert set(five.values()) == {"a", "b", "c", "d", "e"}  # all used
    # roughly balanced: each shard within [30, 100] of 300/5 = 60
    from collections import Counter

    counts = Counter(five.values())
    assert all(30 <= c <= 100 for c in counts.values()), counts


def test_interval_join_exactly_once_across_cells(spark):
    # brute-force parity: every overlapping pair appears exactly once,
    # including intervals that span many grid cells
    from pagerank_hadoop_spark.operators.joins import interval_join

    left = spark.createDataFrame(
        [("a", 0, 25), ("b", 7, 8), ("c", 30, 30), ("d", -12, -3)],
        ["lid", "l_s", "l_e"],
    )
    right = spark.createDataFrame(
        [("x", 5, 6), ("y", 24, 40), ("z", -40, -12), ("w", 26, 29)],
        ["rid", "r_s", "r_e"],
    )
    out = interval_join(left, right, "l_s", "l_e", "r_s", "r_e", cell_width=4)
    got = sorted((r.lid, r.rid) for r in out.collect())
    brute = sorted(
        (l.lid, r.rid)
        for l in left.collect()
        for r in right.collect()
        if l.l_s <= r.r_e and r.r_s <= l.l_e
    )
    assert got == brute          # same pairs, each exactly once
    assert out.count() == len(brute)


def test_interval_join_rejects_bad_args(spark):
    from pagerank_hadoop_spark.operators.joins import interval_join

    df = spark.createDataFrame([(1, 2)], ["s", "e"])
    other = spark.createDataFrame([(1, 2)], ["rs", "re"])
    try:
        interval_join(df, other, "s", "e", "rs", "re", cell_width=0)
    except ValueError as e:
        assert "cell_width" in str(e)
    else:
        raise AssertionError("expected ValueError")
    dup = spark.createDataFrame([(1, 2, "v")], ["rs", "re", "s"])
    try:
        interval_join(df, dup, "s", "e", "rs", "re", cell_width=4)
    except ValueError as e:
        assert "rename" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_k_anonymity_violations_flags_small_groups(spark):
    from pagerank_hadoop_spark.operators.curation import (
        k_anonymity_violations,
    )
    from pyspark.sql import functions as F

    rows = [("a", 1)] * 5 + [("a", 2)] * 2 + [("b", 1)] * 1
    df = spark.createDataFrame(rows, "seg string, band int")
    got = {
        (r.seg, r.band): r.n
        for r in k_anonymity_violations(df, ["seg", "band"], k=5).collect()
    }
    assert got == {("a", 2): 2, ("b", 1): 1}  # the 5-group is anonymous
