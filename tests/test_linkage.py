"""Unit tests for operators.linkage (fuzzy match, diff, itemsets)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pagerank_hadoop_spark.operators.linkage import (
    blocked_fuzzy_match,
    frequent_itemset_pairs,
    snapshot_diff,
)


def test_blocked_fuzzy_match_best_and_blocking(spark):
    clean = spark.createDataFrame(
        [(1, "b1", "alpha"), (2, "b1", "alphX"), (3, "b2", "alpha")],
        "id long, blk string, name string",
    )
    # "alpho" is dist-1 from "alpha" and dist-2 from "alphX";
    # blocking must prevent the b2 copy of "alpha" from matching.
    dirty = spark.createDataFrame(
        [(10, "b1", "alpho"), (11, "b2", "zzzzzz")],
        "__dirty_id long, blk string, name string",
    )
    out = blocked_fuzzy_match(
        dirty, clean, block_on=["blk"], text_col="name", id_col="id"
    ).collect()
    assert len(out) == 1  # the zzzzzz row matches nothing within dist 2
    assert out[0]["__dirty_id"] == 10
    assert out[0].matched_id == 1 and out[0].dist == 1


def test_blocked_fuzzy_match_tie_breaks_on_smallest_id(spark):
    clean = spark.createDataFrame(
        [(7, "b", "aaax"), (5, "b", "aaay")], "id long, blk string, name string"
    )
    dirty = spark.createDataFrame(
        [(1, "b", "aaaz")], "__dirty_id long, blk string, name string"
    )
    out = blocked_fuzzy_match(
        dirty, clean, block_on=["blk"], text_col="name", id_col="id"
    ).collect()
    assert out[0].matched_id == 5 and out[0].dist == 1


def test_snapshot_diff_classifies_all_four(spark):
    before = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, None, 3.0)],
        "k long, s string, v double",
    )
    after = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 9.0), (4, "d", 4.0)],
        "k long, s string, v double",
    )
    got = {
        r.k: r.change_type
        for r in snapshot_diff(before, after, "k").collect()
    }
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_null_sentinel_no_collision(spark):
    # (NULL,'x') vs ('x',NULL) must NOT fingerprint-collide
    before = spark.createDataFrame([(1, None, "x")], "k long, a string, b string")
    after = spark.createDataFrame([(1, "x", None)], "k long, a string, b string")
    [row] = snapshot_diff(before, after, "k").collect()
    assert row.change_type == "changed"


def test_frequent_itemset_pairs_apriori(spark):
    baskets = spark.createDataFrame(
        [(b, i) for b in range(4) for i in ("x", "y")]
        + [(0, "rare"), (1, "rare")],
        "bk long, it string",
    )
    out = frequent_itemset_pairs(baskets, "bk", "it", min_support=3).collect()
    # (rare, x/y) co-occur only twice -> pruned; (x, y) support 4
    assert [(r.item_a, r.item_b, r.support) for r in out] == [("x", "y", 4)]


def test_frequent_itemset_pairs_dedups_within_basket(spark):
    baskets = spark.createDataFrame(
        [(0, "x"), (0, "x"), (0, "y"), (1, "x"), (1, "y")],
        "bk long, it string",
    )
    out = frequent_itemset_pairs(baskets, "bk", "it", min_support=2).collect()
    assert [(r.item_a, r.item_b, r.support) for r in out] == [("x", "y", 2)]


def test_frequent_pairs_plan_broadcasts_prune(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plan = frequent_itemset_pairs(
        li, "l_orderkey", "l_partkey", 3
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
