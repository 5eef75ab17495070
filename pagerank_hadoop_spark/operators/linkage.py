"""Record linkage, snapshot reconciliation, and co-occurrence mining.

Three operators a 100 TB curation pipeline leans on constantly:

* :func:`blocked_fuzzy_match` — entity resolution by blocking-key
  equi-join + bounded edit distance. The blocking key turns an
  all-pairs O(N·M) comparison into a co-partitioned hash join whose
  quadratic work is confined to single blocks; edit distance runs
  JVM-side (``levenshtein`` is codegen'd, no Python).
* :func:`snapshot_diff` — keyed reconciliation of two table snapshots
  (migration validation, CDC audit). One full-outer shuffle join on
  the key; rows compare by a single md5 row fingerprint computed
  independently on each side, so no wide column set ever ships twice.
* :func:`frequent_itemset_pairs` — Apriori-pruned market-basket pair
  mining. Items below the pair support threshold are pruned FIRST
  (pair support ≤ min item support — the anti-monotone bound), so the
  per-basket self-join is quadratic only in frequent items per basket.

Extends the reference's join/aggregate repertoire
(``PageRank.java:229-265`` join + sum-by-key) to the linkage shapes
SURVEY.md §2's [EXT] pipeline section calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def blocked_fuzzy_match(
    dirty: DataFrame,
    clean: DataFrame,
    block_on: list[str],
    text_col: str,
    id_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """Best fuzzy match per dirty row against ``clean``, within blocks.

    ``dirty`` must carry ``__dirty_id`` + ``block_on`` + ``text_col``;
    ``clean`` carries ``id_col`` + ``block_on`` + ``text_col``.
    Returns one row per matched dirty record: ``(__dirty_id,
    matched_id, dist)`` where ``dist`` is the minimum levenshtein
    distance ≤ ``max_dist``; ties break on the smallest ``matched_id``.

    Scale: the only shuffle is the equi-join on the blocking key —
    never a cross join. Block sizes bound the comparison fan-out;
    skewed blocks split under AQE. The window's partition key
    (``__dirty_id``) rides the join's output partitioning.
    """
    c = clean.select(
        F.col(id_col).alias("__cand_id"),
        *[F.col(b) for b in block_on],
        F.col(text_col).alias("__cand_text"),
    )
    d = dirty.select(
        "__dirty_id",
        *[F.col(b) for b in block_on],
        F.col(text_col).alias("__dirty_text"),
    )
    pairs = d.join(c, on=block_on).where(
        F.levenshtein("__dirty_text", "__cand_text") <= F.lit(max_dist)
    )
    w = Window.partitionBy("__dirty_id").orderBy(
        F.levenshtein("__dirty_text", "__cand_text").asc(),
        F.col("__cand_id").asc(),
    )
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "__dirty_id",
            F.col("__cand_id").alias("matched_id"),
            F.levenshtein("__dirty_text", "__cand_text").alias("dist"),
        )
    )


def row_fingerprint(cols: list[str]) -> F.Column:
    """md5 fingerprint of ``cols`` with a null sentinel per column.

    ``concat_ws`` drops nulls silently (making ``(NULL,'x')`` collide
    with ``('x',NULL)``), so each column is coalesced to an explicit
    sentinel before joining with an unlikely separator.
    """
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cols
    ]
    return F.md5(F.concat_ws("\x1f", *parts))


def snapshot_diff(
    before: DataFrame,
    after: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed diff of two snapshots: one row per key with a change type.

    Returns ``(key, change_type)`` where change_type ∈
    ``{'added','removed','changed','unchanged'}``. Each side reduces
    to ``(key, fingerprint)`` BEFORE the join, so the full-outer
    shuffle moves two thin columns regardless of table width — the
    property that makes a 100 TB reconciliation feasible.

    Fingerprints only ever compare within one engine/run, so their
    exact string form doesn't need cross-engine portability — only
    the planted data does.
    """
    cols = compare_cols or [c for c in before.columns if c != key]
    b = before.select(F.col(key), row_fingerprint(cols).alias("__fp_b"))
    a = after.select(F.col(key), row_fingerprint(cols).alias("__fp_a"))
    joined = b.join(a, on=key, how="full_outer")
    return joined.select(
        F.col(key),
        F.when(F.col("__fp_b").isNull(), F.lit("added"))
        .when(F.col("__fp_a").isNull(), F.lit("removed"))
        .when(F.col("__fp_a") != F.col("__fp_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
    )


def frequent_itemset_pairs(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int,
) -> DataFrame:
    """Frequent item PAIRS (2-itemsets) with support ≥ ``min_support``.

    Apriori pruning: an item appearing in fewer than ``min_support``
    baskets cannot be part of a qualifying pair, so infrequent items
    are removed with a broadcast left-semi join BEFORE the per-basket
    self-join. The self-join is an equi-join on the basket key
    (co-partitioned — one shuffle feeds both sides), quadratic only
    within a basket's frequent items; the ``<`` predicate halves the
    pair space and canonicalizes (a, b) ordering.

    The pair expansion is a per-basket array unfold rather than a
    basket self-join: Catalyst does not common-subexpression the two
    branches of a self-join, so the join form scans and semi-joins
    the basket table TWICE (audited at 11 exchanges); collecting each
    basket's frequent items into a sorted array and exploding the
    i<j combinations does it once (the array is bounded by basket
    size — the same quadratic-within-basket bound, minus a shuffle
    and a duplicated subplan).

    Returns ``(item_a, item_b, support)``.
    """
    b = baskets.select(
        F.col(basket_col).alias("__bk"), F.col(item_col).alias("__it")
    ).distinct()
    item_cnt = b.groupBy("__it").agg(F.count(F.lit(1)).alias("__n"))
    frequent = item_cnt.where(F.col("__n") >= F.lit(min_support)).select("__it")
    fb = b.join(F.broadcast(frequent), "__it", "left_semi")
    per_basket = fb.groupBy("__bk").agg(
        F.sort_array(F.collect_set("__it")).alias("__items")
    )
    pairs = per_basket.select(
        F.explode(
            F.expr(
                "flatten(transform(__items, (x, i) -> "
                "transform(slice(__items, i + 2, size(__items)), "
                "y -> struct(x AS item_a, y AS item_b))))"
            )
        ).alias("__p")
    ).select("__p.item_a", "__p.item_b")
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= F.lit(min_support))
    )
