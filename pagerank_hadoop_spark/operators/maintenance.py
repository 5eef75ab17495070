"""Materialized-aggregate maintenance ([EXT]): incremental refresh.

At 100 TB you never recompute a corpus-wide aggregate because a day
of data arrived; you keep the aggregate STATE (per-group partial
buffers: sums, counts, mins/maxes — anything mergeable) and fold the
delta's partial aggregates into it. This module is that fold as plain
DataFrame algebra — the same partial/merge contract Spark's own
ObjectHashAggregate uses between map and reduce, lifted to table
maintenance (and the reason AVG must be stored as SUM+COUNT: averages
don't merge, their buffers do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_MERGE_FNS = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def partial_agg(
    delta: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Aggregate a delta batch into mergeable state rows.

    ``measures`` maps state-column name -> (kind, source column),
    kind in {sum, count, min, max}. Sums are computed on
    DECIMAL(38,4) (exact, associative — the repo's float discipline)
    so state merges are order-independent.
    """
    aggs = []
    for out, (kind, src) in measures.items():
        if kind == "sum":
            aggs.append(F.sum(F.col(src).cast("decimal(38,4)")).alias(out))
        elif kind == "count":
            aggs.append(F.count(F.lit(1)).alias(out))
        elif kind in ("min", "max"):
            aggs.append(_MERGE_FNS[kind](src).alias(out))
        else:
            raise ValueError(f"unmergeable measure kind: {kind}")
    return delta.groupBy(*keys).agg(*aggs)


def merge_state(
    state: DataFrame,
    delta_state: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Fold delta state into existing state: union + one re-aggregate
    with each measure's MERGE function (sum/count -> sum, min -> min,
    max -> max). Cost is one shuffle over the (small) state tables —
    the base data is never rescanned, which is the entire point.
    Groups new in the delta appear; existing groups update.
    """
    merged = state.unionByName(delta_state)
    aggs = [
        _MERGE_FNS[kind](out).alias(out)
        for out, (kind, _src) in measures.items()
    ]
    return merged.groupBy(*keys).agg(*aggs)


def incremental_refresh(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """``merge_state(state, partial_agg(delta))`` — one call for the
    common maintenance step. The invariant (unit-pinned and
    oracle-gated in the registry): refresh(agg(T0), D) == agg(T0 ∪ D)
    for any split of the data into base and delta.
    """
    return merge_state(state, partial_agg(delta, keys, measures), keys, measures)
