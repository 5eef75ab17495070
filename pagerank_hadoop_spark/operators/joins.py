"""Join utilities for skew at scale.

AQE's skew-join splitting (`session.py` turns it on) handles most hot
keys by splitting oversized shuffle partitions. ``salted_join`` is the
explicit fallback for the pathological case AQE can't fix: one join
key so hot that even a single key's rows overflow a task (the "every
page links to the hub" shape in a 100 TB link graph). Salting fans the
hot side out over ``n_salts`` sub-keys and replicates the other side
once per salt — turning one straggler task into ``n_salts`` even ones
at the cost of replicating the (small) build side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed ⋈ other`` on column ``on`` with key salting.

    ``skewed`` rows get a deterministic salt derived from the row's
    whole content hash (uniform, no RNG state to coordinate across
    retries); ``other`` is replicated once per salt via
    ``sequence``+``explode``. Result columns match a plain
    ``skewed.join(other, on, how)``.

    Use when one key's row count ≫ what a single task should hold;
    keep ``n_salts`` ≈ ceil(hot-key rows / target rows per task).
    """
    if how not in ("inner", "left"):
        # an unmatched replicated row would surface once per salt
        raise ValueError("salted_join supports how='inner'|'left' only")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    left = skewed.withColumn("__salt", salt)
    right = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return left.join(right, [on, "__salt"], how).drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str | list[str],
    ts: str,
    how: str = "left",
) -> DataFrame:
    """Backward as-of join: each ``left`` row picks the single latest
    ``right`` row with the same ``by`` key and ``right.ts <= left.ts``
    (inclusive — DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` semantics).

    Spark has no built-in as-of join; the naive encoding
    (range-condition join + per-left-row max) explodes to
    |left|x|matching right| intermediate rows. This is the scalable
    merge shape instead: tag and union both sides, sort within each
    key by time, and carry the most recent right-side values forward
    with ``last(..., ignorenulls=True)`` over a running window —
    ONE shuffle on the key, linear scan per key group, no row
    explosion regardless of how many right rows precede a left row.

    Non-key/non-ts column names must be disjoint between the two
    sides (rename before calling); right values arrive as nullable
    columns of the result. ``how='inner'`` drops left rows with no
    preceding right row.
    """
    by = [by] if isinstance(by, str) else list(by)
    lcols = [c for c in left.columns if c not in by and c != ts]
    rcols = [c for c in right.columns if c not in by and c != ts]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"rename overlapping value columns: {sorted(overlap)}")
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)

    lside = left.select(
        *by,
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *lcols,
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in rcols],
    )
    rside = right.select(
        *by,
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
        *rcols,
    )
    w = (
        Window.partitionBy(*by)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        lside.unionByName(rside)
        .select(
            *by,
            "__ts",
            "__side",
            *lcols,
            *[F.last(c, ignorenulls=True).over(w).alias(c) for c in rcols],
        )
        .where(F.col("__side") == 1)
        .select(*by, F.col("__ts").alias(ts), *lcols, *rcols)
    )
    if how == "inner" and rcols:
        out = out.where(F.col(rcols[0]).isNotNull())
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
) -> DataFrame:
    """Band join: pairs where ``right_ts`` falls in
    ``[left_ts + lower, left_ts + upper]`` (inclusive; integral time
    units, e.g. epoch micros) and the ``by`` keys match.

    Spark plans a key-equality + range predicate as a sort-merge join
    on the keys with a post-filter — per-key O(n_l x n_r), which dies
    on hot keys. This adds a time-bucket equality of width
    ``upper - lower`` to the join key: each left row lands in one
    bucket, each right row is exploded to the (at most 2) buckets its
    admissible window can intersect, and the exact band predicate
    filters inside the bucket. Work per pair is found in exactly one
    bucket (no dedup needed); shuffle and comparison cost drop from
    per-key quadratic to per-(key, bucket).
    """
    width = max(upper - lower, 1)
    lb = left.withColumn("__bucket", F.floor(F.col(left_ts) / width))
    # a right row r admits left rows with left_ts in [r-upper, r-lower]:
    # explode to every bucket that interval can touch
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor((F.col(right_ts) - upper) / width),
                F.floor((F.col(right_ts) - lower) / width),
            )
        ),
    )
    cond = [lb[c] == rb[c] for c in by] + [
        lb["__bucket"] == rb["__bucket"],
        rb[right_ts] >= lb[left_ts] + lower,
        rb[right_ts] <= lb[left_ts] + upper,
    ]
    lcols = [lb[c] for c in left.columns]
    rcols = [rb[c] for c in right.columns if c not in by]
    return lb.join(rb, cond, "inner").select(*lcols, *rcols)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    cell_width: int,
) -> DataFrame:
    """Interval-overlap join: pairs where ``[left_start, left_end]``
    and ``[right_start, right_end]`` intersect (closed intervals,
    integral units — epoch days/micros).

    The naive encoding (join on the overlap predicate alone) has no
    equality key, so Spark plans a nested-loop over |L| x |R| — dead
    at any scale. This grids the timeline into cells of
    ``cell_width``: each interval is exploded to every cell it
    touches, the join key is cell equality, and the exact overlap
    predicate filters inside the cell. A pair that overlaps shares
    the cell containing ``greatest(start_l, start_r)`` (that instant
    lies in both intervals), and a canonical-cell predicate keeps the
    pair ONLY there — each result row is produced exactly once, so no
    dedup shuffle is needed. Shuffle volume is rows x (interval
    length / cell_width); pick ``cell_width`` near the typical
    interval length so most intervals land in 1-2 cells.

    Column names must be disjoint between the sides (all columns from
    both sides are returned, so any overlap would be ambiguous).
    """
    if cell_width <= 0:
        raise ValueError("cell_width must be a positive integer")
    shared = set(left.columns) & set(right.columns)
    if shared:
        raise ValueError(f"rename overlapping columns: {sorted(shared)}")
    w = F.lit(cell_width)

    def cells(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "__cell",
            F.explode(
                F.sequence(F.floor(F.col(s) / w), F.floor(F.col(e) / w))
            ),
        )

    lb = cells(left, left_start, left_end)
    rb = cells(right, right_start, right_end)
    cond = [
        lb["__cell"] == rb["__cell"],
        lb[left_start] <= rb[right_end],
        rb[right_start] <= lb[left_end],
        # canonical cell: count each overlapping pair exactly once
        lb["__cell"]
        == F.floor(F.greatest(lb[left_start], rb[right_start]) / w),
    ]
    return (
        lb.join(rb, cond, "inner")
        .select(*[lb[c] for c in left.columns], *[rb[c] for c in right.columns])
    )
