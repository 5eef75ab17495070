"""Time-series regularization: resample an irregular event stream to
a fixed grid with linear interpolation.

Complements the locf (last-observation-carried-forward) and truncated
EWMA features in the registry: ``resample_linear`` produces the
evenly-spaced series every downstream feature/training pipeline wants,
without ever joining events against a materialized calendar table.

Scale shape: ONE shuffle (partition by the series key). The per-user
grid is generated from that user's own [min, max] span (``sequence`` +
``explode`` — no cross join against a calendar), the grid rows union
with the raw events, and two ordered windows (forward and reverse)
carry the surrounding observations onto each grid row. State per task
is one user's rows — the standard sessionization bound. No Python, no
HOF in the hot path; everything codegen's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def resample_linear(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    bucket_us: int,
) -> DataFrame:
    """Per-key fixed-grid resample with linear interpolation.

    Grid points are multiples of ``bucket_us`` (microseconds) within
    each key's observed [min(ts), max(ts)] span — interpolation only,
    never extrapolation, so a surrounding observation always exists on
    both sides. Duplicate timestamps collapse deterministically to the
    value of the smallest ``tiebreak_col``.

    Returns ``(key, grid_us, value)`` with ``grid_us`` the grid
    timestamp in epoch microseconds and ``value`` the interpolated
    double. An observation exactly on a grid point passes through
    unchanged.
    """
    b = F.lit(bucket_us).cast("long")
    ev = (
        events.select(
            F.col(key_col).alias("key"),
            F.unix_micros(F.col(ts_col)).alias("t"),
            F.col(value_col).alias("v"),
            F.col(tiebreak_col).alias("tb"),
        )
        .groupBy("key", "t")
        .agg(F.min_by("v", "tb").alias("v"))
    )
    # DIV = exact integer division (a double `/` would round near
    # bucket boundaries at epoch-microsecond magnitudes)
    span = ev.groupBy("key").agg(
        F.expr(f"(min(t) + {bucket_us} - 1) div {bucket_us}").alias("g0"),
        F.expr(f"max(t) div {bucket_us}").alias("g1"),
    )
    grid = (
        span.where(F.col("g0") <= F.col("g1"))
        .select(
            "key",
            F.explode(F.sequence(F.col("g0"), F.col("g1"))).alias("g"),
        )
        .select("key", (F.col("g") * b).alias("t"))
    )
    both = ev.select(
        "key", "t", "v", F.lit(0).alias("isg")
    ).unionByName(
        grid.select(
            "key", "t", F.lit(None).cast(ev.schema["v"].dataType).alias("v"),
            F.lit(1).alias("isg"),
        )
    )
    fwd = (
        Window.partitionBy("key")
        .orderBy(F.col("t").asc(), F.col("isg").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rev = (
        Window.partitionBy("key")
        .orderBy(F.col("t").desc(), F.col("isg").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_t = F.when(F.col("isg") == 0, F.col("t"))
    with_ends = both.select(
        "key",
        "t",
        "isg",
        F.last("v", ignorenulls=True).over(fwd).alias("pv"),
        F.last(obs_t, ignorenulls=True).over(fwd).alias("pt"),
        F.last("v", ignorenulls=True).over(rev).alias("nv"),
        F.last(obs_t, ignorenulls=True).over(rev).alias("nt"),
    )
    # identical expression shape on the oracle side: pv + (nv-pv)*ratio
    interp = F.when(F.col("nt") == F.col("pt"), F.col("pv")).otherwise(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * (
            (F.col("t") - F.col("pt")).cast("double")
            / (F.col("nt") - F.col("pt")).cast("double")
        )
    )
    return (
        with_ends.where(F.col("isg") == 1)
        .select("key", F.col("t").alias("grid_us"), interp.alias("value"))
    )
