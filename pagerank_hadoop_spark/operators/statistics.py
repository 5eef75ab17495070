"""Scalable statistics: Poisson bootstrap and per-group closed-form OLS.

Two estimators every 100 TB metrics pipeline wants, both expressed so
the data is touched once and nothing row-oriented runs in Python:

* :func:`poisson_bootstrap_mean` — the resampling bootstrap at scale.
  A classical bootstrap draws n rows WITH replacement per replica —
  impossible distributed without global indexing. The Poisson
  approximation (each row enters replica ``b`` with weight ~
  Poisson(1)) needs only a per-(row, replica) deterministic hash, so
  B replicas materialize as one explode + one partial-aggregated
  groupBy(replica). Weights come from a portable md5-derived uniform
  mapped through the Poisson(1) CDF — deterministic across engines,
  retries, and partitionings (no RNG state).
* :func:`group_ols_trend` — per-key linear trend (slope of y over
  time) via the closed-form normal equations: five sufficient sums
  per key, one shuffle. This is the aggregate-only answer to the
  "fit a model per group" problem that usually reaches for
  ``applyInPandas``; sums are DECIMAL over 6-dp-rounded terms so
  partition order cannot perturb the fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# cumulative Poisson(1) CDF thresholds for k = 0..5 (12 dp literals;
# identical on the oracle side)
POISSON1_CDF = [
    0.367879441171,
    0.735758882343,
    0.919698602929,
    0.980988245005,
    0.996340153246,
    0.999405815182,
]


# same universal-hash family as the MinHash sketches: one expensive
# portable hash per ROW, then B cheap integer mixes derive the
# per-replica uniforms — B× fewer md5 rounds than hashing (row, b)
POISSON_P = 4294967311  # prime > 2^32


def row_hash(key: F.Column) -> F.Column:
    """Portable 60-bit row hash (md5 prefix, base-16 parsed)."""
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, 15), 16, 10
    ).cast("long")


def poisson_weight(h: F.Column, replica: F.Column) -> F.Column:
    """Deterministic Poisson(1) draw for (row-hash, replica):
    universal-hash mix → uniform in [0,1) → inverse-CDF lookup
    (k capped at 6)."""
    p = F.lit(POISSON_P)
    mixed = (
        (h % p) * (replica * 2 + 1) + (replica + 1) * F.lit(104729)
    ) % p
    u = mixed / p.cast("double")
    w = F.lit(len(POISSON1_CDF))
    for k in reversed(range(len(POISSON1_CDF))):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    return w


def poisson_bootstrap_mean(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_replicas: int = 200,
    decimal_scale: int = 2,
) -> DataFrame:
    """One bootstrap-replica mean per row: ``(replica, mean)``.

    Explodes each row into ``n_replicas`` (row, b) pairs, weights each
    by :func:`poisson_weight`, and aggregates ``sum(w·x)/sum(w)`` per
    replica. Weighted sums run on DECIMAL casts (exact, associative);
    the single double division per replica happens on identical
    operands in any engine. Zero-weight rows drop before the shuffle,
    so ~36.8% of the exploded stream never ships.
    """
    from pagerank_hadoop_spark.operators.dedup import _spread

    b = F.explode(F.sequence(F.lit(0), F.lit(n_replicas - 1))).alias("b")
    # the n_replicas× explode inherits the input's partitioning — a
    # 1-2-split parquet scan would serialize ~n_replicas·N rows onto
    # 2 cores (measured 47 s at sf0.1); spread small inputs first.
    # The md5 row hash is PROJECTED IN ITS OWN SELECT below, before
    # the generator select: a projection fused with the explode is
    # evaluated per OUTPUT row, i.e. n_replicas md5 rounds per input
    # row instead of one (measured 2.64 s → 0.80 s on the exploded
    # aggregate at sf0.1; same values — the hash is per-row constant).
    pre = _spread(df.select(key_col, value_col)).select(
        row_hash(F.col(key_col)).alias("__h"),
        F.col(value_col)
        .cast(f"decimal(28,{decimal_scale})")
        .alias("__x"),
    )
    rows = pre.select("__h", "__x", b)
    w = poisson_weight(F.col("__h"), F.col("b"))
    weighted = rows.select(
        "b", "__x", w.alias("__w")
    ).where(F.col("__w") > 0)
    return (
        weighted.groupBy("b")
        .agg(
            F.sum(F.col("__x") * F.col("__w")).alias("__swx"),
            F.sum("__w").alias("__sw"),
        )
        .select(
            "b",
            (F.col("__swx").cast("double") / F.col("__sw")).alias("mean"),
        )
    )


def group_ols_trend(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    x_unit_us: int = 3_600_000_000,
) -> DataFrame:
    """Per-key OLS ``y = a + m·x`` with x = time since the key's first
    observation, in units of ``x_unit_us`` microseconds (default:
    hours). Returns ``(key, n, slope, intercept)`` for keys whose x
    values are not all identical.

    One exchange: the window min(ts) and the groupBy share the key
    partitioning, so Catalyst reuses the shuffle. Per-term 6-dp
    rounding + DECIMAL(38,6) sums make the five sufficient statistics
    exact and order-independent; the final slope/intercept arithmetic
    is a handful of double ops on identical operands.
    """
    from pyspark.sql.window import Window

    t = F.unix_micros(F.col(ts_col))
    wk = Window.partitionBy(key_col)
    base = df.select(
        F.col(key_col).alias("key"),
        ((t - F.min(t).over(wk)).cast("double") / F.lit(float(x_unit_us))).alias(
            "x"
        ),
        F.col(value_col).cast("double").alias("y"),
    )
    d6 = "decimal(38,6)"
    sums = base.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("x"), 6).cast(d6)).alias("sx"),
        F.sum(F.round(F.col("y"), 6).cast(d6)).alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 6).cast(d6)).alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 6).cast(d6)).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    det = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / det
    intercept = (sy - slope * sx) / n
    return sums.where(det > F.lit(0.0)).select(
        "key",
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
    )
