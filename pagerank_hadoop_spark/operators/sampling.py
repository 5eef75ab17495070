"""Deterministic sampling + ordering operators for corpus work ([EXT]).

A 100 TB training pipeline needs samples that are (a) reproducible
across retries and engine versions, (b) stable under corpus growth —
a document's membership must never depend on which other rows exist —
and (c) cheap: no global sort, no RNG state shipped to executors.

All operators here key off the same engine-portable hash family as
``operators.curation.split_bucket`` (hex-truncated md5 of the row id),
so every sample is oracle-checkable in ANSI SQL and identical in
Spark, DuckDB, and plain Python. ``Math.random``-style sampling
(``df.sample``) is kept out of declared queries on purpose: it is
seed × partitioning dependent, which breaks both the oracle gate and
backfill reproducibility.

Scale posture:

* ``hash_sample`` / ``stratified_sample`` are stateless per-row
  filters — they push down to the scan side of every plan, shuffle
  nothing, and compose with later joins/aggs as ordinary predicates.
* ``deterministic_shuffle`` totally orders rows by a salted hash —
  a range-partitioned sort on an 8-byte key, the standard way to
  produce a reproducible global training order. The payload sorts by
  the key; only the key participates in range exchange sampling.
* ``reservoir_per_key`` takes exactly ``k`` rows per group via a
  hash-ordered ``row_number`` window — bounded memory per key, no
  driver involvement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# 16^6 buckets; plenty of resolution for per-mille sampling rates
_HASH_SPAN = 16**6


def sample_key(id_col: Column, salt: str = "") -> Column:
    """Uniform integer in [0, 16^6) derived from md5(salt || id) —
    bit-identical across engines (Spark `conv`, DuckDB `'0x'||`,
    Python `int(..., 16)`)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 6),
            16,
            10,
        )
        .cast("long")
    )


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose hash bucket
    falls below ``fraction`` of the hash span.

    Unlike ``DataFrame.sample`` this is row-content-addressed — stable
    across retries, partitioning changes, and engine versions — and is
    a plain pushdown-able filter (no RNG, no shuffle).
    """
    cut = int(fraction * _HASH_SPAN)
    return df.where(sample_key(F.col(id_col), salt) < cut)


def stratified_sample(
    df: DataFrame, id_col: str, fractions: dict[str, float], strata_col: str, salt: str = ""
) -> DataFrame:
    """Per-stratum deterministic sample (e.g. downsample dominant
    languages, keep 100% of rare ones). Strata missing from
    ``fractions`` are dropped — the common curation contract."""
    key = sample_key(F.col(id_col), salt)
    pred = F.lit(False)
    for stratum, fraction in sorted(fractions.items()):
        cut = int(fraction * _HASH_SPAN)
        pred = pred | ((F.col(strata_col) == stratum) & (key < cut))
    return df.where(pred)


def deterministic_shuffle(
    df: DataFrame, id_col: str, salt: str = "shuffle"
) -> DataFrame:
    """Reproducible global shuffle for training order: total sort by
    (salted hash, id). The trailing ``id_col`` tiebreak makes the
    order a strict total order even on hash collisions."""
    return df.orderBy(
        sample_key(F.col(id_col), salt).asc(), F.col(id_col).asc()
    )


def reservoir_per_key(
    df: DataFrame, key_cols: list[str], id_col: str, k: int, salt: str = ""
) -> DataFrame:
    """Exactly ``min(k, |group|)`` deterministic rows per key — the
    distributed stand-in for per-key reservoir sampling. Hash-ordered
    ``row_number`` keeps selection content-addressed; the window sort
    is per-key (never global) and AQE splits skewed keys."""
    w = Window.partitionBy(*key_cols).orderBy(
        sample_key(F.col(id_col), salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def mixture_rebalance(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    weight_col: str,
    budget_frac: float,
    salt: str = "mix",
) -> DataFrame:
    """Rebalance a multi-source corpus to an equal-share token budget.

    The dataset-mixing step of a pretraining pipeline: given a total
    budget of ``budget_frac`` × Σweight (chars/tokens), give every
    source an equal share; sources over their share are downsampled
    with the deterministic content-addressed Bernoulli filter
    (:func:`sample_key`), sources under it keep everything
    (keep-fraction capped at 1).

    Scale shape: per-source masses are a tiny aggregate (one row per
    source) broadcast back onto the corpus — the 100 TB scan happens
    once, with a pushdown-able hash filter; no RNG state, no shuffle
    of payloads, reproducible across retries/partitionings/engines.
    Derived keep-fractions stay in exact-int sums + one fixed-order
    double expression so the DuckDB oracle computes bit-identical
    thresholds.
    """
    # one row per source — pin it: it feeds both the total rollup and
    # the fraction table, and unpinned each consumer re-runs the
    # corpus-sized aggregate (two extra 100 TB scans)
    mass = (
        df.groupBy(stratum_col)
        .agg(F.sum(weight_col).alias("__mass"))
        .localCheckpoint(eager=True)
    )
    tot = mass.agg(
        F.sum("__mass").alias("__total"), F.count(F.lit(1)).alias("__k")
    )
    frac = mass.crossJoin(F.broadcast(tot)).select(
        stratum_col,
        F.least(
            F.lit(1.0),
            F.lit(budget_frac) * F.col("__total") / F.col("__k") / F.col("__mass"),
        ).alias("__frac"),
    )
    return (
        df.join(F.broadcast(frac), stratum_col)
        .where(
            sample_key(F.col(id_col), salt)
            < F.floor(F.col("__frac") * F.lit(float(_HASH_SPAN))).cast("long")
        )
        .drop("__frac")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    salt: str = "aes",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via Efraimidis–Spirakis
    A-ES keys: each row gets ``key = u^(1/w)`` with ``u`` uniform in
    (0,1] derived from md5(salt || id) (:func:`sample_key` — no RNG
    state, reproducible across engines/retries/partitionings), and
    the k largest keys win. Inclusion probability is proportional to
    weight, one pass, no replacement — the standard way to draw a
    quality-weighted training subset from a 100 TB corpus.

    Plan shape: a map computes the key, then global top-k =
    ``TakeOrderedAndProject`` (k rows to the driver-side heap per
    partition, never a full sort). Rows with weight <= 0 are
    excluded (A-ES is undefined there).

    Determinism across engines: the key is floored to integer
    nanos (1e9) before ranking with an id tie-break — ``pow`` may
    differ in final ulps between libms, and ranking on the rounded
    key makes the selected SET identical (repo float discipline).
    """
    u = (sample_key(F.col(id_col), salt) + 1) / F.lit(float(16**6 + 1))
    key = F.floor(
        F.pow(u, 1.0 / F.col(weight_col).cast("double")) * 1e9
    ).cast("long")
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("aes_key", key)
        .orderBy(F.desc("aes_key"), F.col(id_col))
        .limit(k)
    )
