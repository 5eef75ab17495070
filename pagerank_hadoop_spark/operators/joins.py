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

from pyspark.sql import DataFrame, functions as F


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
