"""Vector (array<float/double>) column expressions — no UDFs.

Used by the similarity-search operators (SURVEY.md §2.8 E3). Pure
array expressions (``zip_with`` / ``aggregate``) run JVM-side; a Pandas
UDF alternative exists in ``operators.similarity`` for very wide
vectors where Arrow-batched NumPy wins.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-order dot product (matches a scalar loop bit-for-bit)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cosine = dot(a,b) / (||a||·||b||); arrays should be double."""
    return dot(a, b) / (norm(a) * norm(b))


def as_double_array(a: Column | str) -> Column:
    return _c(a).cast("array<double>")


def morton_key(a, b):
    """64-bit Z-order (Morton) key: the bits of two 32-bit-ranged
    columns interleaved — rows sorted by this key cluster rows close
    in BOTH dimensions into the same parquet row groups, so min/max
    stats prune scans filtered on either column (the technique behind
    Delta/Iceberg OPTIMIZE ZORDER, expressed as plain Column bit
    arithmetic — no engine extension needed).

    Classic closed-form bit spreading: five mask-and-shift rounds per
    input (all JVM-side, codegen-friendly), then even/odd bit merge.
    Inputs must be non-negative and < 2^31.
    """
    from pyspark.sql import functions as F

    def spread(x):
        x = x.cast("long")
        for shift, mask in (
            (16, 0x0000FFFF0000FFFF),
            (8, 0x00FF00FF00FF00FF),
            (4, 0x0F0F0F0F0F0F0F0F),
            (2, 0x3333333333333333),
            (1, 0x5555555555555555),
        ):
            x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
        return x

    return spread(a).bitwiseOR(F.shiftleft(spread(b), 1))
