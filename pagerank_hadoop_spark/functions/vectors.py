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
