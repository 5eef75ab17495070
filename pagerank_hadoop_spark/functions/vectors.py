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


def jl_sign_matrix(d_in: int, d_out: int, seed: str = "jl") -> list[list[int]]:
    """±1 Johnson-Lindenstrauss projection matrix, derived from md5 so
    any engine (or the DuckDB oracle) can re-derive the identical
    matrix: sign[j][i] = +1 iff the first hex nibble of
    md5("{seed}:{i}:{j}") is 0-7. No fitted model to persist or
    broadcast — the matrix is a pure function of (d_in, d_out, seed)
    and ships as ~d_in·d_out plan literals (1 KB-scale), so a 100 TB
    corpus projects in a shuffle-free map."""
    import hashlib

    return [
        [
            1
            if hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[0] in "01234567"
            else -1
            for i in range(d_in)
        ]
        for j in range(d_out)
    ]


def jl_project(vec: Column | str, signs: list[list[int]]) -> Column:
    """Project an array<float/double> column to ``len(signs)`` dims:
    proj[j] = Σ_i sign[j][i]·vec[i] / sqrt(d_out). Achlioptas-style
    database-friendly JL transform — pure ``zip_with``/``aggregate``
    Column arithmetic (JVM codegen, no UDF, no shuffle). The left-fold
    accumulation order is fixed by the expression, so results are
    bit-deterministic across partitionings/engines.

    The scale role: a 64-float embedding becomes d_out doubles in a
    map-only pass; downstream pair screens (near-dup, ANN shortlist)
    run on the compressed vectors and only survivors touch the full-
    width column — the same "cheap sketch first, exact on candidates"
    shape as MinHash/PQ."""
    v = as_double_array(vec)
    inv = 1.0 / float(len(signs)) ** 0.5
    return F.array(
        *[
            (
                F.aggregate(
                    F.zip_with(
                        v,
                        F.array(*[F.lit(float(s)) for s in row]),
                        lambda x, s: x * s,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                * F.lit(inv)
            )
            for row in signs
        ]
    )


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


def mrl_truncate(vec: Column | str, dims: int) -> Column:
    """Matryoshka (MRL) truncation: keep the first ``dims`` dimensions
    and renormalize to unit length — the storage/serving knob of
    nested-representation embedding models, where prefixes are trained
    to be usable standalone. Pure slice + fold + transform Column
    arithmetic: a map-only pass that cuts vector bytes by d/dims with
    no shuffle and no model, composable in front of the ANN/near-dup
    screens exactly like jl_project (sketch first, full width only for
    survivors). Zero vectors pass through as zeros (no 0/0)."""
    s = F.slice(as_double_array(vec), 1, dims)
    n = F.sqrt(
        F.aggregate(
            F.zip_with(s, s, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return F.transform(s, lambda x: F.when(n > 0, x / n).otherwise(F.lit(0.0)))
