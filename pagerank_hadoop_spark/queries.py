"""Declared engine queries + matching DuckDB oracle SQL.

This is the registry behind ``__spark_entry__.py``: every operator from
SURVEY.md §2 gets a ``(spark, sf_dir) -> DataFrame`` callable here and,
when SQL-expressible, an equivalent ANSI-SQL string for the DuckDB
oracle. Column names/aliases match exactly on both sides (the driver
hash-compares values after sorting columns by name).

Float-determinism policy (SURVEY.md §7 "hard parts"):

* sums over ``double`` columns are computed on ``DECIMAL(38,4)`` casts
  in BOTH engines — decimal addition is exact and associative, so
  results are bitwise identical regardless of partition/summation
  order; the final value is cast back to ``double``.
* iterative PageRank ranks are rounded to 9 dp on both sides before
  ordering/compare.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from pagerank_hadoop_spark.operators.pagerank import pagerank, top_ranks
from pagerank_hadoop_spark.plans.oracle import pagerank_oracle_sql

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def dsum(col, alias: str):
    """Order-independent double sum: sum exact decimals, cast back."""
    return (
        F.sum(F.col(col).cast("decimal(38,4)")).cast("double").alias(alias)
    )


def _dsum_sql(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,4))) AS DOUBLE) AS {alias}"


# ---------------------------------------------------------------------------
# Flagship: PageRank over a link graph derived from lineitem
# (J2 + A1-A3 + C1-C3 + O1-O2 in one query — SURVEY.md §7 step 1)
# ---------------------------------------------------------------------------

_PAGERANK_EDGES_SQL = (
    "SELECT DISTINCT CAST(l_partkey AS VARCHAR) AS src, "
    "'s' || CAST(l_suppkey AS VARCHAR) AS dst FROM lineitem"
)


def _pagerank_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_partkey").cast("string").alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    ).distinct()


@register(
    "pagerank_topk",
    pagerank_oracle_sql(_PAGERANK_EDGES_SQL, n_iter=8, limit=20, threshold_num=1.0),
)
def q_pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference pipeline end-to-end: 8 iterations, threshold cut, sort.

    Parity semantics of PageRank.java:258-346 on a deterministic
    part→supplier citation graph. The reference's 5/N output cut
    (PageRank.java:336) would leave this bipartite graph empty, so the
    flagship uses 1/N; the 5/N form is covered by unit tests.
    """
    edges = _pagerank_edges(spark, sf_dir)
    ranks = pagerank(edges, n_iter=8, parity=True)
    n = ranks.count()
    out = top_ranks(ranks, n, threshold=1.0 / n)
    return (
        out.select("id", F.round("rank", 9).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("id"))
        .limit(20)
    )
