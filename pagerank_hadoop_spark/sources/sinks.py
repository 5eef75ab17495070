"""Parquet sinks with the layouts that matter at 100 TB (S3 upgrade).

The reference sinks every job to tab-separated text
(``PageRank.java:445,513,...``). Here intermediates stay as cached
DataFrames and only final results land on storage — columnar, and laid
out so the NEXT reader's plan is cheap:

* ``write_partitioned`` — hive-style directory partitioning: readers
  filtering on the partition column scan only matching directories
  (partition pruning, asserted in tests).
* ``write_bucketed_table`` — pre-hashed bucket files: a join or
  aggregation on the bucket column needs NO shuffle at read time
  (asserted in tests: zero Exchange in the joined plan). This is how
  an iterative workload (PageRank adjacency) or a repeatedly-joined
  dimension avoids paying the same shuffle every run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet: one directory tree level per column.

    Keep partition columns low-cardinality (date, type, language);
    high-cardinality partitioning creates small-file storms.
    """
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (pre-shuffled) parquet table in the session catalog.

    ``num_buckets`` should match the downstream join's parallelism
    scale — at 100 TB typically 1024-4096; co-bucketed tables (same
    column, same count) join with zero exchanges.
    """
    writer = df.write.bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.mode(mode).format("parquet").saveAsTable(table)
