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


def compact_parquet(
    spark,
    path: str,
    out_path: str,
    target_file_bytes: int = 512 << 20,
) -> DataFrame:
    """Small-file compaction — the table-maintenance pass every
    long-lived 100 TB dataset needs: streaming jobs, per-executor
    writes, and fine-grained partitioning all shed files far below
    the scan-efficient size, and every later query then pays one
    task + one footer read + one storage round trip PER FILE.

    Rewrites ``path`` into ``ceil(bytes / target_file_bytes)`` files
    at ``out_path`` and returns the compacted DataFrame. Sizing comes
    from the actual on-disk byte count (not row counts — row width
    varies); the rewrite is a ``repartition`` (round-robin, even
    output sizes), executed once, and is lossless by construction —
    the gated query hash-checks content against the oracle.

    On a cluster this runs per partition-directory with a manifest
    swap instead of an in-place overwrite; table formats
    (Delta/Iceberg OPTIMIZE) add the transactional commit on top of
    exactly this plan.

    Sizing goes through the Hadoop FileSystem API, so ``path`` may be
    any scheme Spark itself can read — ``file:/``, ``hdfs:/``,
    ``s3a:/`` — not just the local filesystem.
    """
    import math

    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = sum(
        st.getLen()
        for st in fs.listStatus(jpath)
        if st.isFile() and st.getPath().getName().endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)
