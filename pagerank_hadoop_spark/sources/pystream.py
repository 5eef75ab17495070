"""Streaming Python DataSource (PySpark 4 `DataSourceStreamReader`)
— the streaming half of the pluggable-source surface whose batch half
is `sources/wiki.py::XmlPagesDataSource`.

`detevents` is a deterministic replayable event stream (the shape of
a Kafka-topic replay without a broker): rows are a pure function of
their global index, offsets are row counts, each `latestOffset()`
call advances by one micro-batch of `rows_per_batch`, and every batch
is split into `n_parts` planned partitions read executor-side. A
bounded `n_total` makes any downstream aggregation a pure function of
the options — which is what lets a DuckDB oracle replay the stream's
answer exactly (`stream_pysource_tumbling`).

Row formula (epoch seconds; integer arithmetic only):

    ts_sec(i)  = 1704067200 + 37 * i        (2024-01-01 + 37s steps)
    user_id(i) = i % 50
    value(i)   = (i * 13) % 997

Scale notes: offsets are a single integer, so planning is O(1) per
batch regardless of history; partitions carry only (start, end) index
ranges; rows materialize executor-side inside `read()`. A production
source swaps the formula for a cursored read of the upstream system —
the offset/partition/commit protocol shown here is the whole
contract.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z


def event_row(i: int) -> tuple:
    """The deterministic event at global index ``i`` — shared by the
    stream reader and (re-stated in SQL) the DuckDB oracle."""
    return (i, EPOCH_2024 + 37 * i, i % 50, (i * 13) % 997)


try:  # Spark 4 streaming Python DataSource API
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _IdxRange(InputPartition):
        def __init__(self, start: int, end: int):
            self.start = start
            self.end = end

    class DetEventsStreamReader(DataSourceStreamReader):
        def __init__(self, options):
            self.n_total = max(0, int(options.get("n_total", 20000)))
            self.rows_per_batch = max(
                1, int(options.get("rows_per_batch", 4096))
            )
            self.n_parts = max(1, int(options.get("n_parts", 4)))
            self._pos = 0

        def initialOffset(self):
            return {"i": 0}

        def latestOffset(self):
            # one micro-batch per call: advance the visible end by
            # rows_per_batch until the bounded ledger is exhausted
            self._pos = min(self._pos + self.rows_per_batch, self.n_total)
            return {"i": self._pos}

        def partitions(self, start, end):
            s, e = int(start["i"]), int(end["i"])
            if e <= s:
                return [_IdxRange(s, s)]
            step = max(1, (e - s + self.n_parts - 1) // self.n_parts)
            return [
                _IdxRange(i, min(i + step, e)) for i in range(s, e, step)
            ]

        def read(self, partition):
            for i in range(partition.start, partition.end):
                yield event_row(i)

        def commit(self, end):
            pass  # nothing to clean up: the ledger is a formula

    class DetEventsDataSource(DataSource):
        """``spark.readStream.format("detevents")`` — options:
        ``n_total``, ``rows_per_batch``, ``n_parts``."""

        @classmethod
        def name(cls):
            return "detevents"

        def schema(self):
            return "event_id long, ts_sec long, user_id long, value long"

        def streamReader(self, schema):
            return DetEventsStreamReader(self.options)

    def register_detevents(spark: SparkSession) -> None:
        # idempotent per session (avoids DataSourceManager "replaced"
        # warnings in the bench stdout the driver parses)
        if getattr(spark, "_pgh_detevents_registered", False):
            return
        spark.dataSource.register(DetEventsDataSource)
        spark._pgh_detevents_registered = True

except ImportError:  # pragma: no cover - pre-4.0 pyspark

    def register_detevents(spark: SparkSession) -> None:
        raise ModuleNotFoundError(
            "pyspark.sql.datasource stream API unavailable; "
            "requires Spark 4+"
        )
