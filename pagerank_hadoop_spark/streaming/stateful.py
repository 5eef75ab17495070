"""Custom stateful streaming operators via ``applyInPandasWithState``
([EXT] E6 escape hatch).

Spark's built-in windows cover tumbling/sliding/session aggregation;
anything beyond (cross-batch exact dedup, running per-key counters
with custom eviction) needs arbitrary keyed state. The pattern here is
the scale-correct one for 100 TB streams:

* state is keyed (sharded by the stream's hash partitioning — no
  global structures);
* per-key state is bounded (a set of seen ids per key here; long-
  running deployments pass ``state_ttl_ms`` to evict idle keys);
* the user function is Arrow-batched pandas, not row-at-a-time.
"""

from __future__ import annotations

import importlib.util
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def _has_protobuf() -> bool:
    """find_spec raises (not returns None) when the parent ``google``
    namespace package is absent entirely."""
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


DEDUP_OUTPUT_SCHEMA = "user_id long, event_id long, n_dups_dropped long"
DEDUP_STATE_SCHEMA = "seen array<long>"


def stateful_dedup_stream(events: DataFrame, state_ttl_ms: int | None = None) -> DataFrame:
    """Cross-batch exact dedup of (user_id, event_id) with custom
    keyed state — the applyInPandasWithState form of E1 on a stream.

    Input must be a streaming DataFrame with ``user_id``/``event_id``
    columns. Output: first occurrence of each event id per user, plus
    how many duplicates the current batch dropped for that user.

    ``state_ttl_ms`` enables processing-time eviction of idle keys.
    Leave it ``None`` for bounded replays (availableNow backfills):
    with a timeout configured, Spark schedules extra no-data
    micro-batches to check timers, which a bounded trigger never
    drains.
    """

    def dedup_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state_ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        (user_id,) = key
        seen: set[int] = set(state.get[0]) if state.exists else set()
        out_ids: list[int] = []
        dropped = 0
        for pdf in pdfs:
            for eid in pdf["event_id"]:
                eid = int(eid)
                if eid in seen:
                    dropped += 1
                else:
                    seen.add(eid)
                    out_ids.append(eid)
        state.update((sorted(seen),))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_ids),
                "event_id": out_ids,
                "n_dups_dropped": [dropped] * len(out_ids),
            }
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            dedup_fn,
            outputStructType=DEDUP_OUTPUT_SCHEMA,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4.x arbitrary-state API)
# ---------------------------------------------------------------------------

TWS_OUTPUT_SCHEMA = "user_id long, n_events long, max_value double"
TWS_STATE_SCHEMA = "n long, mx double"


def running_user_stats_stream(events: DataFrame) -> DataFrame:
    """Per-user running (count, max) via ``transformWithStateInPandas``
    — the Spark 4 successor to ``applyInPandasWithState``: typed state
    handles (Value/List/MapState), timers, and TTL live on a
    ``StatefulProcessor`` object instead of a closure, and the state
    store is RocksDB (disk-backed, changelog-checkpointed), which is
    what lets per-key state exceed executor memory at 100 TB stream
    scale.

    Both running aggregates are order-insensitive (count, max), so the
    drained result is batch-reproducible — the oracle is a plain
    GROUP BY.

    Runtime dependency: the transformWithState Python worker speaks a
    protobuf state protocol (``pyspark.sql.streaming.proto``), so it
    needs the ``protobuf`` package at executor runtime. This container
    ships pyspark without it, so the operator is build-complete but
    not registered in ``queries()``; the test suite skips it when
    ``google.protobuf`` is absent. applyInPandasWithState
    (:func:`stateful_dedup_stream`) covers the gated custom-state
    path meanwhile.
    """
    if not _has_protobuf():
        raise ModuleNotFoundError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(pyspark's streaming state protocol); install protobuf or "
            "use stateful_dedup_stream (applyInPandasWithState) instead"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningUserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState("stats", TWS_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, mx = 0, None
            if self._stats.exists():
                prev = self._stats.get()
                n, mx = int(prev[0]), float(prev[1])
            for pdf in rows:
                n += len(pdf)
                batch_max = float(pdf["value"].max())
                mx = batch_max if mx is None else max(mx, batch_max)
            self._stats.update((n, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
            )

        def close(self) -> None:
            pass

    spark = events.sparkSession
    # transformWithState requires the RocksDB state store provider.
    # NOTE: this is a SESSION-wide conf with no per-query scope — it
    # stays set, and later streams (including ones resuming HDFS-
    # backed checkpoints, which would then fail on provider mismatch)
    # inherit it. Callers mixing state-store providers in one session
    # must manage the conf themselves.
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_RunningUserStats(),
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


# ---------------------------------------------------------------------------
# Event-time TTL dedup (value-checked arbitrary-state semantics)
# ---------------------------------------------------------------------------

TTL_OUTPUT_SCHEMA = "user_id long, event_id long, ts_ms long"
TTL_STATE_SCHEMA = "ids array<long>, last_ms array<long>"


def _ttl_dedup_core(
    seen: dict[int, int],
    rows: list[tuple[int, int]],
    ttl_ms: int,
) -> tuple[list[tuple[int, int]], dict[int, int]]:
    """Pure per-key TTL-dedup step, factored out of the streaming
    closure so unit tests can drive state transitions directly.

    ``seen`` maps event_id -> last-seen epoch-ms; ``rows`` is this
    batch's (event_id, ms) list. An occurrence is a duplicate iff the
    same id was seen within ``ttl_ms`` BEFORE it (strict: gap > ttl
    re-admits); every occurrence — emitted or dropped — refreshes
    last-seen, so the rule equals a per-occurrence ``lag`` over the
    full history, which is the SQL oracle. Rows are processed in
    (ms, event_id) order. Returns (emitted rows, new state) with
    entries older than ``batch_max - ttl`` evicted — safe exactly
    because batches replay in event-time order (ts_split_events_dir),
    so no later occurrence can be within TTL of an evicted entry.
    """
    emitted: list[tuple[int, int]] = []
    batch_max = None
    for eid, ms in sorted(rows, key=lambda r: (r[1], r[0])):
        last = seen.get(eid)
        if last is None or ms - last > ttl_ms:
            emitted.append((eid, ms))
        seen[eid] = ms if last is None else max(last, ms)
        batch_max = ms if batch_max is None else max(batch_max, ms)
    if batch_max is not None:
        seen = {
            eid: ms for eid, ms in seen.items() if ms >= batch_max - ttl_ms
        }
    return emitted, seen


def stateful_dedup_ttl_stream(events: DataFrame, ttl_ms: int) -> DataFrame:
    """Cross-batch dedup with EVENT-TIME TTL re-admission — the
    arbitrary-state semantics gate VERDICT r2 #6 asked for: unlike
    :func:`stateful_dedup_stream` (seen-forever), an id is suppressed
    only while its last occurrence is <= ``ttl_ms`` old, and state
    entries older than the TTL horizon are EVICTED each batch (the
    bounded-state posture for 100 TB streams: state size is O(ids
    active in the TTL window), not O(all ids ever)).

    Deterministic and batch-equivalent by construction: feed it
    micro-batches in event-time order (``ts_split_events_dir`` +
    ``maxFilesPerTrigger=1``) and the drained result equals the
    batch SQL ``lag(ms) OVER (PARTITION BY user_id, event_id ORDER
    BY ms)`` re-admission rule — a hash-checkable oracle, which
    processing-time timers can never be (wall clock in the result).

    Input: streaming DataFrame with ``user_id``/``event_id``/``ts``
    (timestamp). Output: emitted occurrences (user_id, event_id,
    ts_ms).
    """

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        seen: dict[int, int] = (
            dict(zip(*(state.get[0], state.get[1]))) if state.exists else {}
        )
        rows: list[tuple[int, int]] = []
        for pdf in pdfs:
            s = pdf["ts"]
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            ms = (
                s.astype("datetime64[ns]").astype("int64") // 1_000_000
            ).tolist()
            rows.extend(zip((int(e) for e in pdf["event_id"]), ms))
        emitted, seen = _ttl_dedup_core(seen, rows, ttl_ms)
        ids = sorted(seen)
        state.update((ids, [seen[i] for i in ids]))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(emitted),
                "event_id": [e for e, _ in emitted],
                "ts_ms": [m for _, m in emitted],
            }
        )

    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=TTL_OUTPUT_SCHEMA,
            stateStructType=TTL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
