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

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

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
