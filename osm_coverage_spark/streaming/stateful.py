"""Custom stateful streaming operator: per-key session aggregation via
``applyInPandasWithState`` — the Structured-Streaming extension point the
reference's batch pipeline never needed but a continuously-updating
coverage/ingest service would (SURVEY §2.10 'Spark mapping').

Sessionizes an event stream per key with a gap timeout: state carries
(count, last_seen); a session row is emitted when the watermark passes
last_seen + gap.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, n_events long, first_ts timestamp, last_ts timestamp"
STATE_SCHEMA = "n long, first_ts timestamp, last_ts timestamp"


def sessionize(
    stream: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    gap_ms: int = 30_000,
) -> DataFrame:
    """Group the stream by ``key_col`` and emit one row per closed session
    (no events for ``gap_ms``). Uses processing-time timeouts so the test
    harness can close sessions deterministically by advancing batches."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, first_ts, last_ts = state.get
            state.remove()
            yield pd.DataFrame(
                [(key[0], n, first_ts, last_ts)],
                columns=["key", "n_events", "first_ts", "last_ts"],
            )
            return
        n, first_ts, last_ts = (state.get if state.exists else (0, None, None))
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ts = pd.to_datetime(pdf[ts_col])
            n += len(pdf)
            lo, hi = ts.min(), ts.max()
            first_ts = lo if first_ts is None or lo < first_ts else first_ts
            last_ts = hi if last_ts is None or hi > last_ts else last_ts
        state.update((n, first_ts, last_ts))
        state.setTimeoutDuration(gap_ms)
        yield pd.DataFrame(columns=["key", "n_events", "first_ts", "last_ts"])

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
