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


# ---------------------------------------------------------------------
# Event-time sessionization with exact batch parity
# ---------------------------------------------------------------------

SESS_OUTPUT_SCHEMA = (
    "user_id long, start_us long, end_us long, n_events long, sum_value_e2 long"
)
# open-tail session aggregate only — state is O(1) per key, NOT a buffer
# of events (the thing that would OOM a 100 TB stream)
SESS_STATE_SCHEMA = "start_us long, last_us long, n long, s long"


def sessionize_event_time(
    stream: DataFrame, gap_us: int = 1_800_000_000
) -> DataFrame:
    """Per-user EVENT-TIME sessionization over a stream of
    (user_id, ts_us, event_id, val_e2) rows — the streaming twin of
    queries_events.q_events_sessionize, with the same closed-session
    contract: a session ends when the next event of the same user is more
    than ``gap_us`` later in event time.

    Session closing is DATA-DRIVEN: within each micro-batch the user's
    events are sorted and split on gaps, and any session followed by a
    later event is emitted immediately — so parity with the batch
    gaps-and-islands query needs no timeout choreography (the
    EventTimeTimeout only provides liveness for the final open tail; in
    tests a per-user sentinel event flushes it deterministically).

    State carries ONLY the open-tail aggregate (start, last, n, sum) —
    O(1) per key regardless of session length, the invariant that keeps
    this runnable over an unbounded stream. Requires ``withWatermark`` on
    the source; events later than the watermark are dropped by Spark
    upstream (standard late-data semantics).
    """

    def update(key, pdfs, state):
        import pandas as pd  # noqa: PLC0415 (executor-side import)

        if state.hasTimedOut:
            start, last, n, s = state.get
            state.remove()
            yield pd.DataFrame(
                [(key[0], start, last, n, s)],
                columns=["user_id", "start_us", "end_us", "n_events", "sum_value_e2"],
            )
            return
        chunks = [pdf for pdf in pdfs if len(pdf)]
        out = []
        if chunks:
            import numpy as np  # noqa: PLC0415

            ev = pd.concat(chunks).sort_values(["ts_us", "event_id"])
            ts = ev["ts_us"].to_numpy()
            val = ev["val_e2"].to_numpy()
            # vectorized gaps-and-islands: group boundaries where the
            # event-time gap exceeds gap_us; per-GROUP aggregation via
            # cumsum ranges (per-session work, not per-event)
            idx = np.flatnonzero(np.diff(ts) > gap_us) + 1
            starts = np.concatenate([[0], idx])
            ends = np.concatenate([idx, [len(ts)]])
            cs = np.concatenate([[0], np.cumsum(val)])
            groups = [
                (int(ts[a]), int(ts[b - 1]), int(b - a), int(cs[b] - cs[a]))
                for a, b in zip(starts, ends)
            ]
            if state.exists:
                st_start, st_last, st_n, st_s = state.get
                if int(ts[0]) - st_last <= gap_us:
                    g0 = groups[0]
                    groups[0] = (st_start, g0[1], st_n + g0[2], st_s + g0[3])
                else:
                    out.append((key[0], st_start, st_last, st_n, st_s))
            out.extend((key[0], *g) for g in groups[:-1])
            start, last, n, s = groups[-1]
            state.update((start, last, n, s))
            state.setTimeoutTimestamp(last // 1000 + gap_us // 1000)
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "start_us", "end_us", "n_events", "sum_value_e2"],
            )

    from pyspark.sql.streaming.state import GroupStateTimeout as _T

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESS_OUTPUT_SCHEMA,
        stateStructType=SESS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=_T.EventTimeTimeout,
    )
