"""Custom stateful sessionization (applyInPandasWithState).

Native `F.session_window` expresses pure gap-based sessions. Real event
pipelines often need a richer close rule; this operator sessionizes on
BOTH conditions:

  - inactivity gap: a new event more than `gap_seconds` after the
    session's last event starts a new session (the native rule), and
  - value cap: an event that would push the session's cumulative `value`
    past `value_cap` starts a new session (spend caps, token budgets,
    rate buckets — not expressible with session_window).

That composite close rule is exactly the "custom stateful operator"
carve-out: per-key state is the open session (start, last-seen, count,
running total); CLOSED sessions are emitted in append mode the moment an
incoming event closes them, and event-time timeouts flush sessions whose
gap elapses without a successor once the watermark passes.

Scale shape: state per active key is four scalars; the shuffle is the
groupBy(user) any sessionization needs. Out-of-order events are sorted
within each micro-batch; later-than-watermark stragglers are the
watermark contract's loss, same as any streaming session operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start_us", T.LongType(), False),
        T.StructField("session_end_us", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
        T.StructField("close_reason", T.StringType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _make_kernel(gap_seconds: int, value_cap: float):
    gap_us = gap_seconds * 1_000_000

    def kernel(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        uid = key[0]

        def closed(st, reason):
            return {
                "user_id": uid,
                "session_start_us": st[0],
                "session_end_us": st[1],
                "n_events": st[2],
                "total_value": st[3],
                "close_reason": reason,
            }

        if state.hasTimedOut:
            st = list(state.get)
            state.remove()
            yield pd.DataFrame([closed(st, "timeout")])
            return

        events = []
        for pdf in pdfs:
            for ts, v in zip(pdf["ts_us"], pdf["value"]):
                events.append((int(ts), float(v)))
        events.sort()
        st = list(state.get) if state.exists else None
        out = []
        for ts_us, v in events:
            if st is None:
                st = [ts_us, ts_us, 1, v]
                continue
            if ts_us - st[1] > gap_us:
                out.append(closed(st, "gap"))
                st = [ts_us, ts_us, 1, v]
            elif st[3] + v > value_cap:
                out.append(closed(st, "value_cap"))
                st = [ts_us, ts_us, 1, v]
            else:
                st[1] = ts_us
                st[2] += 1
                st[3] += v
        if st is not None:
            state.update(tuple(st))
            # flush via event-time timeout once the watermark passes the
            # open session's gap horizon
            state.setTimeoutTimestamp((st[1] + gap_us) // 1000)
        if out:
            yield pd.DataFrame(out)

    return kernel


def value_capped_sessions(
    events: DataFrame,
    gap_seconds: int = 1800,
    value_cap: float = 100.0,
    watermark: str = "1 hour",
) -> DataFrame:
    """Sessionize an event stream by inactivity gap AND cumulative value
    cap. Input needs columns (user_id, ts timestamp, value double);
    output follows SESSION_OUTPUT_SCHEMA, one row per CLOSED session."""
    from pyspark.sql import functions as F

    keyed = (
        events.withWatermark("ts", watermark)
        .select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            F.col("value").cast("double").alias("value"),
            "ts",
        )
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _make_kernel(gap_seconds, value_cap),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
