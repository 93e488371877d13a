"""Stateful streaming sessionization — applyInPandasWithState.

The reference has no streaming at all (SURVEY §2.9); this is the
Structured-Streaming-native custom stateful operator the instructions'
scale brief calls for: gap-based sessions per subject, state bounded by
a processing-time timeout.

Semantics: events for a subject belong to one session while the gap
between consecutive event times stays under ``gap``; a longer gap (or
state timeout) closes the session and emits one summary row.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("subject_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    timeout_ms: int = 60_000,
    time_col: str = "time",
    subject_col: str = "subject_id",
) -> DataFrame:
    """Streaming DataFrame → closed-session summaries per subject."""
    gap_us = gap_seconds * 1_000_000

    def update(
        key, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (subject,) = key
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "subject_id": [subject],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                }
            )
            return

        times: list[int] = []
        for pdf in batches:
            ts = pd.to_datetime(pdf[time_col])
            # NaT.astype(int64) is int64-min, which would seed a bogus
            # 1677-09-21 session (or silently inflate n_events) — an
            # event with no time has no place on a session timeline.
            ts = ts[ts.notna()].astype("int64") // 1000  # ns→µs
            times.extend(int(t) for t in ts)
        times.sort()
        if not times:
            return

        sessions = []
        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us, end_us, n = times[0], times[0], 0
        for t in times:
            if t - end_us > gap_us:
                sessions.append((start_us, end_us, n))
                start_us, n = t, 0
            end_us = max(end_us, t)
            n += 1
        state.update((start_us, end_us, n))
        state.setTimeoutDuration(timeout_ms)
        if sessions:
            yield pd.DataFrame(
                {
                    "subject_id": [subject] * len(sessions),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in sessions],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in sessions],
                    "n_events": [c for _, _, c in sessions],
                }
            )

    return events.groupBy(subject_col).applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
