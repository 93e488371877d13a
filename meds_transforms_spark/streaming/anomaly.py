"""Stateful streaming anomaly detection — applyInPandasWithState.

The streaming analog of ``operators/anomaly.rolling_anomaly``: per key,
maintain running count / mean / M2 (Welford's online algorithm — the
numerically stable update, O(1) state per key) and emit every event
with its z-score against the statistics ACCUMULATED BEFORE it. Batch
windows look backward over a time range; a stream can't re-read its
past, so the state IS the window — the classic monitoring topology
(billing alarms, metric watchdogs, abuse detection).

State is three doubles + a long per key, bounded by key cardinality
and a processing-time timeout (idle keys expire). WITHIN a batch,
events process in event-time order; per-event decisions are therefore
independent of micro-batch boundaries only under in-order arrival — a
late event delivered in a later micro-batch scores against state that
already includes newer events, where a single batch would have ordered
it earlier. That is inherent to single-pass streaming state (the batch
operator re-sorts globally; a stream cannot re-read its past).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ANOMALY_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("seen_before", T.LongType()),
        T.StructField("z_score", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("m2", T.DoubleType()),
    ]
)


def anomaly_stream(
    events: DataFrame,
    key_col: str = "event_type",
    time_col: str = "ts",
    value_col: str = "value",
    z_threshold: float = 3.0,
    min_events: int = 10,
    timeout_ms: int = 600_000,
) -> DataFrame:
    """Streaming DataFrame → every event annotated with its z-score
    against the key's running (pre-event) statistics."""

    def update(
        key, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (k,) = key
        if state.hasTimedOut:
            state.remove()
            return

        rows = []
        for pdf in batches:
            rows.append(pdf[[time_col, value_col]])
        if not rows:
            return
        pdf = pd.concat(rows).sort_values(time_col)

        if state.exists:
            n, mean, m2 = state.get
        else:
            n, mean, m2 = 0, 0.0, 0.0

        out = {c: [] for c in ("event_time", "value", "seen_before", "z_score", "is_anomaly")}
        for t, v in zip(pdf[time_col], pdf[value_col]):
            # NULL/NaN values emit an unjudged row and are EXCLUDED from
            # the update: one bad reading must not poison the key's
            # state into all-NaN (silently disabling detection forever)
            if pd.isna(v):
                out["event_time"].append(t)
                out["value"].append(None)
                out["seen_before"].append(n)
                out["z_score"].append(None)
                out["is_anomaly"].append(False)
                continue
            v = float(v)
            z = None
            if n >= min_events and m2 > 0:
                var = m2 / n  # population variance of what's been seen
                z = (v - mean) / (var ** 0.5)
            out["event_time"].append(t)
            out["value"].append(v)
            out["seen_before"].append(n)
            out["z_score"].append(z)
            out["is_anomaly"].append(bool(z is not None and z > z_threshold))
            # Welford update AFTER judging — the event never scores
            # against statistics it contributed to
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)

        state.update((n, mean, m2))
        state.setTimeoutDuration(timeout_ms)
        res = pd.DataFrame(out)
        res.insert(0, "key", k)
        yield res

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=ANOMALY_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
