"""Stateful streaming sessionization (applyInPandasWithState)."""

from __future__ import annotations

import datetime as dt


def test_sessionize_stream(spark, tmp_path):
    from meds_transforms_spark.streaming.sessionize import sessionize_stream
    from meds_transforms_spark.schema import MEDS_DATA_SCHEMA

    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ev(subj, minutes):
        return (subj, base + dt.timedelta(minutes=minutes), "E", None, None)

    # subject 1: two sessions separated by a 90-minute gap;
    # subject 2: one session.
    rows = [ev(1, 0), ev(1, 10), ev(1, 20), ev(1, 110), ev(1, 115), ev(2, 0)]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, MEDS_DATA_SCHEMA).write.parquet(src)

    stream = (
        spark.readStream.schema(MEDS_DATA_SCHEMA)
        .parquet(src)
        .filter("time IS NOT NULL")
    )
    sessions = sessionize_stream(stream, gap_seconds=1800, timeout_ms=2000)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # The stateful query stays alive servicing state timeouts; poll the
    # sink for the closed session instead of waiting for termination.
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("SELECT * FROM sessions_out").count() > 0:
            break
        time.sleep(2)
    q.stop()

    got = spark.sql("SELECT * FROM sessions_out").collect()
    # With availableNow all data arrives in one batch: subject 1's FIRST
    # session closes (gap observed in-batch); the trailing sessions stay
    # in state awaiting timeout. The closed session is the contract.
    closed = {(r.subject_id, r.n_events) for r in got}
    assert (1, 3) in closed
    s1 = next(r for r in got if r.subject_id == 1)
    assert s1.session_start == base
    assert s1.session_end == base + dt.timedelta(minutes=20)


def test_sessionize_stream_ignores_null_times(spark, tmp_path):
    """Regression: NaT.astype(int64) is int64-min, which seeded a bogus
    1677-09-21 session (fresh key) or silently inflated n_events
    (existing key). Null-time events have no place on a session
    timeline and must be dropped inside the state function."""
    from meds_transforms_spark.schema import MEDS_DATA_SCHEMA
    from meds_transforms_spark.streaming.sessionize import sessionize_stream

    base = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ev(subj, minutes):
        t = None if minutes is None else base + dt.timedelta(minutes=minutes)
        return (subj, t, "E", None, None)

    rows = [ev(1, None), ev(1, 0), ev(1, 10), ev(1, 20), ev(1, 110), ev(1, 115)]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, MEDS_DATA_SCHEMA).write.parquet(src)

    stream = spark.readStream.schema(MEDS_DATA_SCHEMA).parquet(src)  # NO null filter
    sessions = sessionize_stream(stream, gap_seconds=1800, timeout_ms=2000)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_null_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("SELECT * FROM sessions_null_out").count() > 0:
            break
        time.sleep(2)
    q.stop()

    got = spark.sql("SELECT * FROM sessions_null_out").collect()
    assert got, "expected the first session to close in-batch"
    # no garbage pre-epoch session, and the real session is unpolluted
    assert all(r.session_start.year >= 2000 for r in got)
    closed = {(r.subject_id, r.n_events) for r in got}
    assert (1, 3) in closed
