"""cohort_retention unit tests."""

from __future__ import annotations

import datetime as dt

import pytest


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_weekly_retention_matrix(spark):
    from meds_transforms_spark.operators.retention import cohort_retention

    w0 = dt.datetime(2026, 1, 5)  # a Monday
    w1 = w0 + dt.timedelta(days=7)
    w2 = w0 + dt.timedelta(days=14)
    rows = [
        # cohort w0: users 1,2,3; user 1 returns w1+w2, user 2 returns w2
        (1, w0), (1, w1 + dt.timedelta(days=2)), (1, w2),
        (2, w0 + dt.timedelta(days=3)), (2, w2 + dt.timedelta(days=6)),
        (3, w0),
        # cohort w1: user 4, returns w2
        (4, w1), (4, w2 + dt.timedelta(days=1)),
    ]
    out = {
        (r.cohort, r.offset): (r.n_users, r.retention_rate)
        for r in cohort_retention(_ev(spark, rows), period="week").collect()
    }
    d0, d1 = w0.date(), w1.date()
    assert out[(d0, 0)] == (3, 1.0)
    assert out[(d0, 1)] == (1, pytest.approx(1 / 3))
    assert out[(d0, 2)] == (2, pytest.approx(2 / 3))
    assert out[(d1, 0)] == (1, 1.0)
    assert out[(d1, 1)] == (1, 1.0)
    assert len(out) == 5


def test_multiple_events_same_period_count_once(spark):
    from meds_transforms_spark.operators.retention import cohort_retention

    d = dt.datetime(2026, 3, 2)
    rows = [(1, d), (1, d + dt.timedelta(hours=5)), (1, d + dt.timedelta(days=1))]
    out = cohort_retention(_ev(spark, rows), period="week").collect()
    assert len(out) == 1
    assert out[0].n_users == 1 and out[0].offset == 0


def test_monthly_offsets_cross_year(spark):
    from meds_transforms_spark.operators.retention import cohort_retention

    rows = [
        (1, dt.datetime(2025, 11, 20)),
        (1, dt.datetime(2026, 2, 3)),  # 3 months later, across new year
    ]
    out = {r.offset for r in cohort_retention(_ev(spark, rows), period="month").collect()}
    assert out == {0, 3}


def test_max_offset_truncates(spark):
    from meds_transforms_spark.operators.retention import cohort_retention

    base = dt.datetime(2026, 1, 1)
    rows = [(1, base)] + [(1, base + dt.timedelta(days=7 * k)) for k in (1, 5, 9)]
    out = cohort_retention(_ev(spark, rows), period="week", max_offset=5)
    assert {r.offset for r in out.collect()} == {0, 1, 5}


def test_invalid_period_raises(spark):
    from meds_transforms_spark.operators.retention import cohort_retention

    with pytest.raises(ValueError, match="period"):
        cohort_retention(_ev(spark, []), period="year")


def test_event_transitions_matrix(spark):
    from meds_transforms_spark.operators.retention import event_transitions

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, t0, "view"), (1, t0 + dt.timedelta(minutes=1), "click"),
        (1, t0 + dt.timedelta(minutes=2), "buy"),
        (2, t0, "view"), (2, t0 + dt.timedelta(minutes=3), "click"),
        (3, t0, "view"),  # single event: no transition
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        (r.from_type, r.to_type): r.n
        for r in event_transitions(df).collect()
    }
    assert out == {("view", "click"): 2, ("click", "buy"): 1}


def test_retention_ignores_null_timestamps(spark):
    """Regression: a NULL-ts event produced a (cohort, NULL) cell that
    sorted NULLS-FIRST into the denominator window, replacing the
    cohort size and inflating every rate (often past 1.0)."""
    import datetime as dt

    from meds_transforms_spark.operators.retention import cohort_retention

    d0 = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(10):
        rows.append((u, d0))
        if u < 5:
            rows.append((u, d0 + dt.timedelta(days=1)))
    rows.append((0, None))  # stray NULL-ts event
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r.offset: (r.n_users, r.retention_rate) for r in cohort_retention(df, period="day").collect()}
    assert out[0] == (10, 1.0)
    assert out[1] == (5, 0.5)
    assert None not in out
