"""Tests for rolling_anomaly (operators/anomaly)."""

from __future__ import annotations

import datetime as dt


def _ev(spark, rows):
    return spark.createDataFrame(rows, "event_id long, k string, ts timestamp, value double")


def test_anomaly_flags_spike_only(spark):
    from meds_transforms_spark.operators.anomaly import rolling_anomaly

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, "a", t0 + dt.timedelta(minutes=i), 10.0 + (i % 3) * 0.5) for i in range(20)]
    rows.append((99, "a", t0 + dt.timedelta(minutes=21), 500.0))  # the spike
    out = {
        r.event_id: r
        for r in rolling_anomaly(
            _ev(spark, rows), keys="k", time_col="ts", value_col="value",
            window_seconds=3600, z_threshold=3.0, min_events=10,
        ).collect()
    }
    assert out[99].is_anomaly
    assert not any(out[i].is_anomaly for i in range(20))
    # window counts accumulate
    assert out[0].w_n == 1 and out[99].w_n == 21  # 20 priors + itself


def test_anomaly_min_events_guard(spark):
    from meds_transforms_spark.operators.anomaly import rolling_anomaly

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, "a", t0, 1.0), (2, "a", t0 + dt.timedelta(seconds=10), 100.0)]
    out = rolling_anomaly(
        _ev(spark, rows), keys="k", time_col="ts", value_col="value",
        min_events=10,
    ).collect()
    assert not any(r.is_anomaly for r in out)  # too few events to judge


def test_anomaly_constant_series_no_div_zero(spark):
    from meds_transforms_spark.operators.anomaly import rolling_anomaly

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, "a", t0 + dt.timedelta(seconds=i), 7.0) for i in range(15)]
    out = rolling_anomaly(
        _ev(spark, rows), keys="k", time_col="ts", value_col="value", min_events=5
    ).collect()
    assert all(r.z_score is None and not r.is_anomaly for r in out)


def test_anomaly_null_timestamp_rows_pass_through_unjudged(spark):
    """NULL-ts rows would otherwise share one RANGE frame per key and
    be flagged against each other — they must pass through unjudged."""
    from meds_transforms_spark.operators.anomaly import rolling_anomaly

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, "a", t0 + dt.timedelta(minutes=i), 10.0) for i in range(12)]
    rows += [(100, "a", None, 10.0), (101, "a", None, 9999.0)]
    out = {
        r.event_id: r
        for r in rolling_anomaly(
            _ev(spark, rows), keys="k", time_col="ts", value_col="value",
            window_seconds=3600, z_threshold=3.0, min_events=3,
        ).collect()
    }
    assert len(out) == 14  # nothing dropped
    for eid in (100, 101):
        assert out[eid].w_n is None
        assert out[eid].z_score is None
        assert out[eid].is_anomaly is False
    # timestamped rows judged as before, unaffected by the null-ts rows
    assert out[11].w_n == 12


def test_rolling_anomaly_bucketed_matches_plain(spark):
    """bucket_seconds decomposition must be bit-identical to the plain
    keys-only window: boundary rows are duplicated forward as frame
    context so every judged row sees the same trailing frame."""
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.anomaly import rolling_anomaly
    from meds_transforms_spark.sources.testdata import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "event_type", "ts", "value"
    )
    kw = dict(
        keys="event_type", time_col="ts", value_col="value",
        window_seconds=21600, z_threshold=2.0, min_events=10,
    )
    cols = ["event_id", "w_n", "w_mean", "z_score", "is_anomaly"]
    plain = rolling_anomaly(ev, **kw).select(cols).orderBy("event_id").toPandas()
    bucketed = (
        rolling_anomaly(ev, bucket_seconds=86400, **kw)
        .select(cols).orderBy("event_id").toPandas()
    )
    assert plain.equals(bucketed)
    # and the output row count is the input row count (context rows
    # never leak out)
    assert len(bucketed) == ev.count()


def test_rolling_anomaly_bucket_smaller_than_window_raises(spark):
    import pytest

    from meds_transforms_spark.operators.anomaly import rolling_anomaly

    df = spark.createDataFrame(
        [(1, "a", None, 1.0)], "event_id long, event_type string, ts timestamp, value double"
    )
    with pytest.raises(ValueError, match="bucket_seconds"):
        rolling_anomaly(
            df, keys="event_type", time_col="ts", value_col="value",
            window_seconds=3600, bucket_seconds=60,
        )


def test_rolling_time_stats_bucketed_matches_plain(spark):
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.rolling import rolling_time_stats
    from meds_transforms_spark.sources.testdata import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "user_id", "ts", "value"
    )
    kw = dict(keys="user_id", time_col="ts", value_col="value",
              window_seconds=3600, prefix="h1")
    cols = ["event_id", "h1_n", "h1_sum"]
    plain = rolling_time_stats(ev, **kw).select(cols).orderBy("event_id").toPandas()
    bucketed = (
        rolling_time_stats(ev, bucket_seconds=7200, **kw)
        .select(cols).orderBy("event_id").toPandas()
    )
    assert plain.equals(bucketed)


def test_nan_values_count_toward_nothing(spark):
    """Regression: floor(NaN).cast(long) is 0, so one NaN reading
    contributed a phantom 0.0 to every overlapping window's stats and
    self-flagged (NaN > threshold is true in Spark's ordering)."""
    import datetime as dt

    from meds_transforms_spark.operators.anomaly import rolling_anomaly

    base = dt.datetime(2024, 1, 1, 10, 0)
    rows = [
        (i, "t", base + dt.timedelta(minutes=i), 10.0 if i != 5 else float("nan"))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp, value double")
    out = {r.event_id: r for r in rolling_anomaly(df, keys="event_type", time_col="ts", min_events=2).collect()}
    assert not any(r.is_anomaly for r in out.values())
    # neighbours' window means unpolluted by a phantom 0.0
    assert all(abs(r.w_mean - 10.0) < 1e-9 for i, r in out.items() if i != 5 and r.w_mean is not None)
    # the NaN row itself contributes nothing and is unjudged
    assert out[5].w_n == 5  # five prior real readings in its window, not itself
