from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from meds_transforms_spark.operators.asof import asof_join


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00"), "a"),
            (1, ts("2024-01-01 12:00"), "b"),
            (2, ts("2024-01-01 09:00"), "c"),
            (3, ts("2024-01-01 09:00"), "d"),  # key with no right rows
        ],
        "k long, time timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 09:30"), 10.0),
            (1, ts("2024-01-01 10:00"), 20.0),  # exactly at left 'a'
            (1, ts("2024-01-01 11:00"), 30.0),
            (2, ts("2024-01-01 09:30"), 40.0),  # after left 'c'
        ],
        "k long, time timestamp, v double",
    )
    return left, right


def _by_tag(df):
    return {r["tag"]: (r["time_matched"], r["v"]) for r in df.collect()}


def test_backward_inclusive(sides):
    left, right = sides
    out = _by_tag(asof_join(left, right, on="k"))
    assert out["a"] == (ts("2024-01-01 10:00"), 20.0)  # equal time matches
    assert out["b"] == (ts("2024-01-01 11:00"), 30.0)  # latest prior
    assert out["c"] == (None, None)  # nothing at/before
    assert out["d"] == (None, None)  # key absent from right


def test_backward_strict(sides):
    left, right = sides
    out = _by_tag(asof_join(left, right, on="k", strict=True))
    assert out["a"] == (ts("2024-01-01 09:30"), 10.0)  # equal-time excluded


def test_forward(sides):
    left, right = sides
    out = _by_tag(asof_join(left, right, on="k", direction="forward"))
    assert out["a"] == (ts("2024-01-01 10:00"), 20.0)
    assert out["b"] == (None, None)  # nothing at/after 12:00
    assert out["c"] == (ts("2024-01-01 09:30"), 40.0)


def test_forward_strict(sides):
    left, right = sides
    out = _by_tag(
        asof_join(left, right, on="k", direction="forward", strict=True)
    )
    assert out["a"] == (ts("2024-01-01 11:00"), 30.0)  # skips equal-time


def test_tolerance_nulls_far_matches(sides):
    left, right = sides
    out = _by_tag(
        asof_join(
            left, right, on="k", tolerance=F.expr("INTERVAL 45 MINUTES")
        )
    )
    assert out["a"] == (ts("2024-01-01 10:00"), 20.0)  # gap 0 ok
    assert out["b"] == (None, None)  # gap 1h > 45min nulled


def test_left_rows_and_columns_preserved(sides):
    left, right = sides
    out = asof_join(left, right, on="k", suffix="_r")
    assert out.count() == left.count()
    assert set(out.columns) == {"k", "time", "tag", "time_r", "v_r"}


def test_plan_is_single_shuffle(sides):
    """The whole as-of join must be one hash partitioning on the key —
    no broadcast nested loop, no cartesian."""
    left, right = sides
    explained = asof_join(left, right, on="k")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in explained
    assert "BroadcastNestedLoopJoin" not in explained


def test_asof_null_times_never_match(spark):
    """Regression: NULL-time right rows sorted NULLS-FIRST and became
    the backward match for early left rows; NULL-time left rows picked
    up the min-time right row in forward mode."""
    import datetime as dt

    from meds_transforms_spark.operators.asof import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 10, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(0)), (1, t(30)), (1, None)], "user_id long, time timestamp"
    )
    right = spark.createDataFrame(
        [(1, None, "ghost"), (1, t(10), "real")],
        "user_id long, time timestamp, state string",
    )
    back = {
        (r.time, r.state)
        for r in asof_join(left, right, "user_id", direction="backward").collect()
    }
    assert back == {(t(0), None), (t(30), "real"), (None, None)}
    fwd = {
        (r.time, r.state)
        for r in asof_join(left, right, "user_id", direction="forward").collect()
    }
    assert fwd == {(t(0), "real"), (t(30), None), (None, None)}


def test_asof_payload_collision_raises(spark):
    import datetime as dt

    import pytest

    from meds_transforms_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, t0, 5.0)], "user_id long, time timestamp, value double")
    right = spark.createDataFrame([(1, t0, 7.0)], "user_id long, time timestamp, value double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, "user_id")
    out = asof_join(left, right, "user_id", suffix="_r")
    assert out.columns.count("value") == 1 and "value_r" in out.columns
