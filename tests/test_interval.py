"""Interval (range-containment) join vs a naive join+filter reference."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F


def _mk_data(spark, n_points=400, n_intervals=60, n_keys=7, seed=11):
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    pts = [
        (i, rng.randrange(n_keys), base + dt.timedelta(seconds=rng.randrange(86_400)))
        for i in range(n_points)
    ]
    ivs = []
    for j in range(n_intervals):
        s = base + dt.timedelta(seconds=rng.randrange(86_400))
        ivs.append(
            (j, rng.randrange(n_keys), s, s + dt.timedelta(seconds=rng.randrange(1, 7_200)))
        )
    points = spark.createDataFrame(pts, "pid long, k long, ts timestamp")
    intervals = spark.createDataFrame(
        ivs, "iid long, k long, start_ts timestamp, end_ts timestamp"
    )
    return points, intervals


def _naive_pairs(points, intervals, with_key=True):
    cond = (F.col("p.ts") >= F.col("i.start_ts")) & (F.col("p.ts") <= F.col("i.end_ts"))
    if with_key:
        cond = (F.col("p.k") == F.col("i.k")) & cond
    return {
        (r.pid, r.iid)
        for r in points.alias("p")
        .join(intervals.alias("i"), cond)
        .select("p.pid", "i.iid")
        .collect()
    }


def test_interval_join_matches_naive_keyed(spark):
    from meds_transforms_spark.operators.interval import interval_join

    points, intervals = _mk_data(spark)
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            points, intervals, "ts", "start_ts", "end_ts", on="k", bin_width_s=600
        ).collect()
    }
    assert got == _naive_pairs(points, intervals, with_key=True)
    assert got  # non-vacuous


def test_interval_join_no_equi_key_and_auto_width(spark):
    from meds_transforms_spark.operators.interval import interval_join

    points, intervals = _mk_data(spark, n_points=150, n_intervals=25)
    got = {
        (r.pid, r.iid)
        for r in interval_join(points, intervals, "ts", "start_ts", "end_ts").collect()
    }
    assert got == _naive_pairs(points, intervals, with_key=False)


def test_interval_join_inclusive_bounds_and_degenerate(spark):
    from meds_transforms_spark.operators.interval import interval_join

    t = dt.datetime(2024, 6, 1, 12, 0, 0)
    points = spark.createDataFrame(
        [(1, t), (2, t + dt.timedelta(seconds=5)), (3, None)],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (10, t, t),  # zero-length: matches exactly t (BETWEEN is inclusive)
            (11, t + dt.timedelta(seconds=9), t),  # inverted: matches nothing
            (12, None, t),  # null bound: matches nothing
        ],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            points, intervals, "ts", "start_ts", "end_ts", bin_width_s=1
        ).collect()
    }
    assert got == {(1, 10)}


def test_interval_join_payload_suffix(spark):
    from meds_transforms_spark.operators.interval import interval_join

    t = dt.datetime(2024, 6, 1)
    points = spark.createDataFrame([(1, t, "p")], "pid long, ts timestamp, tag string")
    intervals = spark.createDataFrame(
        [(9, t, t, "i")], "iid long, start_ts timestamp, end_ts timestamp, tag string"
    )
    out = interval_join(points, intervals, "ts", "start_ts", "end_ts", bin_width_s=60)
    assert "tag" in out.columns and "tag_i" in out.columns
    row = out.collect()[0]
    assert row.tag == "p" and row.tag_i == "i" and row.iid == 9


def test_interval_join_residual_strategy_matches(spark):
    from meds_transforms_spark.operators.interval import interval_join

    points, intervals = _mk_data(spark, n_points=200, n_intervals=30)
    kw = dict(on="k", bin_width_s=600)
    got_bin = {
        (r.pid, r.iid)
        for r in interval_join(
            points, intervals, "ts", "start_ts", "end_ts", **kw
        ).collect()
    }
    got_res = {
        (r.pid, r.iid)
        for r in interval_join(
            points, intervals, "ts", "start_ts", "end_ts", strategy="residual", **kw
        ).collect()
    }
    assert got_bin == got_res == _naive_pairs(points, intervals, with_key=True)


def test_interval_join_stream_static(spark, tmp_path):
    """interval_join is stateless (filter/bin/equi-join/filter), so a
    STREAMING points side against a static interval table works as a
    stream-static join with no extra code — the streaming enrichment
    path. Explicit bin_width_s is required (the auto-probe collects)."""
    from meds_transforms_spark.operators.interval import interval_join

    points, intervals = _mk_data(spark, n_points=120, n_intervals=20)
    src = str(tmp_path / "pts")
    points.write.parquet(src)

    stream_pts = spark.readStream.schema("pid long, k long, ts timestamp").parquet(src)
    joined = interval_join(
        stream_pts, intervals, "ts", "start_ts", "end_ts", on="k", bin_width_s=600
    )
    (
        joined.writeStream.format("memory")
        .queryName("iv_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = {(r.pid, r.iid) for r in spark.sql("select pid, iid from iv_out").collect()}
    assert got == _naive_pairs(points, intervals, with_key=True)


from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None)
@given(
    bin_width=st.sampled_from([1, 2, 3, 7, 61, 600, 7200]),
    seed=st.integers(0, 2**16),
)
def test_interval_join_property_bin_width_invariance(spark, bin_width, seed):
    """The result must be identical for ANY bin width — boundary
    alignment between points, interval ends, and bin edges is where
    off-by-ones live."""
    from meds_transforms_spark.operators.interval import interval_join

    points, intervals = _mk_data(spark, n_points=60, n_intervals=12, seed=seed)
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            points, intervals, "ts", "start_ts", "end_ts", on="k",
            bin_width_s=bin_width,
        ).collect()
    }
    assert got == _naive_pairs(points, intervals, with_key=True)


def test_interval_join_bin_explosion_guard(spark):
    """An interval spanning more bins than the cap must fail fast, not
    materialize billions of explode rows."""
    import pytest
    from pyspark.errors import SparkRuntimeException
    from meds_transforms_spark.operators.interval import interval_join

    points = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1))], "pid long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(9, dt.datetime(1970, 1, 1), dt.datetime(2100, 1, 1))],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    with pytest.raises(SparkRuntimeException, match="max_bins_per_interval"):
        interval_join(
            points, intervals, "ts", "start_ts", "end_ts", bin_width_s=1
        ).count()
    # Same data succeeds when the cap is raised appropriately via wider bins.
    ok = interval_join(
        points, intervals, "ts", "start_ts", "end_ts", bin_width_s=10 * 365 * 86_400
    )
    assert {(r.pid, r.iid) for r in ok.collect()} == {(1, 9)}


def test_numeric_axis_explicit_bin_width(spark):
    """Regression: an explicit bin_width_s was scaled by 1e6 even on a
    numeric (epoch-seconds) axis, making every bin 10^6x too wide."""
    from meds_transforms_spark.operators.interval import interval_join

    points = spark.createDataFrame(
        [(1, 100), (1, 5_000), (1, 9_999)], "user_id long, t long"
    )
    iv = spark.createDataFrame(
        [(1, 0, 200, "early"), (1, 4_900, 5_100, "mid")],
        "user_id long, s long, e long, tag string",
    )
    out = interval_join(
        points, iv, on="user_id", point_time="t", start="s", end="e",
        bin_width_s=1_000, max_bins_per_interval=16,
    )
    got = {(r.t, r.tag) for r in out.collect()}
    assert got == {(100, "early"), (5_000, "mid")}
