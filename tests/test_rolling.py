from __future__ import annotations

import datetime as dt

from meds_transforms_spark.operators.rolling import (
    pivot_features,
    rolling_time_stats,
)


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_rolling_window_boundaries(spark):
    df = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), 1.0),
            (1, ts("2024-01-01 10:30:00"), 2.0),
            (1, ts("2024-01-01 11:00:00"), 4.0),  # 10:00 still inside [t-1h, t]
            (1, ts("2024-01-01 12:00:01"), 8.0),  # everything else aged out
            (2, ts("2024-01-01 10:00:00"), 16.0),  # other key unaffected
        ],
        "k long, time timestamp, v double",
    )
    out = rolling_time_stats(df, keys="k", value_col="v", window_seconds=3600)
    got = {
        (r["k"], r["time"]): (r["w3600s_n"], r["w3600s_sum"])
        for r in out.collect()
    }
    assert got[(1, ts("2024-01-01 10:00:00"))] == (1, 1.0)
    assert got[(1, ts("2024-01-01 10:30:00"))] == (2, 3.0)
    assert got[(1, ts("2024-01-01 11:00:00"))] == (3, 7.0)  # inclusive lower bound
    assert got[(1, ts("2024-01-01 12:00:01"))] == (1, 8.0)
    assert got[(2, ts("2024-01-01 10:00:00"))] == (1, 16.0)


def test_rolling_ties_all_included(spark):
    df = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), 1.0), (1, ts("2024-01-01 10:00:00"), 2.0)],
        "k long, time timestamp, v double",
    )
    out = rolling_time_stats(df, keys="k", value_col="v", window_seconds=60)
    # RANGE frames include all rows tied on the order value.
    assert sorted(r["w60s_n"] for r in out.collect()) == [2, 2]


def test_pivot_features_zero_fill_and_ignore_unknown(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (1, "a", 2.0), (1, "zzz", 9.0), (2, "b", 5.0)],
        "e long, cat string, v double",
    )
    out = pivot_features(df, "e", "cat", ["a", "b"], value_col="v")
    got = {r["e"]: r.asDict() for r in out.collect()}
    assert got[1]["a_n"] == 2 and got[1]["a_sum"] == 3.0
    assert got[1]["b_n"] == 0 and got[1]["b_sum"] is None
    assert got[2]["b_n"] == 1 and got[2]["b_sum"] == 5.0
    assert "zzz_n" not in got[1]  # unknown categories dropped


def test_pivot_counts_only(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (1, "a")], "e long, cat string")
    out = pivot_features(df, "e", "cat", ["a", "b", "c"])
    row = out.collect()[0]
    assert (row["a_n"], row["b_n"], row["c_n"]) == (2, 1, 0)
