"""Tests for profile_table (operators/profile)."""

from __future__ import annotations

import datetime as dt


def test_profile_exact_counts_nulls_and_ndv(spark):
    from meds_transforms_spark.operators.profile import profile_table

    rows = [
        (1, "a", 1.0, dt.datetime(2024, 1, 1)),
        (2, "a", None, dt.datetime(2024, 1, 2)),
        (3, None, 3.0, None),
        (4, "b", 3.0, dt.datetime(2024, 1, 1)),
    ]
    df = spark.createDataFrame(rows, "id long, s string, v double, ts timestamp")
    out = {r.column: r for r in profile_table(df, exact=True).collect()}
    assert set(out) == {"id", "s", "v", "ts"}
    assert all(out[c].n_rows == 4 for c in out)
    assert out["s"].n_nulls == 1 and out["v"].n_nulls == 1 and out["ts"].n_nulls == 1
    assert out["id"].n_distinct == 4
    assert out["s"].n_distinct == 2  # nulls don't count
    assert out["v"].n_distinct == 2
    # string column has no numeric stats
    assert out["s"].min_value is None and out["s"].mean_value is None
    assert out["v"].min_value == 1.0 and out["v"].max_value == 3.0
    # timestamp profiles on epoch micros
    assert out["ts"].min_value == dt.datetime(2024, 1, 1).timestamp() * 1e6


def test_profile_approx_mode_close(spark):
    from meds_transforms_spark.operators.profile import profile_table

    df = spark.range(5000).selectExpr("id", "id % 100 AS k")
    out = {r.column: r for r in profile_table(df).collect()}
    assert abs(out["k"].n_distinct - 100) <= 10
    assert abs(out["id"].n_distinct - 5000) <= 500  # HLL default rsd 5% ≈ 2σ


def test_profile_column_subset(spark):
    from meds_transforms_spark.operators.profile import profile_table

    df = spark.range(10).selectExpr("id", "id * 2 AS b")
    out = profile_table(df, columns=["b"], exact=True).collect()
    assert len(out) == 1 and out[0].column == "b"


def test_profile_map_and_interval_columns_survive(spark):
    """A map column must not fail the whole-table profile (maps are
    neither hashable nor orderable), and interval-typed columns must not
    false-match the numeric path via the 'int' prefix."""
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.profile import profile_table

    df = spark.range(5).select(
        "id",
        F.create_map(F.lit("k"), F.col("id")).alias("m"),
        (F.col("id") % 2 == 0).alias("flag"),
    )
    out = {r.column: r for r in profile_table(df, exact=True).collect()}
    assert out["m"].n_distinct is None and out["m"].n_nulls == 0
    assert out["m"].min_value is None
    assert out["id"].n_distinct == 5
    assert out["flag"].min_value is None  # boolean is not numeric
