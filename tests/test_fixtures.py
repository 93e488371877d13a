"""Golden-fixture scenarios in the reference's example format
(in.yaml / cfg.yaml / out_data.yaml with CSV-string tables)."""

from __future__ import annotations

import os

import pytest

from meds_transforms_spark.testing import StageExample

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _scenarios():
    out = []
    for stage in sorted(os.listdir(FIXTURES)):
        stage_dir = os.path.join(FIXTURES, stage)
        for scenario in sorted(os.listdir(stage_dir)):
            out.append((stage, os.path.join(stage_dir, scenario)))
    return out


@pytest.mark.parametrize("stage,path", _scenarios())
def test_golden_scenario(spark, stage, path):
    StageExample.from_dir(stage, path).run(spark)


def test_csv_to_meds(spark, tmp_path):
    from meds_transforms_spark.sources.csv_to_meds import csv_to_meds

    p = tmp_path / "raw.csv"
    p.write_text(
        "pid,visit_time,hr,temp,eye\n"
        "1,2020-01-01 10:00:00,80.0,98.6,BROWN\n"
        "2,2020-02-02 11:00:00,95.5,,BLUE\n"
    )
    out = csv_to_meds(
        spark, str(p), subject_col="pid", time_col="visit_time",
        value_cols=["hr", "temp"], static_cols=["eye"],
    )
    rows = {(r.subject_id, r.code): r for r in out.collect()}
    assert rows[(1, "hr")].numeric_value == pytest.approx(80.0)
    assert rows[(1, "eye//BROWN")].time is None
    assert (2, "temp") not in rows  # null measurement dropped
    assert rows[(2, "hr")].time is not None


def test_wide_to_meds_null_static_dropped(spark):
    """Regression: a NULL static value null-propagated through the
    CODE//VALUE concat into a NULL-code phantom row that survived the
    final filter (its TIME is null)."""
    from pyspark.sql import functions as F

    from meds_transforms_spark.sources.csv_to_meds import wide_to_meds

    wide = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 7.0, "F"), (2, "2024-01-01 00:00:00", 8.0, None)],
        "sid long, t string, hr double, sex string",
    )
    out = wide_to_meds(
        wide, "sid", "t", value_cols=["hr"], static_cols=["sex"], code_prefix=""
    )
    assert out.filter(F.col("code").isNull()).count() == 0
    statics = {r.subject_id: r.code for r in out.filter("time is null").collect()}
    assert statics == {1: "sex//F"}


def test_events_as_meds_modifier_tolerates_digitless_props(spark, tmp_path):
    """Regression: cast('' as int) aborts under ANSI when props has no
    digits — the kk modifier must be NULL instead."""
    from meds_transforms_spark.sources.testdata import events_as_meds

    src = str(tmp_path)
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "click", 1.0, "{}"),
         (2, "2024-01-01 00:00:00", 1, "view", 2.0, "k=37")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "cast(ts as timestamp) ts", "user_id", "event_type", "value", "props"
    ).write.parquet(f"{src}/events.parquet")
    out = {r.code: r.kk for r in events_as_meds(spark, src, with_modifier=True).collect()}
    assert out["click"] is None and out["view"] == 3
