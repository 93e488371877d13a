"""validate_meds stage + approximate aggregation opt-ins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_validate_meds_clean_and_dirty(spark, meds_df):
    from meds_transforms_spark.operators.validate import validate_meds

    # meds_df has one NaN numeric value (subject 3) → informational rule.
    report = {r.rule: r.n_violations for r in validate_meds(meds_df).collect()}
    assert report == {"nan_numeric_value": 1}

    nullable_schema = (
        "subject_id long, time timestamp, code string, numeric_value float, text_value string"
    )
    dirty = meds_df.unionByName(
        spark.createDataFrame([(None, None, None, None, None)], nullable_schema)
    )
    report = {r.rule: r.n_violations for r in validate_meds(dirty).collect()}
    assert report["null_subject_id"] == 1
    assert report["null_code"] == 1
    with pytest.raises(ValueError, match="validation failed"):
        validate_meds(dirty, strict=True)


def test_validate_missing_column(spark):
    from meds_transforms_spark.operators.validate import validate_meds

    df = spark.createDataFrame([(1,)], "subject_id long")
    rules = {r.rule for r in validate_meds(df).collect()}
    assert "missing_column:time" in rules and "missing_column:code" in rules


def test_approx_aggregations(spark, meds_df):
    from meds_transforms_spark.operators.aggregate_code_metadata import (
        aggregate_code_metadata,
    )

    out = aggregate_code_metadata(
        meds_df,
        aggregations=[
            {"name": "code/n_subjects", "approx": True},
            "code/n_occurrences",
            {"name": "values/quantiles", "approx": True, "quantiles": [0.5]},
        ],
    )
    rows = {r["code"]: r for r in out.collect()}
    # HLL on tiny cardinalities is exact in practice.
    assert rows["HR"]["code/n_subjects"] == 3
    med = rows["HR"]["values/quantiles"]["values/quantile/0.5"]
    assert 100 < med < 110  # exact median is 102.6 or 105.1
    # No expand in the plan: approx distinct is a sketch aggregate.
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_validate_corpus_rules_and_strict(spark):
    import pytest

    from meds_transforms_spark.operators.validate import validate_corpus

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (None, "c"), (4, None), (5, "x" * 50)],
        "doc_id long, text string",
    )
    out = {r.rule: r.n_violations for r in validate_corpus(df, max_chars=10).collect()}
    assert out == {"null_id": 1, "duplicate_id": 1, "null_text": 1, "oversize_text": 1}
    with pytest.raises(ValueError, match="duplicate_id"):
        validate_corpus(df, max_chars=10, strict=True)
    clean = spark.createDataFrame([(1, "ok"), (2, "fine")], "doc_id long, text string")
    assert validate_corpus(clean, strict=True).count() == 0
    missing = spark.createDataFrame([(1,)], "other long")
    rules = {r.rule for r in validate_corpus(missing).collect()}
    assert rules == {"missing_column:doc_id", "missing_column:text"}
