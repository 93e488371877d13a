"""Expression-DSL semantics (matcher + col_expr), mirroring the
reference's parser.py doctest coverage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meds_transforms_spark.functions.col_expr import parse_col_expr
from meds_transforms_spark.functions.matcher import is_matcher, matcher_to_expr


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "LAB//A", 10.0, "u1"),
            (2, "HR", None, None),
            (3, "LAB//B", 3.5, "u2"),
        ],
        "id long, code string, val double, unit string",
    )


def _vals(df, expr):
    return [r[0] for r in df.orderBy("id").select(expr).collect()]


def test_matcher_forms(df):
    pred, _ = matcher_to_expr({"code": {"regex": "^LAB//"}})
    assert _vals(df, pred) == [True, False, True]
    pred, _ = matcher_to_expr({"unit": {"present": False}})
    assert _vals(df, pred) == [False, True, False]
    pred, _ = matcher_to_expr({"code": {"any": ["HR", "TEMP"]}})
    assert _vals(df, pred) == [False, True, False]
    pred, _ = matcher_to_expr({"code": "HR", "unit": None})
    assert _vals(df, pred) == [False, True, False]  # AND of equality + null
    assert not is_matcher({"code": {"bogus": 1}})
    assert not is_matcher({})


def test_col_expr_interpolation_null_propagation(df):
    expr, cols = parse_col_expr({"str": "{code}//{unit}"})
    assert cols == {"code", "unit"}
    # pl.format semantics: any null field → whole result null.
    assert _vals(df, expr) == ["LAB//A//u1", None, "LAB//B//u2"]


def test_col_expr_extract_no_match_is_null(df):
    expr, _ = parse_col_expr({"extract": {"from": "code", "regex": "LAB//(.+)"}})
    assert _vals(df, expr) == ["A", None, "B"]


def test_col_expr_coalesce_with_conditional(df):
    expr, cols = parse_col_expr(
        [
            {"matcher": {"code": {"regex": "^LAB//"}}, "then": {"col": "unit"}},
            {"literal": "fallback"},
        ]
    )
    assert cols == {"code", "unit"}
    assert _vals(df, expr) == ["u1", "fallback", "u2"]


def test_col_expr_literal_and_bare_column(df):
    expr, cols = parse_col_expr("code")
    assert cols == {"code"}
    expr2, cols2 = parse_col_expr({"literal": 7})
    assert cols2 == set()
    assert _vals(df, expr2) == [7, 7, 7]


def test_stage_spec_parses_stage_and_name_keys():
    """Regression: `- stage: foo` (a single-key dict using the
    documented 'stage'/'name' spelling) hit the generic single-key
    branch and crashed on dict('foo')."""
    from meds_transforms_spark.plans.pipeline import StageSpec

    assert StageSpec.parse({"stage": "dedup_events"}).name == "dedup_events"
    assert StageSpec.parse({"name": "dedup_events"}).name == "dedup_events"
    s = StageSpec.parse({"stage": "drop_regex", "regex": "^X"})
    assert s.name == "drop_regex" and s.config == {"regex": "^X"}
    # the generic single-key form still works
    s2 = StageSpec.parse({"drop_regex": {"regex": "^Y"}})
    assert s2.name == "drop_regex" and s2.config == {"regex": "^Y"}
