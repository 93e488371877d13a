"""Tests for corpus snapshot diff (operators/diff)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _snap(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_diff_classifies_all_states(spark):
    from meds_transforms_spark.operators.diff import corpus_diff

    old = _snap(
        spark,
        [
            (1, "kept identical", "a"),
            (2, "will change", "a"),
            (3, "will vanish", "a"),
            (4, "kept but reformatted", "b"),
        ],
    )
    new = _snap(
        spark,
        [
            (1, "kept identical", "a"),
            (2, "did change", "a"),
            (4, "KEPT   but reformatted", "b"),  # normalization: unchanged
            (5, "brand new doc", "b"),
        ],
    )
    rep = {r.group: r for r in corpus_diff(old, new).collect()}
    assert rep["a"].n_changed == 1 and rep["a"].n_removed == 1
    assert rep["a"].n_unchanged == 1 and rep["a"].n_added == 0
    assert rep["b"].n_added == 1 and rep["b"].n_unchanged == 1
    assert rep["b"].n_changed == 0 and rep["b"].n_removed == 0
    # char mass: a's changed doc contributes new chars to added, old to removed
    assert rep["a"].chars_added == len("did change")
    assert rep["a"].chars_removed == len("will change") + len("will vanish")
    assert rep["b"].chars_added == len("brand new doc")


def test_diff_whole_corpus_and_group_moves(spark):
    from meds_transforms_spark.operators.diff import corpus_diff

    old = _snap(spark, [(1, "same text", "a")])
    new = _snap(spark, [(1, "same text", "b")])  # moved groups, same content
    rep = {r.group: r for r in corpus_diff(old, new).collect()}
    # counted once, in its NEW group
    assert list(rep) == ["b"] and rep["b"].n_unchanged == 1

    whole = corpus_diff(old, new, group_col=None).collect()
    assert len(whole) == 1 and whole[0].group == "<all>"
    assert whole[0].n_unchanged == 1


def test_diff_plan_is_scalable(spark):
    from meds_transforms_spark.operators.diff import corpus_diff
    from meds_transforms_spark.plan_guard import assert_scalable

    old = _snap(spark, [(i, f"t{i}", "a") for i in range(20)])
    new = _snap(spark, [(i, f"t{i}", "a") for i in range(5, 25)])
    assert_scalable(corpus_diff(old, new), name="corpus_diff")
