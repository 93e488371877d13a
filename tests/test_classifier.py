"""Hashed linear classifier tests: serving math + train/serve round-trip."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F


def test_hashed_linear_score_exact_math(spark):
    from meds_transforms_spark.operators.classifier import hashed_linear_score
    from meds_transforms_spark.operators.dedup import _h64

    df = spark.createDataFrame(
        [(1, "good good bad"), (2, None)], "doc_id long, text string"
    )
    n_buckets = 64
    b = {
        r.tok: r.b
        for r in spark.createDataFrame([("good",), ("bad",)], "tok string")
        .select("tok", F.pmod(_h64("xxhash64", F.col("tok")), F.lit(n_buckets)).cast("int").alias("b"))
        .collect()
    }
    weights = spark.createDataFrame(
        [(b["good"], 2.0), (b["bad"], -1.0)], "bucket int, weight double"
    )
    out = {
        r.doc_id: r.quality_prob
        for r in hashed_linear_score(
            df, weights, bias=0.5, n_buckets=n_buckets
        ).collect()
    }
    if b["good"] == b["bad"]:  # hash collision: both tokens share a weight
        pytest.skip("bucket collision in this configuration")
    z = (2 * 2.0 + 1 * (-1.0)) / 3 + 0.5
    assert out[1] == pytest.approx(1 / (1 + math.exp(-z)))
    assert out[2] is None


def test_unhit_buckets_weigh_zero(spark):
    from meds_transforms_spark.operators.classifier import hashed_linear_score

    df = spark.createDataFrame([(1, "totally unseen tokens")], "doc_id long, text string")
    weights = spark.createDataFrame([(0, 99.0)], "bucket int, weight double")
    # overwhelming probability none of the 3 tokens hash to bucket 0
    out = hashed_linear_score(df, weights, n_buckets=1 << 20).collect()[0]
    assert out.quality_prob == pytest.approx(0.5)  # sigmoid(0)


def test_demo_weights_deterministic(spark):
    from meds_transforms_spark.operators.classifier import demo_weights

    a = demo_weights(spark, 128).collect()
    b = demo_weights(spark, 128).collect()
    assert sorted((r.bucket, r.weight) for r in a) == sorted(
        (r.bucket, r.weight) for r in b
    )
    assert all(-2.0 <= r.weight < 2.0 for r in a)


def test_fit_then_score_separates_classes(spark):
    from meds_transforms_spark.operators.classifier import (
        fit_hashed_classifier,
        hashed_linear_score,
    )

    good = "the quick brown fox jumps over the lazy dog near the river bank"
    bad = "zxq wvv qqj plk xxo zzt rrw qpn mmv bbz"
    labeled = spark.createDataFrame(
        [(i, good, 1.0) for i in range(8)] + [(100 + i, bad, 0.0) for i in range(8)],
        "doc_id long, text string, label double",
    )
    weights, bias = fit_hashed_classifier(labeled, n_buckets=256, max_iter=25)
    test = spark.createDataFrame(
        [(1, "the quick brown fox near the bank"), (2, "zxq plk zzt qpn")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.quality_prob
        for r in hashed_linear_score(test, weights, bias=bias, n_buckets=256).collect()
    }
    assert out[1] > 0.8
    assert out[2] < 0.2
