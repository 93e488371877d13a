"""Distributed moments / covariance / PCA tests against numpy."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F
import pytest


def _emb(spark, X):
    rows = [(i, [float(v) for v in x]) for i, x in enumerate(X)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_covariance_matches_numpy(spark):
    from meds_transforms_spark.operators.linalg import embedding_covariance

    rng = np.random.default_rng(7)
    X = rng.normal(size=(200, 5))
    df = _emb(spark, X)
    got = {
        (r.i, r.j): r.cov
        for r in embedding_covariance(df, upper_only=False).collect()
    }
    exp = np.cov(X.T, bias=True)
    assert len(got) == 25
    for (i, j), v in got.items():
        assert v == pytest.approx(exp[i, j], abs=1e-10)


def test_covariance_partition_invariant(spark):
    from meds_transforms_spark.operators.linalg import embedding_covariance

    rng = np.random.default_rng(3)
    X = rng.normal(size=(100, 4))
    a = {
        (r.i, r.j): r.cov
        for r in embedding_covariance(_emb(spark, X).repartition(1), round_to=9).collect()
    }
    b = {
        (r.i, r.j): r.cov
        for r in embedding_covariance(_emb(spark, X).repartition(13), round_to=9).collect()
    }
    assert a == b


def test_pca_recovers_dominant_direction(spark):
    from meds_transforms_spark.operators.linalg import pca_fit

    rng = np.random.default_rng(11)
    direction = np.array([3.0, 4.0, 0.0]) / 5.0
    t = rng.normal(size=(300, 1)) * 10
    X = t @ direction[None, :] + rng.normal(size=(300, 3)) * 0.1
    comps, evar, mean = pca_fit(_emb(spark, X), k=3)
    # first component aligns with the planted direction (sign-fixed)
    assert abs(np.dot(comps[0], direction)) > 0.999
    assert evar[0] > 50 * evar[1]
    exp = np.linalg.eigvalsh(np.cov(X.T, bias=True))[::-1]
    assert evar == pytest.approx(list(exp), rel=1e-8)


def test_pca_transform_matches_numpy_projection(spark):
    from meds_transforms_spark.operators.linalg import pca_fit, pca_transform

    rng = np.random.default_rng(5)
    X = rng.normal(size=(50, 6))
    df = _emb(spark, X)
    comps, _, mean = pca_fit(df, k=2)
    out = {r.vec_id: r.pca for r in pca_transform(df, comps, mean=mean).collect()}
    P = (X - np.asarray(mean)) @ np.asarray(comps).T
    for i in range(50):
        assert out[i] == pytest.approx(list(P[i]), abs=1e-10)


def test_pca_fit_empty_raises(spark):
    from meds_transforms_spark.operators.linalg import pca_fit

    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no vectors"):
        pca_fit(df)


def test_quantize_roundtrip_error_bound(spark):
    from meds_transforms_spark.operators.linalg import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    rng = np.random.default_rng(9)
    X = rng.normal(size=(50, 8)) * 3
    q = quantize_embeddings(_emb(spark, X))
    back = dequantize_embeddings(q, out_col="recon")
    rows = back.collect()
    for r in rows:
        x = np.asarray(r.embedding)
        rec = np.asarray(r.recon)
        scale = r.qscale
        assert np.all(np.abs(x - rec) <= scale / 2 + 1e-12)
        assert max(abs(v) for v in r.qvec) <= 127


def test_quantize_zero_and_null_vectors(spark):
    from meds_transforms_spark.operators.linalg import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, None)], "vec_id long, embedding array<double>"
    )
    out = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    assert out[1].qscale == 0.0 and out[1].qvec == [0, 0]
    assert out[2].qscale == 0.0 and out[2].qvec is None


def test_quantized_topk_recall(spark):
    """int8 cosine top-10 should recover ~all of the exact top-10."""
    from meds_transforms_spark.operators.linalg import (
        dequantize_embeddings,
        quantize_embeddings,
    )
    from meds_transforms_spark.operators.similarity import brute_force_topk

    rng = np.random.default_rng(21)
    X = rng.normal(size=(300, 16))
    corpus = _emb(spark, X)
    queries = corpus.filter(F.col("vec_id") < 3).selectExpr(
        "vec_id as query_id", "embedding"
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(corpus, queries, k=10).collect()
    }
    qcorpus = dequantize_embeddings(
        quantize_embeddings(corpus), out_col="embedding"
    ).select("vec_id", "embedding")
    approx = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(qcorpus, queries, k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9
