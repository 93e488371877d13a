from __future__ import annotations

from pyspark.sql import functions as F

from meds_transforms_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_vectorized,
)


def _corpus(spark, n=200, d=16):
    """Deterministic hash-derived vectors (no RNG, no fixture files)."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(d - 1)),
            lambda j: F.xxhash64(F.col("id"), j).cast("double") / F.lit(float(2**63)),
        ).alias("embedding"),
    )


def test_vectorized_matches_expression_path(spark):
    corpus = _corpus(spark)
    queries = corpus.filter(F.col("vec_id") < 7).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = brute_force_topk(corpus, queries, k=5)
    b = brute_force_topk_vectorized(corpus, queries, k=5)
    ra = {(r.query_id, r.rank): (r.vec_id, r.cos) for r in a.collect()}
    rb = {(r.query_id, r.rank): (r.vec_id, r.cos) for r in b.collect()}
    assert ra.keys() == rb.keys()
    for key in ra:
        assert ra[key][0] == rb[key][0]
        assert abs(ra[key][1] - rb[key][1]) < 1e-9


def test_vectorized_self_rank_one(spark):
    corpus = _corpus(spark, n=50)
    queries = corpus.filter(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = (
        brute_force_topk_vectorized(corpus, queries, k=1)
        .collect()
    )
    assert len(top) == 1 and top[0]["vec_id"] == 3


def test_vectorized_empty_queries(spark):
    corpus = _corpus(spark, n=20)
    queries = corpus.filter(F.col("vec_id") < 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert brute_force_topk_vectorized(corpus, queries, k=3).count() == 0
