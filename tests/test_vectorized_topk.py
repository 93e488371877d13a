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


def test_vectorized_topk_string_ids_and_null_queries(spark):
    """Regression: the Arrow path hardcoded int64 id schemas (string
    ids crashed on the driver) and crashed on NULL query vectors where
    the expression path returns NULL-cos rows."""
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_vectorized,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(
            F.concat(F.lit("v"), F.format_string("%04d", "vec_id")).alias("vec_id"),
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        .limit(50)
    )
    queries = emb.filter(F.col("vec_id") < "v0003").select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).unionByName(
        spark.createDataFrame([("qnull", None)], "query_id string, embedding array<double>")
    )
    kw = dict(k=5)
    exact = {
        (r.query_id, r.vec_id, r.rank)
        for r in brute_force_topk(emb, queries, **kw).collect()
    }
    vec = {
        (r.query_id, r.vec_id, r.rank)
        for r in brute_force_topk_vectorized(emb, queries, **kw).collect()
    }
    assert vec == exact
    assert sum(1 for q, _, _ in vec if q == "qnull") == 5  # NULL-cos rows


def test_vectorized_topk_ignores_malformed_corpus_rows(spark):
    """NULL / wrong-length / zero-norm corpus rows are excluded from
    candidates (documented divergence) instead of crashing the reshape
    or outranking negative-cosine neighbours at cos=0.0."""
    from meds_transforms_spark.operators.similarity import brute_force_topk_vectorized

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [-1.0, 0.0]),
            (3, None),
            (4, [0.0, 0.0]),
            (5, [1.0, 2.0, 3.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, embedding array<double>"
    )
    got = [
        (r.vec_id, r.rank)
        for r in brute_force_topk_vectorized(corpus, queries, k=5)
        .orderBy("rank")
        .collect()
    ]
    assert got == [(1, 1), (2, 2)]


def test_lsh_topk_empty_and_allnull_corpus(spark):
    """Regression: an empty (or all-NULL-embedding) corpus crashed the
    driver-side dim probe."""
    from meds_transforms_spark.operators.similarity import lsh_topk

    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, embedding array<double>"
    )
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    allnull = spark.createDataFrame([(1, None)], "vec_id long, embedding array<double>")
    assert lsh_topk(empty, queries).count() == 0
    assert lsh_topk(allnull, queries).count() == 0


def test_vectorized_null_corpus_id_tie_matches_expression_path(spark):
    """Round-6 advisory: a NULL-id corpus row tying in cosine at the
    batch-local top-k cut must rank FIRST (Spark asc = NULLS FIRST),
    exactly as the expression path's global window ranks it — Arrow's
    sort_indices defaults to nulls-at-end and would prune it."""
    vec = [float(i) for i in range(8)]
    corpus = spark.createDataFrame(
        [(None, vec), (10, vec), (20, vec), (30, vec), (40, vec)],
        "vec_id bigint, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(1, vec)], "query_id bigint, embedding array<double>"
    )
    expr = [(r.rank, r.vec_id) for r in
            brute_force_topk(corpus, queries, k=3).orderBy("rank").collect()]
    vect = [(r.rank, r.vec_id) for r in
            brute_force_topk_vectorized(corpus, queries, k=3).orderBy("rank").collect()]
    assert expr == vect == [(1, None), (2, 10), (3, 20)]
