"""Similarity search over embedding columns (array<float>).

- ``cosine_similarity`` / ``l2_normalize``: built-in array HOF math
  (zip_with + aggregate) — JVM-side dot products, no UDF.
- ``brute_force_topk``: exact top-k neighbors for a set of query
  vectors — broadcast the (small) query side, window-rank per query.
  This is the correctness baseline and the right physical plan whenever
  |queries| ≪ |corpus| (the common case): the corpus is scanned once,
  map-side, no corpus shuffle.
- ``lsh_topk``: approximate top-k via random-hyperplane buckets with
  multi-probe — the scale path when both sides are large.

Hyperplanes are deterministic pseudo-random: component j of plane p is
``sin(xxhash64(p, j))``-style hash-derived noise, so no fitted model
state needs to ship — any executor can regenerate the planes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def l2_normalize(a: Column) -> Column:
    """Single-expression normalize — convenience for small frames and
    tests ONLY. The captured ``l2_norm`` aggregate re-evaluates once
    per component inside the transform lambda (no HOF CSE — measured,
    SCALING.md), making this O(d²) per row. In operator plans,
    materialize the norm into a column and divide by the column
    reference instead (see _cosine_dedup_within)."""
    n = l2_norm(a)
    return F.when(n > 0, F.transform(a, lambda v: v / n))


def cosine_similarity(a: Column, b: Column, assume_normalized: bool = False) -> Column:
    if assume_normalized:
        return dot(a, b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def _plane_component(plane: Column | int, j: Column) -> Column:
    """Deterministic pseudo-random N(0,1)-ish weight for (plane, dim j):
    map xxhash64 → uniform(0,1) → centered. Uniform-centered weights are
    fine for hyperplane LSH (only the sign of the dot product matters)."""
    h = F.xxhash64(plane, j)
    return (h.cast("double") / F.lit(float(2**63))) # in (-1, 1)


def hyperplane_bucket(vec: Column, dim: int, num_planes: int = 16) -> Column:
    """LSH bucket id: sign-bit string over ``num_planes`` random planes."""
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(num_planes - 1)),
        lambda p: F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), lambda j: _plane_component(p, j)),
                    lambda x, w: x * w,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            > 0,
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )
    return F.concat_ws("", bits)


def hyperplane_bucket_exact(
    vec: Column, dim: int, num_planes: int = 8, quant: int = 1_000_000
) -> Column:
    """Engine-reproducible LSH bucket: sign-random (±1) hyperplanes with
    integer-quantized projections.

    Weight(p, j) = ±1 from the low bit of an md5-derived hash of
    ``"p:j"``; component j is quantized ``floor(v·quant + 0.5)`` (floor
    is exact on doubles, so every engine computes the same integer).
    The projection is then an INTEGER sum — order-independent and
    bit-identical everywhere — so the bucket bit (sign) matches a SQL
    reimplementation exactly. Rademacher signs are a standard LSH
    family; quantization at 1e-6 only perturbs points within 1e-6·√d
    of a hyperplane, which moves bucket boundaries, not correctness
    (LSH buckets are approximate by construction).
    """
    from meds_transforms_spark.operators.dedup import _h64

    def plane_bit(p: Column) -> Column:
        w = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: F.getbit(_h64("md5_60", p, j), F.lit(0)) * 2 - 1,
        )
        terms = F.zip_with(
            vec,
            w,
            lambda x, wj: wj.cast("long")
            * F.floor(x * F.lit(float(quant)) + F.lit(0.5)).cast("long"),
        )
        proj = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, v: acc + v)
        return F.when(proj > 0, F.lit("1")).otherwise(F.lit("0"))

    bits = F.transform(F.sequence(F.lit(0), F.lit(num_planes - 1)), plane_bit)
    return F.concat_ws("", bits)


@register_stage("brute_force_topk")
def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cos, rank).

    Plan: broadcast the query side → map-side nested-loop over the
    corpus scan → per-query window rank. Ties broken by corpus id for
    determinism. The corpus is never shuffled; the only exchange is the
    rank window on (query_id), whose input is already reduced if k
    pre-filtering is added upstream.

    Norms are computed ONCE per row on each side before the pair join
    (|C|+|Q| norm evaluations instead of 2·|C|·|Q|): array lambdas are
    interpreted, not codegen'd, so per-pair work must be the single dot
    product — measured 3.5× on the sf0.1 bench.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("__qvec"),
        l2_norm(F.col(query_vec)).alias("__qn"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(corpus_vec).alias("__cvec"),
        l2_norm(F.col(corpus_vec)).alias("__cn"),
    )
    denom = F.col("__cn") * F.col("__qn")
    scored = c.join(F.broadcast(q)).withColumn(
        "cos",
        F.when(denom > 0, dot(F.col("__cvec"), F.col("__qvec")) / denom).cast("double"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select("query_id", "vec_id", "cos", "rank")
    )


@register_stage("brute_force_topk_vectorized")
def brute_force_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched numpy matmul.

    The scale path for HIGH-dimensional embeddings, where even one
    interpreted dot product per pair dominates: the (small) query side
    is collected once into a dense matrix shipped in the UDF closure;
    each Arrow batch of the corpus becomes a (batch × dim) matrix and
    one BLAS ``C @ Qᵀ`` scores every pair in the batch. Each batch
    emits only its local top-k per query (argpartition), so the final
    exact rank window sees ≤ batches·k·|Q| candidate rows instead of
    |C|·|Q| — the corpus is scanned once, map-side, and never shuffled.

    Local-top-k + global-top-k composes exactly (top-k of unioned
    per-batch top-ks = global top-k); boundary ties are kept by
    ordering candidates on (-cos, vec_id) in-batch, matching the
    global window's tie-break.
    """
    import numpy as np
    import pyarrow as pa

    q_rows = queries.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("qv")
    ).collect()
    if not q_rows:
        schema = "query_id long, vec_id long, cos double, rank int"
        return corpus.sparkSession.createDataFrame([], schema)
    qids = np.array([r["qid"] for r in q_rows], dtype=np.int64)
    Q = np.array([r["qv"] for r in q_rows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
    kk = int(k)
    dim = Q.shape[1]

    out_schema = "query_id long, vec_id long, cos double"

    def score_batches(batches):
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            ids = rb.column(0).to_numpy(zero_copy_only=False)
            # List<double> → flat values buffer → (n, dim) view. No
            # per-row Python objects: this is the whole point of the
            # Arrow path. combine_chunks handles multi-chunk columns;
            # ragged inputs (wrong-length vectors) fail loudly on the
            # reshape rather than silently mis-scoring.
            col = rb.column(1)
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            C = flat.reshape(n, dim).astype(np.float64, copy=False)
            Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
            S = Cn @ Qn.T  # (batch, |Q|)
            top = min(kk, n)
            # lexsort: primary -cos, secondary vec_id — matches the
            # global window's (cos desc, vec_id asc) tie-break.
            out_q, out_id, out_cos = [], [], []
            for j in range(S.shape[1]):
                order = np.lexsort((ids, -S[:, j]))[:top]
                out_q.append(np.full(top, qids[j], dtype=np.int64))
                out_id.append(ids[order])
                out_cos.append(S[order, j])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_q)),
                    pa.array(np.concatenate(out_id)),
                    pa.array(np.concatenate(out_cos)),
                ],
                names=["query_id", "vec_id", "cos"],
            )

    c = corpus.select(
        F.col(corpus_id).alias("__id"),
        F.col(corpus_vec).cast("array<double>").alias("__v"),
    )
    cand = c.mapInArrow(score_batches, schema=out_schema)
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= kk)
        .select("query_id", "vec_id", "cos", "rank")
    )


@register_stage("lsh_topk")
def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 12,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    bucket_fn: str = "hash",
) -> DataFrame:
    """Approximate top-k: compare only same-hyperplane-bucket pairs.

    At scale this replaces the O(|Q|·|C|) nested loop with an equi-join
    on bucket ids — a plain shuffle join Catalyst can plan (and AQE can
    skew-split). Recall is tuned by ``num_planes`` (fewer planes →
    bigger buckets → higher recall, more compute).

    ``bucket_fn="exact"`` switches to the engine-reproducible
    sign-random integer-projection bucketing
    (:func:`hyperplane_bucket_exact`) so a SQL oracle can recompute
    the identical buckets.
    """
    dim_row = corpus.select(F.size(corpus_vec).alias("d")).limit(1).collect()
    dim = dim_row[0]["d"]
    bucketize = (
        hyperplane_bucket_exact if bucket_fn == "exact" else hyperplane_bucket
    )
    c = corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(corpus_vec).alias("__cvec"),
        l2_norm(F.col(corpus_vec)).alias("__cn"),
    ).withColumn("__bucket", bucketize(F.col("__cvec"), dim, num_planes))
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("__qvec"),
        l2_norm(F.col(query_vec)).alias("__qn"),
    ).withColumn("__bucket", bucketize(F.col("__qvec"), dim, num_planes))
    denom = F.col("__cn") * F.col("__qn")
    scored = c.join(q, "__bucket").withColumn(
        "cos",
        F.when(denom > 0, dot(F.col("__cvec"), F.col("__qvec")) / denom).cast("double"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select("query_id", "vec_id", "cos", "rank")
    )
