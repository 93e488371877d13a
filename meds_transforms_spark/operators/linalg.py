"""Distributed linear algebra over embedding columns: moments + PCA.

Corpus-level embedding geometry (mean vector, covariance, principal
components) drives curation decisions — whitening before ANN,
dimensionality reduction for cheap near-dup passes, drift monitoring
between crawl snapshots. The split mirrors the classic distributed
PCA recipe:

- **Moments** are a map-side partial aggregation: each Arrow batch of
  vectors becomes ONE row carrying ``(n, Σx, vec(ΣxxT))`` computed by
  BLAS — the corpus is scanned once and never shuffled; the reduce
  side sums a few-hundred tiny rows. For d = 64 that is 4 KB per
  batch, vs. the 4096×-row explode a purely relational outer product
  would need.
- **Eigendecomposition** happens on the driver over the d×d matrix
  (d ≤ a few thousand — the matrix is microscopic next to the data;
  this is the documented "driver-side is fine" regime, same as IVF
  centroid seeding).
- **Projection** back over the corpus is pure codegen: one
  ``aggregate(zip_with(vec, component, *))`` dot product per
  component, components inlined as literals — no Python, no shuffle.

The reference engine has no linear-algebra plane; this extends the
embedding suite (similarity.py, ivf.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage


def moments_rows(
    df: DataFrame,
    vec_col: str = "embedding",
    quantize_scale: int | None = None,
) -> DataFrame:
    """Per-Arrow-batch partial moments: one row ``(n, sum_vec,
    sum_outer)`` per batch; ``sum_outer`` is the row-major flattened
    ΣxxT. Sum the rows to get exact corpus moments.

    With ``quantize_scale=S`` each input coordinate is quantized to
    ``floor(x·S + 0.5)`` as a 64-bit integer first and ALL sums are
    integer sums — bit-exact and summation-order-independent, so the
    result is a pure function of the data regardless of partitioning
    (the same scaled-LONG trick as the exact-cosine path in dedup.py
    and the sliding sums in rolling.py). Downstream consumers must
    divide ``sum_vec`` by S and ``sum_outer`` by S² to return to data
    units. Int64 headroom: |x|≤R rows n need n·(R·S)² < 2⁶³ — at
    S=10⁶, R≈1, that is ~9×10⁶ rows per PARTIAL (per batch, fine) and
    the reduce-side total must also fit, i.e. corpora to ~10⁶ rows per
    unit variance·S²; pick S per corpus scale."""
    import numpy as np
    import pyarrow as pa

    if quantize_scale is None:
        out_schema = "n long, sum_vec array<double>, sum_outer array<double>"
    else:
        out_schema = "n long, sum_vec array<long>, sum_outer array<long>"

    def partials(batches):
        for rb in batches:
            if rb.num_rows == 0:
                continue
            col = rb.column(0)
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            dim = len(arr[0])
            X = flat.reshape(rb.num_rows, dim).astype(np.float64, copy=False)
            if quantize_scale is not None:
                Xq = np.floor(X * float(quantize_scale) + 0.5).astype(np.int64)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([rb.num_rows], type=pa.int64()),
                        pa.array([Xq.sum(axis=0)]),
                        pa.array([(Xq.T @ Xq).reshape(-1)]),
                    ],
                    names=["n", "sum_vec", "sum_outer"],
                )
            else:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([rb.num_rows], type=pa.int64()),
                        pa.array([X.sum(axis=0)]),
                        pa.array([(X.T @ X).reshape(-1)]),
                    ],
                    names=["n", "sum_vec", "sum_outer"],
                )

    v = df.select(F.col(vec_col).cast("array<double>").alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    return v.mapInArrow(partials, schema=out_schema)


@register_stage("embedding_covariance")
def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    upper_only: bool = True,
    round_to: int | None = None,
    quantize_scale: int | None = None,
) -> DataFrame:
    """Population covariance as a relational matrix ``(i, j, cov)``.

    The partial-moments rows are summed with a posexplode + groupBy
    (the summed table is #batches × (d + d²) tiny rows, nothing like
    corpus scale), then ``cov_ij = Σxy/n − mean_i·mean_j`` is assembled
    relationally — the result stays a DataFrame, joinable/writable like
    any other, with no driver materialization at all.

    ``quantize_scale=S`` switches to the integer-exact mode (see
    :func:`moments_rows`): every sum is a LONG sum of inputs quantized
    at scale S, so the covariance is bit-identical under any
    partitioning / retry / summation order — the mode the oracle
    parity gate runs, at the cost of ~1/S input truncation.
    """
    parts = moments_rows(df, vec_col, quantize_scale=quantize_scale)
    # n rides as element 0 of the exploded stream so the mapInArrow
    # scan feeds ONE aggregation — a separate parts.agg(sum(n)) would
    # be a second full corpus scan (ReuseExchange can't merge the two
    # different subtrees).
    n_elem = F.col("n") if quantize_scale is not None else F.col("n").cast("double")
    sums = parts.select(
        F.posexplode(
            F.concat(F.array(n_elem), F.col("sum_vec"), F.col("sum_outer"))
        ).alias("pos", "val"),
    )
    summed = sums.groupBy("pos").agg(F.sum("val").alias("s"))
    # four downstream branches (dims, N, means, outer) reference this
    # frame; pin it so the corpus scan runs exactly once no matter
    # how the reuse heuristics treat the duplicated subtrees. The
    # pinned table is 1 + d + d² rows — bytes, not data. localCheckpoint
    # (not persist): an operator returning a lazy frame can never
    # unpersist, so persist() leaked one cache entry per call.
    summed = summed.localCheckpoint(eager=False)
    # recover d from the combined length: 1 + d + d² entries
    d_row = summed.agg(F.count(F.lit(1)).alias("cnt"))
    # cnt = 1 + d + d²  →  d = (−1 + sqrt(4(cnt−1)+1)) / 2
    # greatest(…, 0): an EMPTY corpus has cnt = 0, and sqrt(−3) = NaN
    # would make the ANSI int cast fail whenever AQE materializes this
    # stage before the empty-side join prunes it
    d_col = (
        (F.sqrt(F.lit(4.0) * F.greatest(F.col("cnt") - 1, F.lit(0)) + 1) - 1) / 2
    ).cast("int")
    dims = d_row.select(d_col.alias("d"))
    tot_n = summed.filter(F.col("pos") == 0).select(F.col("s").alias("N"))
    lab = summed.filter(F.col("pos") > 0).join(F.broadcast(dims)).join(
        F.broadcast(tot_n)
    )
    if quantize_scale is not None:
        # fixed op order (s/S)/N and (s/S²)/N — the oracle mirrors it
        # verbatim so the IEEE rounding sequence is identical.
        s_scale = float(quantize_scale)
        mean_val = (F.col("s").cast("double") / F.lit(s_scale)) / F.col("N")
        exy_val = (F.col("s").cast("double") / F.lit(s_scale * s_scale)) / F.col("N")
    else:
        mean_val = F.col("s") / F.col("N")
        exy_val = F.col("s") / F.col("N")
    means = lab.filter(F.col("pos") <= F.col("d")).select(
        (F.col("pos") - 1).alias("k"), mean_val.alias("mean")
    )
    outer = lab.filter(F.col("pos") > F.col("d")).select(
        ((F.col("pos") - 1 - F.col("d")) / F.col("d")).cast("int").alias("i"),
        F.pmod(F.col("pos") - 1 - F.col("d"), F.col("d")).cast("int").alias("j"),
        exy_val.alias("exy"),
    )
    cov = (
        outer.join(F.broadcast(means.withColumnRenamed("k", "i").withColumnRenamed("mean", "mi")), "i")
        .join(F.broadcast(means.withColumnRenamed("k", "j").withColumnRenamed("mean", "mj")), "j")
        .select("i", "j", (F.col("exy") - F.col("mi") * F.col("mj")).alias("cov"))
    )
    if upper_only:
        cov = cov.filter(F.col("i") <= F.col("j"))
    if round_to is not None:
        # + 0.0 canonicalizes IEEE -0.0 to +0.0: round(-1e-9, 6) yields
        # -0.0, which is ==-equal to the oracle's +0.0 but differs under
        # any byte-level hash (the r2/r3 driver red). The oracle SQL
        # applies the identical `+ 0.0` so both engines emit +0.0.
        cov = cov.withColumn("cov", F.round("cov", int(round_to)) + F.lit(0.0))
    return cov


def pca_fit(
    df: DataFrame, k: int = 8, vec_col: str = "embedding"
) -> tuple[list[list[float]], list[float], list[float]]:
    """Fit PCA: returns ``(components, explained_variance, mean)``.

    One distributed pass for the moments (see :func:`moments_rows`),
    then a driver-side ``numpy.linalg.eigh`` on the d×d covariance —
    d² doubles, microscopic next to the corpus. Component signs are
    fixed (largest-|entry| coordinate positive) so the fit is
    deterministic.
    """
    import numpy as np

    rows = moments_rows(df, vec_col).collect()
    if not rows:
        raise ValueError("pca_fit: no vectors")
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["sum_vec"])
    s1 = np.zeros(d)
    s2 = np.zeros((d, d))
    for r in rows:
        s1 += np.asarray(r["sum_vec"])
        s2 += np.asarray(r["sum_outer"]).reshape(d, d)
    mean = s1 / n
    cov = s2 / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][: int(k)]
    comps = []
    for idx in order:
        v = evecs[:, idx]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return comps, [float(evals[i]) for i in order], [float(m) for m in mean]


@register_stage("pca_transform")
def pca_transform(
    df: DataFrame,
    components: list[list[float]],
    mean: list[float] | None = None,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project vectors onto fitted components — pure codegen: the
    (small) component matrix rides as literals; each coordinate is one
    ``aggregate(zip_with(x−μ, c, *))`` dot product. No Python, no
    shuffle, no model table to join."""
    x = F.col(vec_col).cast("array<double>")
    if mean is not None:
        mu = F.array(*[F.lit(float(m)) for m in mean])
        x = F.zip_with(x, mu, lambda a, b: a - b)
    coords = []
    for comp in components:
        c = F.array(*[F.lit(float(v)) for v in comp])
        dot = F.aggregate(
            F.zip_with(x, c, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        coords.append(dot)
    return df.withColumn(out_col, F.array(*coords))


@register_stage("quantize_embeddings")
def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "qvec",
    scale_col: str = "qscale",
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-vector integer quantization: ``q = round(x /
    scale)`` with ``scale = max|x| / (2^(bits-1) - 1)`` — the 4× (int8)
    storage/bandwidth cut ANN serving applies before shipping vectors.

    Pure codegen array transforms (abs-max, scaled round, clamp) — no
    Python, no shuffle; all-zero vectors get scale 0 and zero codes.
    Reconstruction is ``q · scale`` (:func:`dequantize_embeddings`);
    max abs error ≤ scale/2 per coordinate.
    """
    qmax = (1 << (bits - 1)) - 1
    x = F.col(vec_col).cast("array<double>")
    mx = F.array_max(F.transform(x, lambda v: F.abs(v)))
    scale = mx / F.lit(float(qmax))
    q = F.when(mx > 0, F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda v: F.least(
            F.greatest(F.round(v / F.col(scale_col)), F.lit(-qmax - 1.0)),
            F.lit(float(qmax)),
        ).cast("int"),
    )).otherwise(F.transform(x, lambda v: F.lit(0)))
    return (
        df.withColumn(scale_col, F.coalesce(scale, F.lit(0.0)))
        .withColumn(out_col, q)
    )


@register_stage("dequantize_embeddings")
def dequantize_embeddings(
    df: DataFrame,
    qvec_col: str = "qvec",
    scale_col: str = "qscale",
    out_col: str = "embedding",
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings`: ``x ≈ q · scale``."""
    return df.withColumn(
        out_col,
        F.transform(F.col(qvec_col), lambda q: q.cast("double") * F.col(scale_col)),
    )
