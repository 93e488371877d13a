"""Hashed linear quality classifier — the fastText-shaped scorer.

Corpus curation pipelines score every document with a cheap linear
classifier over hashed bag-of-token features (fastText architecture:
GPT-3 / LLaMA quality filtering, CCNet's lang/quality gates). The two
halves have very different scale profiles and are split accordingly:

- **Serving** (:func:`hashed_linear_score`) runs over the full corpus
  — it is pure relational: explode tokens, hash to a bucket, join the
  (bucket, weight) model table (broadcast — a model is ≤ a few MB),
  weighted mean + sigmoid per doc. No Python in the loop; linear scans,
  shuffle rows are (id, int, long).
- **Training** (:func:`fit_hashed_classifier`) runs over a *labeled*
  subset (thousands-to-millions of rows, not the corpus) — it uses
  MLlib's LogisticRegression over the SAME hashed features, so fitted
  coefficients serve verbatim through the relational path. Vector
  assembly stays JVM-side too (map_from_entries → dense share array →
  ``array_to_vector``); only MLlib's own iterations touch the driver.

Bucket hashing uses the shared ``_h64`` (xxhash64 / md5_60) so the
md5 mode stays engine-reproducible end-to-end — the driver oracle
recomputes hashed-feature scoring, with a deterministic md5-derived
demo weight table standing in for a fitted model (the serving plan is
identical either way).

The reference engine has no classifier plane; this extends the
training-pipeline layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage
from meds_transforms_spark.operators.dedup import _h64
from meds_transforms_spark.operators.text import _tokens


def demo_weights(spark, n_buckets: int = 4096, scale: float = 4.0) -> DataFrame:
    """Deterministic md5-derived weight table — a stand-in model for
    plumbing tests and engine-reproducible oracles: w(bucket) is
    uniform in [-scale/2, +scale/2). NOT a trained model; swap in
    :func:`fit_hashed_classifier` output for real quality scoring."""
    b = F.col("id").cast("int")
    h = F.conv(F.substring(F.md5(b.cast("string")), 1, 15), 16, 10).cast("double")
    w = (h / F.lit(float(1 << 60)) - 0.5) * F.lit(float(scale))
    return spark.range(n_buckets).select(b.alias("bucket"), w.alias("weight"))


@register_stage("hashed_linear_score")
def hashed_linear_score(
    df: DataFrame,
    weights: DataFrame,
    bias: float = 0.0,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
    round_to: int | None = None,
) -> DataFrame:
    """Score every document: ``sigmoid(mean_tokens(w[bucket(tok)]) +
    bias)`` — fastText's averaged-bag forward pass as a relational
    plan. ``weights`` is a (bucket, weight) table; unhit buckets weigh
    0. Adds ``quality_prob`` (NULL for token-less docs)."""
    toks = _tokens(F.lower(F.col(text_col)))
    per_bucket = (
        df.select(F.col(id_col), F.explode(toks).alias("__tok"))
        .select(
            id_col,
            F.pmod(_h64(hash_fn, F.col("__tok")), F.lit(n_buckets)).cast("int").alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    scored = (
        per_bucket.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            (
                F.sum(F.col("__n") * F.coalesce(F.col("weight"), F.lit(0.0)))
                / F.sum("__n")
                + F.lit(float(bias))
            ).alias("__z")
        )
        .withColumn("quality_prob", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__z"))))
        .drop("__z")
    )
    if round_to is not None:
        scored = scored.withColumn(
            "quality_prob", F.round("quality_prob", int(round_to))
        )
    return df.join(scored, id_col, "left")


def fit_hashed_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    hash_fn: str = "xxhash64",
    reg_param: float = 0.0,
    max_iter: int = 50,
):
    """Fit logistic regression over the SAME hashed features the
    serving path uses; returns ``(weights DataFrame, bias float)``
    ready for :func:`hashed_linear_score`.

    The labeled frame is the small curated set (not the corpus); the
    dense share-array assembly (n_buckets doubles per row) and MLlib
    iterations are training cost only. Features are normalized bucket
    shares, matching the serving forward pass exactly.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    toks = _tokens(F.lower(F.col(text_col)))
    per_bucket = (
        labeled.select(
            F.col(id_col), F.col(label_col).cast("double").alias("__y"), F.explode(toks).alias("__tok")
        )
        .select(
            id_col,
            "__y",
            F.pmod(_h64(hash_fn, F.col("__tok")), F.lit(n_buckets)).cast("int").alias("bucket"),
        )
        .groupBy(id_col, "__y", "bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    per_doc = per_bucket.groupBy(id_col, "__y").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bucket"), F.col("__n")))
        ).alias("__m"),
        F.sum("__n").alias("__tot"),
    )
    shares = F.transform(
        F.sequence(F.lit(0), F.lit(n_buckets - 1)),
        lambda i: F.coalesce(
            F.element_at("__m", i.cast("int")) / F.col("__tot"), F.lit(0.0)
        ),
    )
    train = per_doc.select(
        F.col("__y").alias("label"), array_to_vector(shares).alias("features")
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=float(reg_param),
        maxIter=int(max_iter),
        standardization=False,
    )
    model = lr.fit(train)
    coefs = model.coefficients
    spark = labeled.sparkSession
    rows = [(int(i), float(coefs[int(i)])) for i in coefs.indices] if hasattr(
        coefs, "indices"
    ) else [(i, float(v)) for i, v in enumerate(coefs) if v != 0.0]
    weights = spark.createDataFrame(rows or [(0, 0.0)], "bucket int, weight double")
    return weights, float(model.intercept)
