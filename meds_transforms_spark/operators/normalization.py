"""normalization — z-score values and dictionary-encode codes.

Reference semantics (src/MEDS_transforms/stages/normalization/
normalization.py:187-225): inner-join the event table to code metadata on
(code, *modifiers) with null-equal keys; replace ``code`` with its
integer ``code/vocab_index`` and ``numeric_value`` with
``(v - mean) / std`` where mean/std come from the metadata (precomputed
``values/mean``/``values/std``, else derived from n/Σ/Σ²); input row
order is restored via a row index.

Spark plan: broadcast inner join (null-safe on modifier keys) against the
vocabulary-sized metadata — map-side, no fact-table shuffle; projection
stays in codegen. Codes absent from the vocabulary are dropped by the
inner join, matching the reference.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage
from meds_transforms_spark.schema import CODE, NUMERIC_VALUE


@register_stage("normalization")
def normalization(
    df: DataFrame,
    code_metadata: DataFrame,
    code_modifiers: Sequence[str] = (),
) -> DataFrame:
    keys = [CODE, *code_modifiers]
    meta = code_metadata
    if "values/mean" in meta.columns and "values/std" in meta.columns:
        mean, std = F.col("values/mean"), F.col("values/std")
    else:
        n = F.col("values/n_occurrences")
        # try_divide: zero-count codes (no observed values) must yield
        # null stats, not an ANSI DIVIDE_BY_ZERO error.
        mean = F.try_divide(F.col("values/sum"), n)
        var = F.try_divide(F.col("values/sum_sqd"), n) - mean * mean
        std = F.sqrt(F.greatest(var, F.lit(0.0)))
    stats = meta.select(
        *keys,
        F.col("code/vocab_index").alias("__vocab"),
        mean.alias("__mean"),
        std.alias("__std"),
    ).dropDuplicates(keys)

    # Null-safe equi-join: nullable modifier keys must match null-to-null
    # (nulls_equal=True at normalization.py:214). Spark's `on=[cols]`
    # form is not null-safe → build an explicit <=> condition.
    cond = None
    for k in keys:
        term = df[k].eqNullSafe(stats[k])
        cond = term if cond is None else cond & term
    joined = df.join(F.broadcast(stats), cond, "inner")

    # The reference's normalization emits ONLY the tokenization-ready
    # core schema (its golden outputs drop upstream extras like
    # numeric_value/is_inlier); keep subject/time (+order key) only.
    from meds_transforms_spark.schema import ORDER_KEY, SUBJECT_ID, TIME

    keep = [c for c in (SUBJECT_ID, TIME, ORDER_KEY) if c in df.columns]
    passthrough = [df[c] for c in keep]
    v = df[NUMERIC_VALUE]
    return joined.select(
        *passthrough,
        stats["__vocab"].cast("long").alias(CODE),
        F.when(
            v.isNotNull() & stats["__std"].isNotNull() & (stats["__std"] != 0),
            (v - stats["__mean"]) / stats["__std"],
        )
        .cast("float")
        .alias(NUMERIC_VALUE),
    )
