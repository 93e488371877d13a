"""validate_meds — dataset contract checks as a reporting stage.

The reference validates inputs via the ``meds`` package schema and
per-stage assertions; here validation is itself a distributed query
returning one row per violated rule (empty result = valid dataset).
Checks:

- mandatory columns present with compatible types
- ``subject_id`` / ``code`` non-null
- ``numeric_value`` NaN accounting (informational count)
- per-subject event-time monotonicity when an ``__order`` key exists

Everything is one aggregation pass; nothing collects raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage
from meds_transforms_spark.schema import (
    CODE,
    MANDATORY_COLUMNS,
    NUMERIC_VALUE,
    ORDER_KEY,
    SUBJECT_ID,
    TIME,
)


@register_stage("validate_meds")
def validate_meds(df: DataFrame, strict: bool = False) -> DataFrame:
    """Returns (rule, n_violations) rows; empty = clean.

    ``strict=True`` raises on any violation instead of returning them.
    """
    spark = df.sparkSession
    missing = [c for c in MANDATORY_COLUMNS if c not in df.columns]
    reports = []
    if missing:
        reports.append(
            spark.createDataFrame(
                [(f"missing_column:{c}", 1) for c in missing],
                "rule string, n_violations long",
            )
        )
    else:
        checks = [
            ("null_subject_id", F.col(SUBJECT_ID).isNull()),
            ("null_code", F.col(CODE).isNull()),
            ("nan_numeric_value", F.isnan(F.col(NUMERIC_VALUE))),
        ]
        agg = df.agg(
            *[F.sum(F.when(cond, 1).otherwise(0)).alias(rule) for rule, cond in checks]
        )
        melted = agg.unpivot([], [r for r, _ in checks], "rule", "n_violations").filter(
            F.col("n_violations") > 0
        )
        reports.append(melted)
        if ORDER_KEY in df.columns:
            w = W.partitionBy(SUBJECT_ID).orderBy(ORDER_KEY)
            ooo = (
                df.filter(F.col(TIME).isNotNull())
                .withColumn("__prev", F.lag(TIME).over(w))
                .filter(F.col("__prev").isNotNull() & (F.col(TIME) < F.col("__prev")))
                .agg(F.count(F.lit(1)).alias("n_violations"))
                .select(F.lit("time_not_monotonic").alias("rule"), "n_violations")
                .filter(F.col("n_violations") > 0)
            )
            reports.append(ooo)

    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    if strict:
        rows = out.collect()
        if rows:
            raise ValueError(f"MEDS validation failed: {[(r.rule, r.n_violations) for r in rows]}")
    return out


@register_stage("validate_corpus")
def validate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chars: int = 10_000_000,
    strict: bool = False,
) -> DataFrame:
    """Document-corpus contract checks: ``(rule, n_violations)`` rows,
    empty = clean. The ingest gate before dedup/quality/training ever
    run — each rule is a condition every downstream operator assumes:

    - ``null_id`` / ``duplicate_id``: ids drive dedup keeper election,
      stable-id ranking, pack assignment — NULL or colliding ids make
      those silently wrong, not erroring.
    - ``null_text`` (reported, not fatal): operators handle NULL text
      fail-soft, but a high count usually means a broken extractor.
    - ``oversize_text``: a pathological document (``> max_chars``)
      dominates any per-doc quadratic (PMI pairs, within-doc line
      dedup) and skews packing.

    One aggregation pass (duplicate detection is a count-vs-distinct
    on the id — no expand, no self-join); ``strict=True`` raises.
    """
    spark = df.sparkSession
    missing = [c for c in (id_col, text_col) if c not in df.columns]
    if missing:
        out = spark.createDataFrame(
            [(f"missing_column:{c}", 1) for c in missing],
            "rule string, n_violations long",
        )
    else:
        agg = df.agg(
            F.sum(F.when(F.col(id_col).isNull(), 1).otherwise(0)).alias("null_id"),
            (
                F.count(F.when(F.col(id_col).isNotNull(), 1))
                - F.count_distinct(F.col(id_col))
            ).alias("duplicate_id"),
            F.sum(F.when(F.col(text_col).isNull(), 1).otherwise(0)).alias("null_text"),
            F.sum(
                F.when(F.length(F.col(text_col)) > int(max_chars), 1).otherwise(0)
            ).alias("oversize_text"),
        )
        out = agg.unpivot(
            [], ["null_id", "duplicate_id", "null_text", "oversize_text"],
            "rule", "n_violations",
        ).filter(F.col("n_violations") > 0)
    if strict:
        rows = out.collect()
        if rows:
            raise ValueError(
                "corpus validation failed: "
                + ", ".join(f"{r.rule}={r.n_violations}" for r in rows)
            )
        return out.sparkSession.createDataFrame([], "rule string, n_violations long")
    return out
