"""Small utility stages.

- ``drop_regex``: drop rows whose code matches a regex (reference
  extension example: example/simple_example_pkg/src/simple_example_pkg/
  drop_regex/drop_regex.py:50-53).
- ``filter_rows``: matcher-DSL row filter (generalizes the reference's
  read-time filters, dataframe/read_fn.py:22-86).
- ``dedup_events``: distinct (subject, time) rows
  (add_time_derived_measurements/utils.py:129-133).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.functions.matcher import matcher_to_expr
from meds_transforms_spark.operators.base import register_stage
from meds_transforms_spark.schema import CODE, ORDER_KEY, SUBJECT_ID, TIME


@register_stage("drop_regex")
def drop_regex(df: DataFrame, regex: str) -> DataFrame:
    return df.filter(~F.col(CODE).rlike(regex))


@register_stage("filter_rows")
def filter_rows(df: DataFrame, matcher: dict, negate: bool = False) -> DataFrame:
    pred, _ = matcher_to_expr(matcher)
    return df.filter(~pred if negate else pred)


@register_stage("dedup_events")
def dedup_events(df: DataFrame) -> DataFrame:
    """Exact-duplicate measurement removal: one row per distinct
    measurement tuple (all data columns; the ORDER_KEY bookkeeping
    column is excluded so re-ingested copies still collapse).

    NOT dropDuplicates([subject, time]) — Spark treats NULLs as equal
    there, so that form kept ONE arbitrary row per (subject, time) and
    collapsed a subject's whole static (null-time) block into a single
    shuffle-order-dependent survivor. Duplicate full rows are
    interchangeable in their DATA columns, but each carries its own
    ORDER_KEY, so a dropDuplicates that merely *excluded* ORDER_KEY
    kept a shuffle-order-dependent key — downstream
    (subject, time, __order) sorts would place the survivor
    nondeterministically among tied rows. Aggregating min(ORDER_KEY)
    per distinct tuple makes the survivor's position a pure function
    of the data. For the distinct EVENT GRID (unique non-null
    (subject, time) pairs) see add_time_derived._distinct_events."""
    if ORDER_KEY not in df.columns:
        return df.dropDuplicates(df.columns)
    keys = [c for c in df.columns if c != ORDER_KEY]
    return (
        df.groupBy(*keys)
        .agg(F.min(ORDER_KEY).alias(ORDER_KEY))
        .select(*df.columns)
    )


@register_stage("scale_numeric")
def scale_numeric(df: DataFrame, factor: float = 1.0, column: str = "numeric_value") -> DataFrame:
    """Scale a numeric column — the minimal value-revision stage used to
    exercise match_revise composition (per-slice config overrides)."""
    return df.withColumn(column, F.col(column) * F.lit(float(factor)))
