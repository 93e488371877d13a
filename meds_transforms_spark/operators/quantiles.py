"""Distributed exact grouped quantiles — the 100 TB path.

``aggregate_code_metadata``'s default quantile implementation collects
each group's values into a sorted array (`collect_list`) — exact and
fast while a group's values fit an executor's memory, but a single
ultra-common code at 100 TB can hold billions of values. This module
computes the SAME nearest-rank quantiles without materializing any
array, using the classic sort-free two-level formulation:

1. ``groupBy(keys, value).count()`` — collapses duplicates; map-side
   partial aggregation means the shuffle carries one row per distinct
   (group, value), not per observation.
2. A cumulative-count window ordered by value within each group — the
   rank range each distinct value covers.
3. A quantile q with group size n selects rank ``round(q·(n−1)) + 1``
   (nearest-rank, matching the reference's exact quantile_reducer,
   aggregate_code_metadata.py:101-165); the covering distinct value is
   picked with a plain filter + min.

Memory per task is O(distinct values per group partition slice), and the
sort is Spark's external (spillable) sort — nothing unbounded.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from meds_transforms_spark.schema import CODE, NUMERIC_VALUE


def grouped_exact_quantiles(
    df: DataFrame,
    quantiles: Sequence[float],
    keys: Sequence[str] = (CODE,),
    value_col: str = NUMERIC_VALUE,
) -> DataFrame:
    """One row per group: ``q<q>`` columns with exact nearest-rank
    quantiles of ``value_col`` (nulls and NaNs excluded)."""
    keys = list(keys)
    v = F.col(value_col)
    present = df.filter(v.isNotNull() & ~F.isnan(v))

    counts = present.groupBy(*keys, value_col).agg(F.count(F.lit(1)).alias("__c"))
    w_cum = (
        W.partitionBy(*keys)
        .orderBy(value_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy(*keys)
    ranked = counts.withColumn("__cum", F.sum("__c").over(w_cum)).withColumn(
        "__n", F.sum("__c").over(w_all)
    )

    aggs = []
    for q in quantiles:
        # Target rank (1-based); the covering value is the smallest
        # distinct value whose cumulative count reaches it.
        target = (F.round(F.lit(float(q)) * (F.col("__n") - 1)) + 1).cast("long")
        aggs.append(
            F.min(F.when(F.col("__cum") >= target, F.col(value_col))).alias(f"q{q}")
        )
    return ranked.groupBy(*keys).agg(*aggs)
