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

from meds_transforms_spark.operators.base import register_stage
from meds_transforms_spark.schema import CODE, NUMERIC_VALUE


@register_stage("grouped_exact_quantiles", kind="mapreduce", is_metadata=True)
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


@register_stage("grouped_approx_quantiles", kind="mapreduce", is_metadata=True)
def grouped_approx_quantiles(
    df: DataFrame,
    quantiles: Sequence[float],
    keys: Sequence[str] = (CODE,),
    value_col: str = NUMERIC_VALUE,
    accuracy: int = 10_000,
) -> DataFrame:
    """Sketch-based grouped quantiles: ONE hash-aggregation pass, no
    per-group sort, no cumulative window — the single-pass path when
    even the distinct-value stream of :func:`grouped_exact_quantiles`
    is too hot (a code with billions of DISTINCT values makes the
    cumulative window's per-group sort the bottleneck).

    Wraps Spark's ``percentile_approx`` (Greenwald-Khanna sketch,
    guarantee: rank error ≤ n/accuracy). The sketch is MERGEABLE, so
    partial aggregation happens map-side and the shuffle carries one
    ~accuracy-bounded sketch per (group, partition) — independent of
    group row count. Memory per group is O(accuracy).

    Column layout matches :func:`grouped_exact_quantiles` (``q<q>``),
    so the two are drop-in swappable. Not oracle-replayable: sketch
    compression decisions are engine-internal; correctness is pinned
    by the rank-error-bound property test instead
    (tests/test_approx_quantiles.py).
    """
    keys = list(keys)
    v = F.col(value_col)
    present = df.filter(v.isNotNull() & ~F.isnan(v))
    aggs = [
        F.percentile_approx(value_col, float(q), int(accuracy)).alias(f"q{q}")
        for q in quantiles
    ]
    return present.groupBy(*keys).agg(*aggs)


@register_stage("approx_quantiles_certificate", kind="mapreduce", is_metadata=True)
def approx_quantiles_certificate(
    df: DataFrame,
    quantiles: Sequence[float],
    keys: Sequence[str] = (CODE,),
    value_col: str = NUMERIC_VALUE,
    accuracy: int = 10_000,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Oracle-checkable contract for the sketch path: one row per
    (group, quantile) with the EXACT nearest-rank value (replayable by
    any SQL engine) plus ``within_tol`` certifying that the
    Greenwald-Khanna result's rank error is inside the declared
    guarantee — an engine-independent assertion (the oracle side emits
    a constant TRUE, so a sketch that ever violates its bound turns
    the row red).

    The bound is the one the property test pins
    (tests/test_approx_quantiles.py): the returned value's rank
    interval ``[count(v < x) + 1, count(v <= x)]`` must come within
    ``tol = max(1, n/accuracy)`` of the target rank ``q·(n−1) + 1``.

    ``candidates`` (optional) swaps in an externally computed quantile
    frame — same layout as :func:`grouped_approx_quantiles` — so
    another engine's sketch output can be certified against this
    corpus; by default the GK sketch runs here (one mergeable-sketch
    aggregation pass).

    Scale: the fact table is scanned twice (sketch pass + one
    conditional-sum aggregation against the broadcast per-group
    quantile row) plus the exact two-level pass — this is a VALIDATION
    query; the production path stays the one-pass
    :func:`grouped_approx_quantiles`.
    """
    keys = list(keys)
    qs = [float(q) for q in quantiles]
    v = F.col(value_col)
    present = df.filter(v.isNotNull() & ~F.isnan(v))

    ap = candidates
    if ap is None:
        ap = grouped_approx_quantiles(df, qs, keys, value_col, accuracy)
    ap = ap.select(
        *keys, *[F.col(f"`q{q}`").alias(f"__ap{i}") for i, q in enumerate(qs)]
    )

    joined = present.join(F.broadcast(ap), keys)
    cert_aggs = [F.count(F.lit(1)).alias("__n")]
    for i in range(len(qs)):
        api = F.col(f"__ap{i}")
        cert_aggs.append(
            (F.sum(F.when(v < api, 1).otherwise(0)) + 1).alias(f"__lo{i}")
        )
        cert_aggs.append(F.sum(F.when(v <= api, 1).otherwise(0)).alias(f"__hi{i}"))
    cert = joined.groupBy(*keys).agg(*cert_aggs)

    n = F.col("__n").cast("double")
    tol = F.greatest(F.lit(1.0), n / F.lit(float(accuracy)))
    checks = []
    for i, q in enumerate(qs):
        target = F.lit(q) * (n - F.lit(1.0)) + F.lit(1.0)
        lo = F.col(f"__lo{i}").cast("double")
        hi = F.col(f"__hi{i}").cast("double")
        ok = (target >= lo - tol) & (target <= hi + tol)
        checks.append(F.struct(F.lit(q).alias("q"), ok.alias("within_tol")))
    melted = cert.select(*keys, F.explode(F.array(*checks)).alias("__c")).select(
        *keys, F.col("__c.q").alias("q"), F.col("__c.within_tol").alias("within_tol")
    )

    exact = grouped_exact_quantiles(df, qs, keys, value_col)
    ex_structs = [
        F.struct(F.lit(q).alias("q"), F.col(f"`q{q}`").alias("exact_value"))
        for q in qs
    ]
    ex_melted = exact.select(*keys, F.explode(F.array(*ex_structs)).alias("__e")).select(
        *keys, F.col("__e.q").alias("q"), F.col("__e.exact_value").alias("exact_value")
    )
    return ex_melted.join(melted, keys + ["q"])
