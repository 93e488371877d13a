"""Time-range rolling statistics and wide featurization.

Two featurization primitives a training-data pipeline needs that the
reference lacks (its windows are whole-partition or lag-1 only —
SURVEY §2.5):

- ``rolling_time_stats``: per-key trailing event-time window
  (``RANGE BETWEEN <interval> PRECEDING AND CURRENT ROW``) computed
  with Spark's native ``rangeBetween`` over epoch-microseconds — one
  shuffle on the key, in-partition sort, no self-join and no
  per-row subquery. At 100 TB this rides the same subject/user
  partitioning as every other window stage.
- ``pivot_features``: long→wide per-entity feature matrix over an
  EXPLICIT category list. Passing the list matters at scale: without
  it Spark runs an extra distinct-collect job over the full table to
  discover pivot values; with it the pivot is a single partial+final
  hash aggregation with one output column per category.

Sums are computed over exact DECIMAL casts so results are
order-independent and cross-engine deterministic (float sums are
neither).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage


def bucketize_for_trailing_window(
    df: DataFrame,
    time_col: str,
    window_seconds: int,
    bucket_seconds: int,
) -> DataFrame:
    """Decompose a trailing RANGE window over time into (keys, bucket)
    partitions EXACTLY: adds ``__bucket`` (floor(epoch-µs / bucket))
    and ``__ctx`` (True for the duplicated context copies).

    A keys-only window caps parallelism at the key cardinality — a
    5-value key runs 5 window tasks on ANY cluster size (measured in
    SCALING.md round-6). Appending ``__bucket`` to the partition keys
    restores parallelism ∝ keys × buckets; every row within
    ``window_seconds`` of a bucket boundary is duplicated one bucket
    FORWARD as a context-only row, so each judged (non-context) row
    still sees its full trailing frame. Requires ``bucket_seconds >=
    window_seconds`` (context never needs to spill further than one
    bucket). The caller windows over ``keys + ["__bucket"]``, then
    filters ``~__ctx`` and drops both columns — output rows are
    bit-identical to the keys-only window's.

    NULL-``time_col`` rows get a NULL bucket (one partition per key)
    and are never duplicated — same pass-through semantics as the
    plain window.
    """
    if int(bucket_seconds) < int(window_seconds):
        raise ValueError(
            "bucket_seconds must be >= window_seconds "
            "(context rows spill exactly one bucket forward)"
        )
    us = int(window_seconds) * 1_000_000
    bus = int(bucket_seconds) * 1_000_000
    t_us = F.unix_micros(F.col(time_col))
    bucket = F.floor(t_us / F.lit(bus))
    # Single-pass explode (NOT a union of two scans): each row yields
    # its own (bucket, ctx=False) entry plus, when it sits within
    # window_seconds of the next boundary, a (bucket+1, ctx=True)
    # context copy. A union's two legs don't canonicalize into one
    # subtree, so an expensive upstream lineage would execute twice.
    own = F.struct(bucket.alias("b"), F.lit(False).alias("c"))
    near_boundary = F.col(time_col).isNotNull() & (
        t_us >= (bucket + F.lit(1)) * F.lit(bus) - F.lit(us)
    )
    entries = F.when(
        near_boundary,
        F.array(
            own, F.struct((bucket + F.lit(1)).alias("b"), F.lit(True).alias("c"))
        ),
    ).otherwise(F.array(own))
    return (
        df.withColumn("__e", F.explode(entries))
        .withColumn("__bucket", F.col("__e.b"))
        .withColumn("__ctx", F.col("__e.c"))
        .drop("__e")
    )


@register_stage("rolling_time_stats")
def rolling_time_stats(
    df: DataFrame,
    keys: list[str] | str,
    time_col: str = "time",
    value_col: str | None = None,
    window_seconds: int = 3600,
    decimal_scale: int = 6,
    prefix: str | None = None,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Append trailing-window count/sum columns to every row.

    The window is ``[t - window_seconds, t]`` inclusive on both ends —
    the same semantics as SQL ``RANGE BETWEEN x PRECEDING AND CURRENT
    ROW`` (rows tied on the order value are all included).

    Output columns: ``{prefix}_n`` (count) and, when ``value_col`` is
    given, ``{prefix}_sum`` — the value quantized to 10^-decimal_scale
    units with ``floor(v·10^s + 0.5)`` (exact on doubles, identical in
    every engine), summed as a LONG, divided back at the boundary.
    Integer sums are order-independent AND stay in whole-stage codegen;
    a DECIMAL sum over a *sliding* frame re-aggregates non-codegen
    decimal buffers every frame move — measured 2× slower at 10M rows
    (SCALING.md).

    ``bucket_seconds``: low-cardinality-keys scale knob — see
    :func:`bucketize_for_trailing_window`. Off by default (the extra
    context copies only pay for themselves when the key cardinality
    is below the cluster's task slots).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    p = prefix or f"w{window_seconds}s"
    us = int(window_seconds) * 1_000_000
    part_keys = list(keys)
    if bucket_seconds is not None:
        df = bucketize_for_trailing_window(df, time_col, window_seconds, bucket_seconds)
        part_keys.append("__bucket")
    w = (
        W.partitionBy(*part_keys)
        .orderBy(F.unix_micros(F.col(time_col)))
        .rangeBetween(-us, 0)
    )
    out = df.withColumn(f"{p}_n", F.count(F.lit(1)).over(w))
    if value_col is not None:
        scale = float(10 ** decimal_scale)
        q = F.floor(F.col(value_col) * F.lit(scale) + F.lit(0.5)).cast("long")
        out = out.withColumn(
            f"{p}_sum", F.sum(q).over(w).cast("double") / F.lit(scale)
        )
    if bucket_seconds is not None:
        out = out.filter(~F.col("__ctx")).drop("__bucket", "__ctx")
    return out


@register_stage("pivot_features")
def pivot_features(
    df: DataFrame,
    entity_col: str,
    category_col: str,
    categories: list[str],
    value_col: str | None = None,
    decimal_scale: int = 6,
) -> DataFrame:
    """One row per entity; per-category count and exact-sum columns.

    ``categories`` is the explicit, ordered output column list; rows
    with other categories are ignored (pivot semantics). Column names:
    ``{cat}_n`` and ``{cat}_sum``.
    """
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast(f"decimal(28,{decimal_scale})")).alias("s")
        )
    pivoted = (
        df.groupBy(entity_col)
        .pivot(category_col, list(categories))
        .agg(*aggs)
    )
    # Single-agg pivots name columns `{cat}`; multi-agg `{cat}_{alias}`.
    cols = [F.col(entity_col)]
    for cat in categories:
        if value_col is None:
            cols.append(F.coalesce(F.col(f"`{cat}`"), F.lit(0)).alias(f"{cat}_n"))
        else:
            cols.append(
                F.coalesce(F.col(f"`{cat}_n`"), F.lit(0)).alias(f"{cat}_n")
            )
            cols.append(F.col(f"`{cat}_s`").cast("double").alias(f"{cat}_sum"))
    return pivoted.select(*cols)
