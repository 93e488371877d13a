"""Trailing-window z-score anomaly flagging for event streams.

The monitoring primitive over any metric-bearing event table: compare
each event's value against the mean/stddev of that entity's OWN
trailing window. Composes :func:`~meds_transforms_spark.operators.
rolling.rolling_time_stats`' machinery — count, quantized sum, and sum
of squares all run over ONE (keys) exchange + sort, three frames on the
same window spec, so the plan cost is identical to a single rolling
aggregate.

Engine parity: sums are quantized to ``10^-decimal_scale`` units and
aggregated as LONGs (order-independent, codegen-friendly, identical in
every engine); the z-score is rounded at the boundary so a SQL oracle
reproduces the flag decision bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage


@register_stage("rolling_anomaly")
def rolling_anomaly(
    df: DataFrame,
    keys: list[str] | str,
    time_col: str = "time",
    value_col: str = "value",
    window_seconds: int = 3600,
    z_threshold: float = 3.0,
    min_events: int = 10,
    decimal_scale: int = 3,
    round_to: int = 6,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Append ``w_n``, ``w_mean``, ``z_score`` (rounded), and
    ``is_anomaly`` to every row.

    ``is_anomaly`` is True when the trailing window holds at least
    ``min_events`` NON-NULL values (NULL-valued rows pass through
    unjudged and count toward nothing), the window variance is
    positive, and the
    rounded z-score exceeds ``z_threshold``. The current row is part of
    its own window (RANGE ... AND CURRENT ROW), matching the SQL frame
    an oracle replays; population variance (``/n``) is used.

    NULL-``time_col`` rows also pass through unjudged (w_n/w_mean/
    z_score NULL, is_anomaly False): ``unix_micros(NULL)`` is NULL, so
    they would otherwise all share one meaningless RANGE frame within
    each key and be flagged against each other.

    Both moments derive from ONE quantization ``q = round(v·10^s)`` so
    the variance identity can't go negative from mixed precision.
    Overflow bound for the LONG square-sum: ``n · (10^s·v_max)² <
    2^63`` — at the default s=3 that is ~9M window rows for values up
    to 1000; raise/lower ``decimal_scale`` per the metric's range.

    ``bucket_seconds`` is the SCALE knob. The plain window partitions
    by ``keys`` alone, so parallelism is capped at the KEY CARDINALITY
    — with 5 event types, 10M rows run as 5 window tasks no matter how
    many executors exist (measured: the one sub-family outlier in
    SCALING.md's 100× scale-up). Setting ``bucket_seconds`` (must be
    ≥ ``window_seconds``) decomposes the window EXACTLY: rows are
    hashed to (keys, time-bucket) partitions, and each row whose
    trailing window could be read from the NEXT bucket (within
    ``window_seconds`` of the boundary) is duplicated into it as a
    context-only row — frame content per judged row is identical, so
    results are bit-for-bit the plain window's. Cost: the exchange
    carries up to ``window/bucket`` extra context copies (25% at
    6 h / 24 h); gain: parallelism ∝ keys × buckets instead of keys.
    """
    from meds_transforms_spark.operators.rolling import (
        bucketize_for_trailing_window,
    )

    keys = [keys] if isinstance(keys, str) else list(keys)
    us = int(window_seconds) * 1_000_000
    part_keys: list = list(keys)
    if bucket_seconds is not None:
        df = bucketize_for_trailing_window(df, time_col, window_seconds, bucket_seconds)
        part_keys.append("__bucket")
    w = (
        W.partitionBy(*part_keys)
        .orderBy(F.unix_micros(F.col(time_col)))
        .rangeBetween(-us, 0)
    )
    scale = float(10 ** int(decimal_scale))
    # Pre-null NaN readings: floor(NaN).cast(long) is 0, so one NaN
    # sensor glitch would contribute a phantom 0.0 to every overlapping
    # window's count/sum/sum² — NaN must count toward nothing, like
    # NULL (the aggregate_code_metadata discipline).
    v_clean = F.when(~F.isnan(F.col(value_col)), F.col(value_col))
    q = F.floor(v_clean * F.lit(scale) + F.lit(0.5)).cast("long")
    # Materialize each window aggregate into a column ONCE before
    # deriving mean/var/z: Spark extracts every textual `.over` as its
    # own window function, so embedding the aggregates in the compound
    # expressions evaluated 14 frames instead of 3 (measured 3×).
    # count(q), not count(1): sums skip NULL values, so the row count
    # feeding mean/variance must too — else NULL-valued rows deflate
    # the mean and pad the min_events gate
    base = (
        df.withColumn("__wn", F.count(q).over(w))
        .withColumn("__ws", F.sum(q).over(w))
        .withColumn("__ws2", F.sum(q * q).over(w))
    )
    n = F.col("__wn")
    mean = (F.col("__ws").cast("double") / scale) / n
    var = (F.col("__ws2").cast("double") / (scale * scale)) / n - mean * mean
    # v_clean, not the raw column: a NaN value would make z NaN, and
    # Spark orders NaN above every double, so NaN > z_threshold would
    # self-flag the glitch row as an anomaly
    z = F.round(F.when(var > 0, (v_clean - mean) / F.sqrt(var)), int(round_to)) + F.lit(
        0.0
    )
    has_ts = F.col(time_col).isNotNull()
    if bucket_seconds is not None:
        base = base.filter(~F.col("__ctx")).drop("__bucket", "__ctx")
    return (
        base.withColumn("w_n", F.when(has_ts, n.cast("long")))
        .withColumn("w_mean", F.when(has_ts, F.round(mean, int(round_to)) + F.lit(0.0)))
        .withColumn("z_score", F.when(has_ts, z))
        .withColumn(
            "is_anomaly",
            F.coalesce(
                (F.col("w_n") >= int(min_events))
                & F.col("z_score").isNotNull()
                & (F.col("z_score") > float(z_threshold)),
                F.lit(False),
            ),
        )
        .drop("__wn", "__ws", "__ws2")
    )
