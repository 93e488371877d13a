"""Scale spot-check: bucketized interval join at 10M points x 200k intervals.

Deterministic hash-derived data (no RNG): 10M events over 100k users
across a 30-day span; 200k half-hour-ish windows. The bucketized join
is verified against the naive equi-join + BETWEEN filter (same pair
count) and both are timed — the naive plan's range residual re-scans
every same-user pair, the bucketized one prunes to the point's single
time bin first.

Usage: python scripts/scale_interval.py [n_points] [n_intervals]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meds_transforms_spark import get_spark
from meds_transforms_spark.operators.interval import interval_join

SPAN_S = 30 * 86_400


def _mk(spark, n_points: int, n_intervals: int, n_users: int):
    points = spark.range(n_points).select(
        F.col("id").alias("pid"),
        F.pmod(F.xxhash64("id"), F.lit(n_users)).alias("k"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(SPAN_S))
        ).alias("ts"),
    )
    intervals = spark.range(n_intervals).select(
        F.col("id").alias("iid"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n_users)).alias("k"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.pmod(F.xxhash64("id", F.lit(3)), F.lit(SPAN_S))
        ).alias("start_ts"),
    )
    intervals = intervals.withColumn(
        "end_ts",
        F.timestamp_seconds(
            F.unix_timestamp("start_ts")
            + 600
            + F.pmod(F.xxhash64("iid", F.lit(4)), F.lit(2_400))
        ),
    )
    return points.localCheckpoint(), intervals.localCheckpoint()


def _run(points, intervals, strategy: str) -> tuple[int, float]:
    t0 = time.time()
    n = interval_join(
        points,
        intervals,
        "ts",
        "start_ts",
        "end_ts",
        on="k",
        bin_width_s=1_800,
        strategy=strategy,
    ).count()
    return n, time.time() - t0


def main() -> None:
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_intervals = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000

    spark = get_spark("scale_interval")

    # Scenario 1: fine-grained key (100k users) — the equi key alone is
    # selective, so the residual strategy's per-key quadratic cost never
    # materializes and it wins on plan simplicity.
    points, intervals = _mk(spark, n_points, n_intervals, 100_000)
    n_bin, t_bin = _run(points, intervals, "bin")
    n_res, t_res = _run(points, intervals, "residual")
    assert n_bin == n_res, (n_bin, n_res)
    print(
        f"fine key (100k): {n_points:,} x {n_intervals:,} -> {n_bin:,} pairs; "
        f"bin {t_bin:.1f}s, residual {t_res:.1f}s"
    )

    # Scenario 2: coarse key (100 tenants) at 1/5 scale — the residual
    # join compares every same-key pair (quadratic per key); binning
    # prunes by the point's time bin first.
    points, intervals = _mk(spark, n_points // 5, n_intervals // 4, 100)
    n_bin, t_bin = _run(points, intervals, "bin")
    n_res, t_res = _run(points, intervals, "residual")
    assert n_bin == n_res, (n_bin, n_res)
    print(
        f"coarse key (100): {n_points // 5:,} x {n_intervals // 4:,} -> "
        f"{n_bin:,} pairs; bin {t_bin:.1f}s, residual {t_res:.1f}s"
    )


if __name__ == "__main__":
    main()
