"""Measure filter_subjects' distinct-event count under subject skew.

Three candidate plans for ``min_events_per_subject`` (count of distinct
non-null times per subject):

- window_set: ``size(collect_set(time)).over(partitionBy(subject))`` —
  one exchange, no join, but QUADRATIC in the hot subject's size:
  WindowExec evaluates the aggregate's output per ROW, and collect_set's
  eval copies the full set into a fresh array each time, so a subject
  with n events costs O(n^2) element copies in ONE task. Measured:
  0.22 s at hot=0 → 30.7 s at hot=100k (110×) → >1 h at hot=1M.
- window_rank: ``max(dense_rank().over(subject order by time))`` minus a
  null adjustment — same single exchange (one extra in-task sort), the
  rank streams in O(n log n), and the per-row window output is a LONG,
  not an array. Hot subject still lands on one task, but linearly.
- groupby: two-phase ``groupBy(subject, time)`` pre-distinct →
  ``groupBy(subject).count()`` → SEMI JOIN of qualifying ids back onto
  the table. The partial aggregation spreads the hot subject across all
  map tasks — fully skew-proof — at the cost of two more shuffles.

Synthetic skew: N_NORMAL subjects with ~E_NORMAL events each, plus ONE
subject holding HOT_EVENTS distinct timestamps (the "whale" device /
test-harness patient every production corpus has). window_set is only
run at hot <= SET_CAP — beyond that it does not finish in useful time
(that non-termination IS the result).

Run: python scripts/measure_filter_subjects_skew.py [HOT_EVENTS ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from meds_transforms_spark import get_spark
from meds_transforms_spark.schema import SUBJECT_ID, TIME

N_NORMAL = 100_000
E_NORMAL = 10
RUNS = 5
MIN_EVENTS = 5
SET_CAP = 100_000


def build(spark, hot_events: int):
    normal = (
        spark.range(N_NORMAL * E_NORMAL)
        .select(
            (F.col("id") % N_NORMAL).alias(SUBJECT_ID),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias(TIME),
        )
    )
    hot = (
        spark.range(hot_events)
        .select(
            F.lit(10_000_000).cast("long").alias(SUBJECT_ID),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias(TIME),
        )
    )
    # materialize once so generation cost is out of the timings
    df = normal.unionByName(hot).repartition(32, SUBJECT_ID).persist()
    df.count()
    return df


def window_set(df):
    w = W.partitionBy(SUBJECT_ID)
    return (
        df.withColumn("__n", F.size(F.collect_set(TIME).over(w)))
        .filter(F.col("__n") >= MIN_EVENTS)
        .drop("__n")
    )


def window_rank(df):
    wo = W.partitionBy(SUBJECT_ID).orderBy(F.col(TIME).asc_nulls_first())
    w = W.partitionBy(SUBJECT_ID)
    has_null = F.max(F.when(F.col(TIME).isNull(), 1).otherwise(0)).over(w)
    return (
        df.withColumn("__rk", F.dense_rank().over(wo))
        .withColumn("__n", F.max("__rk").over(w) - has_null)
        .filter(F.col("__n") >= MIN_EVENTS)
        .drop("__rk", "__n")
    )


def groupby_semi(df):
    keep = (
        df.filter(F.col(TIME).isNotNull())
        .groupBy(SUBJECT_ID, TIME)
        .agg(F.lit(1))
        .groupBy(SUBJECT_ID)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= MIN_EVENTS)
        .select(SUBJECT_ID)
    )
    return df.join(keep, SUBJECT_ID, "left_semi")


def measure(fn, df) -> list[float]:
    out = []
    for _ in range(RUNS):
        t0 = time.time()
        fn(df).write.format("noop").mode("overwrite").save()
        out.append(time.time() - t0)
    return out


def main():
    hots = [int(a) for a in sys.argv[1:]] or [0, 30_000, 100_000, 1_000_000, 5_000_000]
    spark = get_spark("filter_subjects_skew")
    print(
        f"{'hot_events':>12} {'win_set_med':>12} {'win_rank_med':>13} {'groupby_med':>12}",
        flush=True,
    )
    for hot in hots:
        df = build(spark, hot)
        expect = df.count()  # every subject has >= MIN_EVENTS events
        rt = measure(window_rank, df)
        gt = measure(groupby_semi, df)
        st = measure(window_set, df) if hot <= SET_CAP else None
        kept_r = window_rank(df).count()
        kept_g = groupby_semi(df).count()
        assert kept_r == kept_g == expect, (kept_r, kept_g, expect)
        set_med = f"{statistics.median(st):.2f}" if st else "DNF"
        print(
            f"{hot:>12} {set_med:>12} {statistics.median(rt):>13.2f} "
            f"{statistics.median(gt):>12.2f}  raw_rank={[round(x,2) for x in rt]} "
            f"raw_grp={[round(x,2) for x in gt]}"
            + (f" raw_set={[round(x,2) for x in st]}" if st else ""),
            flush=True,
        )
        df.unpersist()


if __name__ == "__main__":
    main()
