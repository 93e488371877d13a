"""filter_subjects — drop subjects below measurement/event thresholds.

Reference semantics (src/MEDS_transforms/stages/filter_subjects/
filter_subjects.py:90,201):

- ``min_measurements_per_subject``: keep subjects with ≥ N rows having a
  non-null ``time`` (windowed count).
- ``min_events_per_subject``: keep subjects with ≥ N *unique* non-null
  timestamps (windowed distinct count).

Spark plan: window aggregates partitioned by ``subject_id``. Because the
event table is subject-partitioned at ingest, both windows are
shuffle-free after one exchange (and AQE coalesces it); no join, no
second scan. ``countDistinct`` is not allowed over a window, so the
distinct-count is ``max(dense_rank() over (subject order by time))``
minus a null adjustment: the rank streams in O(n log n) per subject and
each row's window output is a LONG.

Do NOT use ``size(collect_set(time)).over(w)`` here: WindowExec
evaluates the aggregate's output per ROW and collect_set's eval copies
the whole accumulated set into a fresh array each time — O(n²) element
copies inside the hot subject's single task. Measured
(scripts/measure_filter_subjects_skew.py, local[32], 1M normal rows +
one hot subject): 0.17 s with no hot subject → 29 s at 100k hot events
→ did-not-finish (>1 h/run) at 1M, while the dense_rank form stays
0.2–2 s from 0 to 5M hot events and the groupBy+semi-join alternative
(fully distributed partials, two more shuffles) tracks within 2×.
``tests/test_plan_guards.py`` pins the choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage
from meds_transforms_spark.schema import SUBJECT_ID, TIME


@register_stage("filter_subjects")
def filter_subjects(
    df: DataFrame,
    min_events_per_subject: int | None = None,
    min_measurements_per_subject: int | None = None,
) -> DataFrame:
    w = W.partitionBy(SUBJECT_ID)
    if min_measurements_per_subject:
        # count(TIME) skips nulls — matches pl.col("time").count().
        df = (
            df.withColumn("__n_meas", F.count(TIME).over(w))
            .filter(F.col("__n_meas") >= int(min_measurements_per_subject))
            .drop("__n_meas")
        )
    if min_events_per_subject:
        # Distinct times per subject via streaming dense_rank — see
        # module docstring for why NOT collect_set. Polars
        # ``n_unique()`` counts a NULL time as ONE distinct value (the
        # reference doctest keeps subject 4 with times
        # [None, None, 1, 2, 3] at min=4 — filter_subjects.py:170-180),
        # and dense_rank with NULLs first matches exactly: all NULL
        # rows share rank 1, so max(rank) == n_unique-including-null.
        # The max() frame is unbounded over the same partitioning, so
        # the whole computation is ONE exchange + one in-task sort.
        wo = W.partitionBy(SUBJECT_ID).orderBy(F.col(TIME).asc_nulls_first())
        df = (
            df.withColumn("__rk", F.dense_rank().over(wo))
            .withColumn("__n_events", F.max("__rk").over(w))
            .filter(F.col("__n_events") >= int(min_events_per_subject))
            .drop("__rk", "__n_events")
        )
    return df
