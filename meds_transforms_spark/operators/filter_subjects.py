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
distinct-count uses ``size(collect_set(...))`` — bounded by the number
of distinct timestamps per subject, which is small relative to memory.
At extreme per-subject cardinality, swap to groupBy+semi-join; the
default windowed form avoids the extra shuffle of the join build side.
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
        # collect_set skips nulls — matches n_unique over non-null times
        # for event counting (static rows don't define events).
        df = (
            df.withColumn("__n_events", F.size(F.collect_set(TIME).over(w)))
            .filter(F.col("__n_events") >= int(min_events_per_subject))
            .drop("__n_events")
        )
    return df
