"""reorder_measurements — custom intra-event measurement ordering.

Reference semantics (src/MEDS_transforms/stages/reorder_measurements/
reorder_measurements.py:177-197): each code gets a priority = index of
the first regex in ``ordered_code_patterns`` it matches (codes matching
nothing sort last); rows are re-sorted (subject, time, priority) stably.

Spark plan: the when-chain priority is a pure projection (codegen);
the sort is expressed per-partition after subject repartitioning —
``repartition(subject_id).sortWithinPartitions`` — so reordering a
100 TB table costs exactly one shuffle (and zero if the table is
already subject-partitioned). Stability is materialized via the
__order tiebreak (see schema.ORDER_KEY).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage
from meds_transforms_spark.schema import CODE, ORDER_KEY, SUBJECT_ID, TIME


def code_priority(ordered_code_patterns: Sequence[str]):
    """Priority column: index of first matching pattern, else len(patterns)."""
    n = len(ordered_code_patterns)
    expr = None
    for i, pat in enumerate(ordered_code_patterns):
        cond = F.col(CODE).rlike(pat)
        expr = F.when(cond, F.lit(i)) if expr is None else expr.when(cond, F.lit(i))
    return F.lit(n) if expr is None else expr.otherwise(F.lit(n))


@register_stage("reorder_measurements")
def reorder_measurements(
    df: DataFrame, ordered_code_patterns: Sequence[str] = ()
) -> DataFrame:
    prio = code_priority(list(ordered_code_patterns))
    sort_cols = [
        F.col(SUBJECT_ID),
        F.col(TIME).asc_nulls_first(),
        F.col("__priority"),
    ]
    if ORDER_KEY in df.columns:
        sort_cols.append(F.col(ORDER_KEY))
    return (
        df.withColumn("__priority", prio)
        .repartition(SUBJECT_ID)
        .sortWithinPartitions(*sort_cols)
        .drop("__priority")
    )
