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
    df: DataFrame,
    ordered_code_patterns: Sequence[str] = (),
    code_metadata: DataFrame | None = None,
) -> DataFrame:
    """Sort rows (subject, time, priority) and — critically — REWRITE
    ``__order`` to the new rank when present: physical row order alone
    does not survive the pipeline's write-time canonical_sort (which
    re-sorts ties by ``__order``) or any downstream shuffle, so without
    the rewrite the stage's entire effect silently vanished from
    written output.

    ``code_metadata`` (optional) reproduces the reference's exact
    missing-code placement: priorities derive from the METADATA code
    table and left-join onto the data, so a data code absent from the
    metadata gets a NULL priority and sorts FIRST
    (reorder_measurements.py:177-197, Polars nulls-first sort). Without
    it, priorities evaluate directly on the fact rows — identical
    whenever the data's codes all appear in the metadata."""
    from pyspark.sql import Window as W

    prio_expr = code_priority(list(ordered_code_patterns))
    if code_metadata is not None:
        idx = code_metadata.select(
            CODE, prio_expr.alias("__priority")
        ).dropDuplicates([CODE])
        out = df.join(F.broadcast(idx), CODE, "left")
        prio_order = F.col("__priority").asc_nulls_first()
    else:
        out = df.withColumn("__priority", prio_expr)
        prio_order = F.col("__priority").asc()
    sort_cols = [
        F.col(SUBJECT_ID),
        F.col(TIME).asc_nulls_first(),
        prio_order,
    ]
    if ORDER_KEY in df.columns:
        sort_cols.append(F.col(ORDER_KEY))
        w = W.partitionBy(SUBJECT_ID).orderBy(
            F.col(TIME).asc_nulls_first(), prio_order, F.col(ORDER_KEY)
        )
        out = out.withColumn(ORDER_KEY, F.row_number().over(w))
    return (
        out.repartition(SUBJECT_ID)
        .sortWithinPartitions(*sort_cols)
        .drop("__priority")
    )
