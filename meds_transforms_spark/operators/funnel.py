"""Funnel analysis — ordered event-sequence matching per entity.

The classic product-analytics operator (view → click → purchase): for
each entity, find the earliest time each step can complete given that
it must come strictly after the previous step's completion (greedy
earliest-match, the standard funnel semantics), and report the furthest
stage reached. The reference has no counterpart; this extends the
relational suite alongside sessionization and as-of joins.

Plan shape at 100 TB: ONE exchange. Step k's completion time depends on
step k-1's, so the steps chain as k consecutive Window operators over
the same ``partitionBy(entity)`` — Catalyst inserts a single hash
exchange for the first and the rest reuse its partitioning (no sort is
required; each window is an unordered MIN over the full partition).
The final per-entity reduction is a groupBy on the already-partitioned
key. Heavy entities spread by AQE skew handling inside the window
exchange like any other keyed op.

``within`` bounds the whole funnel: later steps only count inside
``[t1, t1 + within]`` seconds of the first step's completion.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from meds_transforms_spark.operators.base import register_stage


@register_stage("funnel_steps")
def funnel_steps(
    df: DataFrame,
    steps: Sequence[str],
    entity_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    within: float | None = None,
) -> DataFrame:
    """Per-entity funnel: one row per entity with ``step_1..step_k``
    completion timestamps (NULL once the funnel stalls) and
    ``funnel_stage`` = number of completed steps.

    Earliest-match semantics: step 1 completes at the entity's earliest
    ``steps[0]`` event; step k at the earliest ``steps[k-1]`` event
    strictly after step k-1's completion (and within the ``within``
    horizon of step 1, when given).
    """
    if not steps:
        raise ValueError("steps must be a non-empty sequence of event values")
    per_entity = W.partitionBy(entity_col)
    out = df
    prev_t = None
    first_t = None
    for i, step in enumerate(steps, start=1):
        cond = F.col(event_col) == step
        if prev_t is not None:
            cond = cond & (F.col(ts_col) > prev_t)
            if within is not None:
                horizon = first_t + F.expr(f"INTERVAL {float(within)} SECONDS")
                cond = cond & (F.col(ts_col) <= horizon)
        t = F.min(F.when(cond, F.col(ts_col))).over(per_entity)
        out = out.withColumn(f"step_{i}", t)
        prev_t = F.col(f"step_{i}")
        if first_t is None:
            first_t = prev_t
    step_cols = [f"step_{i}" for i in range(1, len(steps) + 1)]
    stage = sum(
        (F.max(c).isNotNull().cast("int") for c in step_cols),
        F.lit(0),
    )
    return out.groupBy(entity_col).agg(
        *[F.max(c).alias(c) for c in step_cols],
        stage.alias("funnel_stage"),
    )
