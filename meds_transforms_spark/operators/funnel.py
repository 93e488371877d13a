"""Funnel analysis — ordered event-sequence matching per entity.

The classic product-analytics operator (view → click → purchase): for
each entity, find the earliest time each step can complete given that
it must come strictly after the previous step's completion (greedy
earliest-match, the standard funnel semantics), and report the furthest
stage reached. The reference has no counterpart; this extends the
relational suite alongside sessionization and as-of joins.

Two physical strategies, selected by ``strategy`` (both produce
identical results — tested):

- ``"agg_join"`` (default): step k is a full hash aggregation of the
  fact table with map-side partial combine — the shuffle carries one
  partial row per (entity, partition), never the events — and the
  accumulated per-entity step table (|entities| rows) broadcast-joins
  back into the next scan. k scans, ZERO full-data shuffles, no sort.
  Single-node at 10M events / 100k users the two strategies tie
  (~2 s warm — SCALING.md); the advantage is structural: at cluster
  scale k cheap rescans replace one full-data shuffle+sort. Right
  whenever the entity dimension fits broadcast (≲ tens of millions
  of entities).
- ``"window"``: the k dependent step minimums chain as k unordered
  Window operators sharing ONE hash exchange on the entity key.
  One full-data shuffle + sort, but no broadcast requirement — the
  scale path when entities are too many to broadcast (billions of
  users), where agg_join's join-back would itself become a full-data
  shuffle join per step.

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
    strategy: str = "agg_join",
) -> DataFrame:
    """Per-entity funnel: one row per entity with ``step_1..step_k``
    completion timestamps (NULL once the funnel stalls) and
    ``funnel_stage`` = number of completed steps.

    Earliest-match semantics: step 1 completes at the entity's earliest
    ``steps[0]`` event; step k at the earliest ``steps[k-1]`` event
    strictly after step k-1's completion (and within the ``within``
    horizon of step 1, when given). See the module docstring for the
    two physical strategies.
    """
    if not steps:
        raise ValueError("steps must be a non-empty sequence of event values")
    if strategy not in ("agg_join", "window"):
        raise ValueError(f"strategy must be 'agg_join' or 'window', got {strategy!r}")

    def step_cond(step: str, prev_t, first_t):
        cond = F.col(event_col) == step
        if prev_t is not None:
            cond = cond & (F.col(ts_col) > prev_t)
            if within is not None:
                # make_interval, not an f-string INTERVAL literal:
                # repr(float) uses scientific notation for <1e-4 and
                # >=1e16, which the interval parser rejects
                horizon = first_t + F.make_interval(secs=F.lit(float(within)))
                cond = cond & (F.col(ts_col) <= horizon)
        return cond

    step_cols = [f"step_{i}" for i in range(1, len(steps) + 1)]

    if strategy == "agg_join":
        cur = None
        for i, step in enumerate(steps, start=1):
            if cur is None:
                src = df
                prev_t = first_t = None
            else:
                src = df.join(F.broadcast(cur), entity_col, "inner")
                prev_t = F.col(step_cols[i - 2])
                first_t = F.col(step_cols[0])
            t = F.min(F.when(step_cond(step, prev_t, first_t), F.col(ts_col)))
            carried = [F.first(c).alias(c) for c in step_cols[: i - 1]]
            cur = src.groupBy(entity_col).agg(*carried, t.alias(step_cols[i - 1]))
        out = cur
        stage = sum(
            (F.col(c).isNotNull().cast("int") for c in step_cols), F.lit(0)
        )
        return out.select(entity_col, *step_cols, stage.alias("funnel_stage"))

    per_entity = W.partitionBy(entity_col)
    out = df
    prev_t = None
    first_t = None
    for i, step in enumerate(steps, start=1):
        t = F.min(F.when(step_cond(step, prev_t, first_t), F.col(ts_col))).over(
            per_entity
        )
        out = out.withColumn(f"step_{i}", t)
        prev_t = F.col(f"step_{i}")
        if first_t is None:
            first_t = prev_t
    stage = sum(
        (F.max(c).isNotNull().cast("int") for c in step_cols),
        F.lit(0),
    )
    return out.groupBy(entity_col).agg(
        *[F.max(c).alias(c) for c in step_cols],
        stage.alias("funnel_stage"),
    )
