"""Cohort retention — the classic event-analytics rollup.

Users are grouped into cohorts by the period of their first activity;
retention is how many distinct cohort members are active again N
periods later. Output is the (cohort, offset) retention matrix plus
the rate against the cohort's own size.

Plan shape (scale-first): first activity is a window-min over the user
partition — ONE shuffle on user_id, no self-join; (user, cohort,
offset) is then deduplicated with a groupBy (map-side combined) and
rolled up. The rate divides by the offset-0 cell via a per-cohort
window over the tiny matrix (#cohorts × #offsets rows), never touching
event rows again. No driver materialization anywhere.

The reference engine has no event-analytics plane (SURVEY §2); this
extends the events suite (funnel.py, rolling.py, interval.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage

_PERIODS = ("day", "week", "month")


@register_stage("cohort_retention")
def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    max_offset: int | None = None,
) -> DataFrame:
    """Retention matrix: ``(cohort, offset, n_users, retention_rate)``.

    ``cohort`` is the ``period``-truncated first-activity date;
    ``offset`` counts whole periods between an event's period and the
    cohort (offset 0 = the cohort period itself, so its rate is 1.0 by
    construction). ``max_offset`` truncates the matrix tail. Integer
    period arithmetic only — week offsets divide a day difference of
    week-truncated dates, month offsets use (year, month) deltas — so
    results are engine-exact.
    """
    if period not in _PERIODS:
        raise ValueError(f"period must be one of {_PERIODS}, got {period!r}")
    ts = F.col(ts_col)
    first_ts = F.min(ts).over(W.partitionBy(user_col))
    cohort = F.date_trunc(period, first_ts)
    ev_p = F.date_trunc(period, ts)
    if period == "day":
        offset = F.datediff(ev_p, cohort)
    elif period == "week":
        offset = (F.datediff(ev_p, cohort) / 7).cast("long")
    else:
        offset = (F.year(ev_p) - F.year(cohort)) * 12 + (
            F.month(ev_p) - F.month(cohort)
        )
    cells = (
        df.select(
            F.col(user_col).alias("__u"),
            cohort.cast("date").alias("cohort"),
            offset.cast("long").alias("offset"),
        )
        # NULL offsets (NULL-ts events) must drop unconditionally: they
        # sort NULLS-FIRST in the base window below, so one stray
        # NULL-ts event would replace the offset-0 cohort size as every
        # rate's denominator (rates > 1).
        .filter(F.col("offset").isNotNull())
        .filter(F.col("offset") <= max_offset if max_offset is not None else F.lit(True))
        .groupBy("cohort", "offset", "__u")
        .agg(F.lit(1))
        .groupBy("cohort", "offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    base = F.first("n_users").over(
        W.partitionBy("cohort").orderBy("offset")
    )
    return cells.withColumn(
        "retention_rate", F.col("n_users") / base
    )


@register_stage("event_transitions")
def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order journey transition matrix: ``(from_type, to_type,
    n)`` over consecutive events per user — the Sankey/Markov-chain
    rollup of product analytics.

    One shuffle on the user partition for the lag window, then a
    map-side-combined count on the (from, to) pair — the matrix is
    |types|² rows regardless of event volume. Ties in ``ts_col``
    order deterministically only with a ``tiebreak_col``.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = W.partitionBy(user_col).orderBy(*order)
    return (
        df.withColumn("__prev", F.lag(type_col).over(w))
        .filter(F.col("__prev").isNotNull())
        .groupBy(F.col("__prev").alias("from_type"), F.col(type_col).alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
