"""Interval-containment (range) join — bucketized equi-join rewrite.

Spark has no native range join. A raw ``p.ts BETWEEN i.start AND i.end``
condition executes as BroadcastNestedLoopJoin (right side must fit in
memory, O(|P|·|I|) comparisons) or, with an equi key, as a hash join
whose range residual re-scans every same-key pair — quadratic per key
when keys are few or skewed. The reference has no range join either
(SURVEY §2.3: equi-joins only); an event/training-data pipeline needs
one constantly ("all events inside each outage window / session /
study period").

The scale rewrite (the same binning idea behind Databricks' RANGE_JOIN
hint, re-expressed with public DataFrame ops): quantize time into
fixed-width bins. Each interval explodes to the bins it overlaps, each
point maps to exactly ONE bin, so the join becomes a hash equi-join on
``(keys…, bin)`` plus an exact containment filter — shuffle-parallel,
AQE-skew-splittable, no nested loop anywhere, and each qualifying pair
is produced exactly once (the point's single bin). Cost knobs: bin
width ≈ median interval span keeps the interval-side expansion at a
small constant (~2-3 rows per interval); points never expand.

Every op here is stateless (filter / bin projection / equi-join /
filter), so the points side may be a STREAMING DataFrame joined to a
static interval table — the streaming enrichment path — with no extra
code; pass ``bin_width_s`` explicitly then (the auto-probe collects).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage


def _micros(c: Column, dtype: str) -> Column:
    """Epoch-microsecond long for timestamp columns, pass-through cast
    for numeric ones — bins need only a consistent integer axis."""
    if dtype.startswith("timestamp"):
        return F.unix_micros(c)
    return c.cast("long")


@register_stage("interval_join")
def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    on: list[str] | str | None = None,
    bin_width_s: float | None = None,
    payload: list[str] | None = None,
    suffix: str = "_i",
    strategy: str = "bin",
    max_bins_per_interval: int = 10_000,
) -> DataFrame:
    """Inner join: every point row + every interval containing it.

    Containment is inclusive on both ends (SQL ``BETWEEN``). Intervals
    with null or inverted bounds (end < start) match nothing; points
    with null time match nothing.

    Parameters
    ----------
    on: optional equality key(s) joined in addition to containment.
    bin_width_s: bin width in seconds. Default (None) probes the median
        interval span with one tiny driver-side agg — an explicit width
        avoids that extra job and is the right call inside iterative or
        streaming plans.
    payload: interval columns to attach (default: all but the keys).
        Names colliding with point columns get ``suffix`` appended.
    strategy: ``"bin"`` (default) — the bucketized rewrite; right
        whenever the equi key is absent, coarse, or skewed, and never
        catastrophically wrong. ``"residual"`` — plain equi-join with
        the containment as a post-join filter; measurably cheaper (no
        interval explode, narrower shuffle key) when the equi key ALONE
        is already selective (e.g. ~100 points and ~2 intervals per
        key: 1.5 s vs 4.4 s at 10M×200k — scripts/scale_interval.py),
        but per-key cost is quadratic, so reserve it for keys you know
        are fine-grained.
    max_bins_per_interval: hard error (executor-side) if one interval
        would explode past this many bins — one garbage interval (a
        [1970, 2100] sentinel at 1 s bins is 4 billion rows) must fail
        fast, not OOM a stage. Raise the cap or widen the bins for
        genuinely long intervals.
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))

    if strategy == "residual":
        if not keys:
            raise ValueError("strategy='residual' requires equi keys (on=...)")
        pay = payload or [c for c in intervals.columns if c not in keys]
        p_cols = set(points.columns)
        renames = {c: (c + suffix if c in p_cols else c) for c in pay}
        iv_r = intervals.filter(
            F.col(start).isNotNull()
            & F.col(end).isNotNull()
            & (F.col(end) >= F.col(start))
        ).select(
            *[F.col(k) for k in keys],
            F.col(start).alias("__s"),
            F.col(end).alias("__e"),
            *[F.col(c).alias(renames[c]) for c in pay],
        )
        return (
            points.filter(F.col(point_time).isNotNull())
            .join(iv_r, keys)
            .filter(
                (F.col(point_time) >= F.col("__s"))
                & (F.col(point_time) <= F.col("__e"))
            )
            .drop("__s", "__e")
        )
    if strategy != "bin":
        raise ValueError(f"unknown strategy {strategy!r}")

    p_dt = dict(points.dtypes)[point_time]
    s_dt = dict(intervals.dtypes)[start]
    e_dt = dict(intervals.dtypes)[end]

    iv = intervals.filter(
        F.col(start).isNotNull()
        & F.col(end).isNotNull()
        & (F.col(end) >= F.col(start))
    )

    if bin_width_s is None:
        # One scalar probe of the median span — intervals are the small
        # side by construction; at scale callers pass the width.
        med = iv.agg(
            F.percentile_approx(
                _micros(F.col(end), e_dt) - _micros(F.col(start), s_dt), 0.5
            )
        ).collect()[0][0]
        width_us = max(int(med or 0), 1)
    else:
        # The bin axis is epoch-µs ONLY for timestamp columns; a
        # numeric axis passes through _micros in its native units, so
        # scaling the explicit width by 1e6 would make every bin 10^6×
        # too wide and collapse the equi-join into the per-key
        # quadratic blowup this operator exists to prevent.
        scale = 1_000_000 if s_dt.startswith("timestamp") else 1
        width_us = max(int(bin_width_s * scale), 1)

    pay = payload or [c for c in intervals.columns if c not in keys]
    p_cols = set(points.columns)
    renames = {c: (c + suffix if c in p_cols else c) for c in pay}

    iv_binned = iv.select(
        *[F.col(k) for k in keys],
        F.col(start).alias("__s"),
        F.col(end).alias("__e"),
        *[F.col(c).alias(renames[c]) for c in pay],
    ).withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(_micros(F.col("__s"), s_dt) / width_us),
                # assert_true short-circuits the stage on the first
                # over-wide interval instead of materializing its bins.
                F.when(
                    F.assert_true(
                        F.floor(_micros(F.col("__e"), e_dt) / width_us)
                        - F.floor(_micros(F.col("__s"), s_dt) / width_us)
                        < F.lit(max_bins_per_interval),
                        f"interval_join: an interval spans more than "
                        f"max_bins_per_interval={max_bins_per_interval} bins; "
                        f"widen bin_width_s or raise the cap",
                    ).isNull(),
                    F.floor(_micros(F.col("__e"), e_dt) / width_us),
                ),
            )
        ),
    )
    p_binned = points.filter(F.col(point_time).isNotNull()).withColumn(
        "__bin", F.floor(_micros(F.col(point_time), p_dt) / width_us)
    )

    joined = p_binned.join(iv_binned, [*keys, "__bin"]).filter(
        (F.col(point_time) >= F.col("__s")) & (F.col(point_time) <= F.col("__e"))
    )
    return joined.drop("__bin", "__s", "__e")
