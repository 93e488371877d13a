"""As-of (nearest-event) join — a temporal primitive Spark lacks.

For every left row, attach the payload of the latest right row at or
before it (``direction="backward"``), or the earliest at or after it
(``"forward"``), within the same key group. The reference has no such
operator (its time-derived stages only window within one table), but a
training-data / event pipeline needs it constantly: "state of the
subject at observation time" without an O(n·m) range join.

Physical plan — the scale-defining choice: instead of a
non-equi range join (which Catalyst can only run as a broadcast
nested-loop or a cartesian-per-key), both sides are unioned into ONE
stream, shuffled ONCE on the key, sorted by (time, side), and the
payload is carried forward with ``last(ignorenulls=True)`` over a
running window. Cost is a single hash partitioning + in-partition sort
— the same plan shape as any per-subject window stage, so at 100 TB it
rides the exact partitioning already used by the MEDS chain (and is
exchange-free after subject bucketing). No per-key data expansion ever
happens, so skewed keys degrade no worse than any window op, and AQE
cannot mis-plan it into a nested loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage


@register_stage("asof_join")
def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_time: str = "time",
    right_time: str = "time",
    payload: list[str] | None = None,
    direction: str = "backward",
    strict: bool = False,
    tolerance: Column | None = None,
    suffix: str = "",
) -> DataFrame:
    """Left as-of join: every left row + nearest right payload.

    Parameters
    ----------
    on: equality key(s) — the shuffle key.
    payload: right columns to attach (default: all but key/time).
    direction: "backward" (latest right ≤ left) or "forward"
        (earliest right ≥ left).
    strict: exclude right rows at exactly the left time (< / >).
    tolerance: max |left_time - right_time| as a Column interval
        (e.g. ``F.expr("INTERVAL 7 DAYS")``); farther matches null out.
    suffix: appended to attached payload column names.

    Right-side ties at the same (key, time) are resolved to the row
    LAST in the right side's within-group sort — callers needing a
    deterministic winner should pre-aggregate the right side (the
    oracle queries do).
    """
    keys = [on] if isinstance(on, str) else list(on)
    pay = payload or [c for c in right.columns if c not in {*keys, right_time}]
    collisions = [c for c in pay if f"{c}{suffix}" in left.columns]
    if collisions:
        raise ValueError(
            f"asof_join: attached payload column(s) {collisions} collide "
            f"with left columns under suffix={suffix!r} — pass a suffix "
            "(e.g. '_r') or a narrower payload list"
        )

    # A right row with no time cannot be "as of" anything — unfiltered,
    # it sorts NULLS FIRST in the backward scan and becomes the match
    # for every left row that precedes all real right events.
    r = right.filter(F.col(right_time).isNotNull()).select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("__t"),
        F.struct(
            F.col(right_time).alias("__rt"), *[F.col(c) for c in pay]
        ).alias("__p"),
        F.lit(0).alias("__side"),
    )
    l = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_time).alias("__t"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        F.lit(1).alias("__side"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # Sort so that, scanning the frame up to the current row, the
    # nearest eligible right row is the last non-null payload seen.
    # backward + inclusive: right rows sort BEFORE left at equal time
    # (side 0 < 1); strict flips the tie order so equal-time right rows
    # land after the left row and are not visible to it.
    if direction == "backward":
        order = [F.col("__t").asc(), F.col("__side").asc() if not strict else F.col("__side").desc()]
    elif direction == "forward":
        order = [F.col("__t").desc(), F.col("__side").asc() if not strict else F.col("__side").desc()]
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    w = (
        W.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = (
        u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        # A left row with no time has no "as of" point: in the forward
        # scan (desc, NULLS LAST) it would otherwise pick up the
        # minimum-time right row. NULL match, row preserved.
        .withColumn("__m", F.when(F.col("__t").isNotNull(), F.col("__m")))
    )

    if tolerance is not None:
        gap_ok = (F.col("__m.__rt") >= F.col("__t") - tolerance) & (
            F.col("__m.__rt") <= F.col("__t") + tolerance
        )
        matched = matched.withColumn("__m", F.when(gap_ok, F.col("__m")))

    out = matched.select(
        *[F.col(c) for c in left.columns],
        F.col("__m.__rt").alias(f"{right_time}{suffix or '_matched'}"),
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in pay],
    )
    return out
