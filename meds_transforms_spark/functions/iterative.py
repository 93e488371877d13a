"""Lineage control for iterative DataFrame loops.

Any loop whose round plan references its own previous output more than
once needs BOTH of these per round:

1. lineage truncation (``localCheckpoint``) — else the logical plan
   grows ~k^rounds for k self-references and Catalyst analysis (or the
   plan string itself) kills the driver; and
2. a STATISTICS reset — ``Dataset.localCheckpoint`` carries the origin
   plan's size-in-bytes estimate onto the new LogicalRDD leaf, join
   estimates are the *product* of child sizes, so the carried number
   compounds ~k^round. The BigInteger becomes the workload: by round
   ~10 it has millions of digits and the driver spends minutes per
   round in SizeInBytesOnlyStatsPlanVisitor doing Toom-Cook BigInt
   multiplications — independent of data size (measured 425 s for
   round 11 on a 377-edge graph; see SCALING.md).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

_log = logging.getLogger(__name__)


def checkpoint_reset_stats(df: DataFrame, eager: bool = True) -> DataFrame:
    """localCheckpoint that also resets plan statistics.

    ``eager=False`` (round-10) defers materialization to the caller's
    next action over the frame — the right mode when a driver action
    (count/agg/collect) immediately follows, which then materializes
    the blocks AND computes its result in ONE job instead of a
    dedicated checkpoint job plus a read-back job. Blocks are pinned
    from that first action on, exactly like the eager form.

    Rebuilds the checkpointed frame from its JavaRDD[Row] (JVM-only —
    public ``Dataset.javaRDD`` + ``SparkSession.createDataFrame``
    overloads; rows never cross into Python), producing a leaf with the
    default size estimate so per-round stats arithmetic stays
    constant-size. Falls back (with a logged warning) to the plain
    checkpoint where the JVM handles are unavailable (Spark Connect).

    Side effect of the rebuild: the new ExternalRDD leaf reports
    ``spark.sql.defaultSizeInBytes`` (Long.MaxValue), so a frame that
    previously qualified for auto-broadcast will shuffle-join after
    passing through here — callers joining a known-small checkpointed
    frame should wrap it in ``F.broadcast`` explicitly (components.py
    does)."""
    ck = df.localCheckpoint(eager=bool(eager))
    try:
        spark = ck.sparkSession
        jdf = ck._jdf
        new_jdf = spark._jsparkSession.createDataFrame(jdf.javaRDD(), jdf.schema())
        return type(ck)(new_jdf, spark)
    except Exception:
        _log.warning(
            "checkpoint_reset_stats: JVM stats-reset rebuild failed; "
            "falling back to plain localCheckpoint. Iterative loops may "
            "hit the exponential plan-statistics blowup documented in "
            "this module's docstring.",
            exc_info=True,
        )
        return ck
