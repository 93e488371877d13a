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

from pyspark.sql import DataFrame


def checkpoint_reset_stats(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint that also resets plan statistics.

    Rebuilds the checkpointed frame from its JavaRDD[Row] (JVM-only —
    public ``Dataset.javaRDD`` + ``SparkSession.createDataFrame``
    overloads; rows never cross into Python), producing a leaf with the
    default size estimate so per-round stats arithmetic stays
    constant-size. Falls back to the plain checkpoint where the JVM
    handles are unavailable (Spark Connect)."""
    ck = df.localCheckpoint(eager=True)
    try:
        spark = ck.sparkSession
        jdf = ck._jdf
        new_jdf = spark._jsparkSession.createDataFrame(jdf.javaRDD(), jdf.schema())
        return type(ck)(new_jdf, spark)
    except Exception:
        return ck
