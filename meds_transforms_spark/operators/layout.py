"""Z-order (Morton) layout for multi-dimensional data skipping.

At 100 TB the cheapest query is the one that never reads the file:
parquet footers carry per-column min/max, and Spark prunes files and
row groups whose ranges can't match the predicate. Sorting by ONE
column gives perfect pruning on that column and none on any other;
interleaving the bits of SEVERAL columns (the classic Z-order / Morton
curve, as popularized by Delta Lake's ``OPTIMIZE ZORDER BY``) makes
files tight in EVERY participating dimension at once, so selective
filters on any of them skip most of the corpus.

Everything here is pure codegen arithmetic — the key is a closed-form
expression over the row, the only non-projection work is one tiny
min/max aggregate per dimension (broadcast back as a lazy 1-row cross
join) and the final range repartition + in-partition sort that any
layout rewrite needs anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage


@register_stage("zorder_key")
def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    key_col: str = "zkey",
) -> DataFrame:
    """Attach a Morton key interleaving ``bits`` bits of each column.

    Each dimension is min/max-normalized into ``[0, 2**bits)`` using a
    single tiny aggregate over the frame (no window, no collect — the
    1-row min/max frame rides back as a lazy broadcast cross join, the
    same pattern as dsir/unigram totals). Bit ``j`` of dimension ``d``
    lands at position ``j * n_dims + (n_dims - 1 - d)``, so the high
    bits of every dimension dominate the key equally.

    Timestamp columns are interleaved on their epoch-microsecond value;
    a constant column (min == max) contributes zero bits, degrading
    gracefully to a lower-dimensional curve. ``n_dims * bits`` must fit
    in 63 bits.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed 64-bit key")

    def num(name: str) -> Column:
        c = F.col(name)
        dt = dict(df.dtypes)[name]
        if dt.startswith("timestamp"):
            return c.cast("double") * 1e6
        return c.cast("double")

    aggs = []
    for d, name in enumerate(cols):
        aggs += [
            F.min(num(name)).alias(f"__min{d}"),
            F.max(num(name)).alias(f"__max{d}"),
        ]
    ranges = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(ranges))
    top = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for d, name in enumerate(cols):
        lo, hi = F.col(f"__min{d}"), F.col(f"__max{d}")
        span = hi - lo
        # floor to int bucket in [0, top]; constant dim → bucket 0
        bucket = F.when(span > 0, F.floor((num(name) - lo) / span * top)).otherwise(
            F.lit(0)
        ).cast("long")
        # NULL dimension values (NULL bucket after the arithmetic) map
        # to bucket 0, not a NULL key — a NULL Morton key would opt the
        # row out of the layout entirely and poison the OR-fold
        bucket = F.coalesce(F.least(F.greatest(bucket, F.lit(0)), F.lit(top)), F.lit(0))
        for j in range(bits):
            bit = F.shiftright(bucket, j).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, j * n + (n - 1 - d)))
    out = out.withColumn(key_col, key)
    return out.drop(*[f"__{m}{d}" for d in range(n) for m in ("min", "max")])


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Rewrite ``df`` as Z-ordered parquet: Morton key → range
    repartition (equal-size output files via sampled range boundaries,
    AQE-coalesced) → sort within partitions → drop the key → write.

    After this, a selective filter on ANY of ``cols`` prunes most
    files/row-groups from the footer stats alone — the layout analog of
    a multi-column index, with zero read-path machinery.
    """
    keyed = zorder_key(df, cols, bits=bits)
    part = keyed.repartitionByRange(num_files, "zkey") if num_files else keyed.repartitionByRange("zkey")
    part.sortWithinPartitions("zkey").drop("zkey").write.mode("overwrite").parquet(path)
