"""Small-files compaction for parquet directories.

The classic large-deployment maintenance task: incremental ingest (a
streaming sink, per-batch appends, many small pipeline runs) leaves a
directory with thousands of tiny parquet files, and every downstream
scan pays per-file open/footer/scheduling overhead — at 100 TB the
NameNode/listing cost alone matters. ``compact_parquet`` rewrites a
directory to approximately ``target_mb``-sized files, optionally
re-sorting (so a Z-ordered or canonically-sorted layout survives
compaction), using only parquet footer metadata to size the job —
no data pass beyond the single rewrite itself.

Write-audit-publish: the rewrite lands in a sibling temp dir first and
swaps in atomically (rename) only after Spark's commit protocol wrote
its _SUCCESS — a crash mid-compaction leaves the original intact.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def dir_stats(path: str) -> dict:
    """(files, rows, bytes) from footers/listing — no Spark job."""
    import pyarrow.parquet as pq

    files = rows = nbytes = 0
    for fname in os.listdir(path):
        if not fname.endswith(".parquet"):
            continue
        fp = os.path.join(path, fname)
        files += 1
        rows += pq.ParquetFile(fp).metadata.num_rows
        nbytes += os.path.getsize(fp)
    return {"files": files, "rows": rows, "bytes": nbytes}


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_mb: int = 256,
    sort_cols: list[str] | None = None,
    min_files: int = 2,
) -> dict:
    """Rewrite ``path`` into ``ceil(bytes / target_mb)`` files.

    Returns a before/after report. No-op (and says so) when the
    directory already has at most ``min_files`` files or fewer files
    than the target — compaction must never make MORE files.

    With ``sort_cols`` the rewrite is range-partitioned + locally
    sorted on them, preserving (or establishing) the clustered layout
    parquet min/max pruning feeds on; without, a plain coalesce-style
    repartition balances bytes.
    """
    before = dir_stats(path)
    n_target = max(1, math.ceil(before["bytes"] / (target_mb * 1024 * 1024)))
    if before["files"] <= max(min_files, n_target):
        return {"before": before, "after": before, "compacted": False}

    df = spark.read.parquet(path)
    if sort_cols:
        out = df.repartitionByRange(n_target, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_target)
    tmp = path.rstrip("/") + "._compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    if not os.path.exists(os.path.join(tmp, "_SUCCESS")):
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(f"compaction write to {tmp} did not commit")
    # AUDIT BEFORE PUBLISH: verify the rewrite carries every row while
    # the original is still in place — a mismatch must leave the source
    # untouched, not discover the loss after the swap
    after = dir_stats(tmp)
    if after["rows"] != before["rows"]:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row-count mismatch: {before['rows']} -> {after['rows']}"
        )
    old = path.rstrip("/") + "._compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {"before": before, "after": after, "compacted": True}
