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
swaps in only after Spark's commit protocol wrote its _SUCCESS and the
row-count audit passed — a crash mid-compaction leaves the original
intact. The publish itself is TWO renames (original → ``._compact_old``,
temp → original), not one atomic op: a crash between them leaves the
dataset path momentarily absent. Every entry point first runs
:func:`recover_compaction`, which rolls such a crash forward or back
deterministically (the old dir is the recovery journal), and
``retain_old=True`` keeps ``._compact_old`` around after a successful
publish for out-of-band verification.
"""

from __future__ import annotations

import math
import os
import shutil
import time

from pyspark.sql import SparkSession


def _walk_stats(path: str) -> dict:
    """ONE footer/listing pass: totals plus the per-leaf-directory row
    map (relative dir chain → rows). Every consumer shares this single
    walk — at 10k tiny files the footer reads ARE the driver-side cost,
    so the module never walks a tree twice for two views of it."""
    import pyarrow.parquet as pq

    files = rows = nbytes = 0
    leaf_rows: dict[str, int] = {}
    root_dir = path.rstrip("/")
    for root, _dirs, fnames in os.walk(root_dir):
        d_rows = 0
        for fname in fnames:
            if not fname.endswith(".parquet"):
                continue
            fp = os.path.join(root, fname)
            files += 1
            n = pq.ParquetFile(fp).metadata.num_rows
            d_rows += n
            nbytes += os.path.getsize(fp)
        rows += d_rows
        if d_rows and root != root_dir:
            chain = os.path.relpath(root, root_dir)
            leaf_rows[chain] = leaf_rows.get(chain, 0) + d_rows
    return {"files": files, "rows": rows, "bytes": nbytes, "leaf_rows": leaf_rows}


def dir_stats(path: str) -> dict:
    """(files, rows, bytes) from footers/listing — no Spark job.

    Walks subdirectories, so hive-partitioned layouts (e.g.
    ``partitionBy("split")`` or lang/quality_bucket corpus shards)
    report their true totals instead of a silent 0."""
    s = _walk_stats(path)
    return {"files": s["files"], "rows": s["rows"], "bytes": s["bytes"]}


#: ``._compact_tmp`` younger than this is assumed in-flight and left
#: alone by :func:`recover_compaction` (mtime refreshes as the rewrite
#: streams files in, so an active job's tmp always looks fresh).
TMP_GRACE_SECONDS = 3600.0


def recover_compaction(path: str, tmp_grace_seconds: float = TMP_GRACE_SECONDS) -> str | None:
    """Roll a crashed publish forward or back; returns the action taken.

    SINGLE-WRITER ASSUMPTION: compaction of a given ``path`` must have
    at most one writer at a time — this module journals with renames,
    not locks. Recovery is fail-safe against a *concurrent* writer in
    one way only: a ``._compact_tmp`` whose mtime is within
    ``tmp_grace_seconds`` is treated as in-flight and kept. A retained
    ``._compact_old`` backup (``retain_old=True``) is dropped by the
    next recovery once the dataset itself is present — finish any
    out-of-band verification before re-entering compaction.

    The two-rename publish has one non-atomic window; ``._compact_old``
    doubles as its journal:

    - old present, dataset ABSENT → crashed between the renames: roll
      BACK (restore the original; the temp rewrite, if still present,
      is discarded).
    - old present, dataset present → crashed after the swap (or
      ``retain_old`` leftover): the publish completed; drop the old.
    - ``._compact_tmp`` older than the grace window → stale crash
      debris: drop it.
    """
    old = path.rstrip("/") + "._compact_old"
    tmp = path.rstrip("/") + "._compact_tmp"
    action = None
    if os.path.exists(old):
        if os.path.exists(path):
            shutil.rmtree(old)
            action = "dropped_old"
        else:
            os.rename(old, path)
            action = "rolled_back"
    if os.path.exists(tmp) and action == "rolled_back":
        # The roll-back journal (old present, dataset absent) proves
        # the tmp's writer died MID-PUBLISH — it had already finished
        # writing tmp (the path→old rename happens after). Under the
        # single-writer assumption the tmp cannot belong to a live
        # writer, so drop it now instead of stalling every retry for
        # the full grace window behind "tmp_in_flight".
        shutil.rmtree(tmp, ignore_errors=True)
    elif os.path.exists(tmp):
        # A file vanishing between the os.walk listing and its stat
        # means a live writer just renamed/committed it — exactly the
        # in-flight case the grace window protects. Treat it as fresh
        # activity (mtime = now) instead of crashing recovery.
        def _mtime(p: str) -> float:
            try:
                return os.path.getmtime(p)
            except OSError:
                return time.time()

        newest = max(
            (_mtime(os.path.join(r, f)) for r, _d, fs in os.walk(tmp) for f in fs),
            default=_mtime(tmp),
        )
        if time.time() - newest >= tmp_grace_seconds:
            shutil.rmtree(tmp, ignore_errors=True)
            action = action or "dropped_tmp"
        else:
            action = action or "kept_tmp_in_flight"
    return action


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_mb: int = 256,
    sort_cols: list[str] | None = None,
    min_files: int = 2,
    retain_old: bool = False,
) -> dict:
    """Rewrite ``path`` into ``ceil(bytes / target_mb)`` files.

    Returns a before/after report. No-op (and says so) when the
    directory already has at most ``min_files`` files or fewer files
    than the target — compaction must never make MORE files.

    With ``sort_cols`` the rewrite is range-partitioned + locally
    sorted on them, preserving (or establishing) the clustered layout
    parquet min/max pruning feeds on; without, a plain coalesce-style
    repartition balances bytes.

    Hive-partitioned directories keep their layout: partition columns
    are detected from the ``name=value`` directory chain and the
    rewrite is ``partitionBy`` the same columns, pre-shuffled on them
    so each partition value lands in one task (one output file per
    value). Pass ``retain_old=True`` to keep the pre-compaction data in
    ``._compact_old`` until the next run verifies and drops it.
    """
    # Recovery drops stale tmp debris; a ``._compact_tmp`` that
    # SURVIVES it is within the grace window, i.e. another compaction
    # of this path may still be streaming into it — overwriting it
    # here would clobber a live writer's output mid-publish. Refuse
    # and report instead; the caller retries after the grace window
    # (or after confirming single-writer ownership).
    recover_compaction(path)
    if os.path.exists(path.rstrip("/") + "._compact_tmp"):
        return {
            "before": dir_stats(path),
            "after": None,
            "compacted": False,
            "skipped": "tmp_in_flight",
        }
    stats = _walk_stats(path)
    before = {"files": stats["files"], "rows": stats["rows"], "bytes": stats["bytes"]}
    n_target = max(1, math.ceil(before["bytes"] / (target_mb * 1024 * 1024)))
    if before["files"] <= max(min_files, n_target):
        return {"before": before, "after": before, "compacted": False}

    df = spark.read.parquet(path)
    pcols = _partition_cols(path)
    if sort_cols:
        out = df.repartitionByRange(
            n_target, *pcols, *sort_cols
        ).sortWithinPartitions(*pcols, *sort_cols)
    elif pcols:
        # Hashing by pcols alone puts each partition VALUE in one task:
        # a hot value (one language holding most of the corpus) becomes
        # one giant file and one straggler/OOM task, and target_mb is
        # ignored. Salt each value proportionally to its row share of
        # n_target instead — file count stays ≈ n_target and hot values
        # split across tasks. Per-value row counts come from the
        # parquet FOOTERS already walked (no extra data pass — the
        # module contract), and each row finds its value's split count
        # through its SOURCE FILE PATH (input_file_name contains the
        # name=value dir chain) — no typed join, so NULL partition
        # values (__HIVE_DEFAULT_PARTITION__ dirs) and exotic value
        # types cannot fall out of an equi-join.
        from pyspark.sql import functions as F

        value_rows = _partition_value_rows(stats["leaf_rows"])
        total = sum(value_rows.values()) or 1
        # input_file_name() is a URI (file:/..., percent-encoded) while
        # the chain is the raw on-disk dir name from os.walk — decode
        # the URI once so values with spaces/%/unicode still match and
        # keep their salt (an unmatched row silently falls back to
        # splits=1, quietly disabling the skew mitigation). url_decode
        # is java URLDecoder, which also maps '+' to space — pre-escape
        # literal '+' (never a URI encoding artifact in a path) first.
        fname = F.url_decode(
            F.replace(F.input_file_name(), F.lit("+"), F.lit("%2B"))
        )
        splits_col = F.lit(1)
        for chain, rows in value_rows.items():
            n_splits = max(1, round(rows / total * n_target))
            splits_col = F.when(
                fname.contains("/" + chain + "/"), F.lit(n_splits)
            ).otherwise(splits_col)
        # Salt source: hash the ORDERABLE/HASHABLE columns only — a
        # MapType column makes xxhash64 fail analysis, and hashing a
        # wide text/blob column per row buys no extra dispersion worth
        # its cost for a salt in [0, n_splits). Fall back to the input
        # partition id (varies within a hot value, deterministic given
        # the input layout) if nothing is hashable.
        from pyspark.sql.types import MapType

        hashable = [
            F.col(c)
            for c in df.columns
            if not isinstance(df.schema[c].dataType, MapType)
        ]
        entropy = F.xxhash64(*hashable) if hashable else F.spark_partition_id()
        salt = F.pmod(entropy, splits_col)
        out = (
            df.withColumn("__salt", salt)
            .repartition(n_target, *pcols, "__salt")
            .drop("__salt")
        )
    else:
        out = df.repartition(n_target)
    tmp = path.rstrip("/") + "._compact_tmp"
    writer = out.write.mode("overwrite")
    if pcols:
        writer = writer.partitionBy(*pcols)
    writer.parquet(tmp)
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
    if not retain_old:
        shutil.rmtree(old)
    return {"before": before, "after": after, "compacted": True}


def _partition_value_rows(leaf_rows: dict[str, int]) -> dict[str, int]:
    """Row count per hive partition value from a :func:`_walk_stats`
    leaf map: keeps the ``name=value[/name=value…]`` chains. Bounded by
    partition cardinality; zero Spark jobs, zero extra walks."""
    return {chain: rows for chain, rows in leaf_rows.items() if "=" in chain}


def _partition_cols(path: str) -> list[str]:
    """Hive partition columns from the ``name=value`` directory chain
    (empty list for a flat directory)."""
    cols: list[str] = []
    p = path
    while True:
        try:
            subs = sorted(
                d
                for d in os.listdir(p)
                if "=" in d and os.path.isdir(os.path.join(p, d))
            )
        except FileNotFoundError:
            break
        if not subs:
            break
        cols.append(subs[0].split("=", 1)[0])
        p = os.path.join(p, subs[0])
    return cols
