"""Tests for parquet small-files compaction (sources/compaction)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from meds_transforms_spark.sources.compaction import compact_parquet, dir_stats


def test_compacts_many_small_files(spark, tmp_path):
    path = str(tmp_path / "d")
    spark.range(50_000).select(
        "id", (F.col("id") % 97).cast("double").alias("v")
    ).repartition(40).write.parquet(path)
    assert dir_stats(path)["files"] == 40
    report = compact_parquet(spark, path, target_mb=256)
    assert report["compacted"]
    assert report["after"]["files"] < 40
    assert report["after"]["rows"] == report["before"]["rows"] == 50_000
    # data intact
    got = spark.read.parquet(path)
    assert got.count() == 50_000
    assert got.agg(F.sum("id")).first()[0] == 50_000 * 49_999 // 2
    # no temp/old residue
    assert not glob.glob(str(tmp_path / "d._compact_*"))


def test_sorted_compaction_establishes_clustered_layout(spark, tmp_path):
    import pyarrow.parquet as pq

    path = str(tmp_path / "s")
    spark.range(40_000).select(
        (F.col("id") % 1000).alias("k"), "id"
    ).repartition(20).write.parquet(path)
    # force a multi-file target so per-file ranges are meaningful
    report = compact_parquet(spark, path, target_mb=256, sort_cols=["k"])
    assert report["compacted"]
    files = glob.glob(path + "/*.parquet")
    if len(files) > 1:
        spans = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            i = names.index("k")
            st = [md.row_group(g).column(i).statistics for g in range(md.num_row_groups)]
            spans.append((min(s.min for s in st), max(s.max for s in st)))
        spans.sort()
        # range-partitioned: file ranges must not interleave
        for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
            assert a_hi <= b_lo + 1


def test_noop_when_already_compact(spark, tmp_path):
    path = str(tmp_path / "n")
    spark.range(100).coalesce(1).write.parquet(path)
    report = compact_parquet(spark, path, target_mb=256)
    assert not report["compacted"]
    assert spark.read.parquet(path).count() == 100

def test_partitioned_dir_stats_and_compaction(spark, tmp_path):
    """Hive-partitioned dirs: dir_stats walks subdirs (no silent 0) and
    compaction preserves the partitioned layout."""
    path = str(tmp_path / "p")
    spark.range(20_000).select(
        (F.col("id") % 3).cast("string").alias("lang"), "id"
    ).repartition(12).write.partitionBy("lang").parquet(path)
    before = dir_stats(path)
    assert before["rows"] == 20_000 and before["files"] >= 3

    report = compact_parquet(spark, path, target_mb=256)
    assert report["compacted"]
    assert report["after"]["rows"] == 20_000
    assert report["after"]["files"] < before["files"]
    # layout preserved: lang=* partition dirs still present and prunable
    assert sorted(glob.glob(path + "/lang=*")) == [
        path + "/lang=0", path + "/lang=1", path + "/lang=2"
    ]
    got = spark.read.parquet(path)
    assert got.filter(F.col("lang") == "1").count() == 20_000 // 3 + (1 if 20_000 % 3 > 1 else 0)


def test_recover_compaction_rolls_back_and_forward(spark, tmp_path):
    import os
    import shutil

    from meds_transforms_spark.sources.compaction import recover_compaction

    path = str(tmp_path / "r")
    spark.range(100).coalesce(1).write.parquet(path)

    # crash between the two publish renames: dataset absent, old present
    old = path + "._compact_old"
    os.rename(path, old)
    assert recover_compaction(path) == "rolled_back"
    assert spark.read.parquet(path).count() == 100
    assert not os.path.exists(old)

    # crash after the swap: both present -> old is dropped
    shutil.copytree(path, old)
    assert recover_compaction(path) == "dropped_old"
    assert os.path.exists(path) and not os.path.exists(old)

    # fresh tmp looks in-flight (single-writer grace window): kept
    tmp = path + "._compact_tmp"
    os.makedirs(tmp)
    assert recover_compaction(path) == "kept_tmp_in_flight"
    assert os.path.exists(tmp)
    # past the grace window it is crash debris: dropped
    assert recover_compaction(path, tmp_grace_seconds=0) == "dropped_tmp"
    assert not os.path.exists(tmp)

    # compact_parquet itself self-heals before running
    os.rename(path, old)
    report = compact_parquet(spark, path, target_mb=256)
    assert spark.read.parquet(path).count() == 100
    assert not report["compacted"]  # single file, nothing to do


def test_retain_old_keeps_backup(spark, tmp_path):
    import os

    path = str(tmp_path / "k")
    spark.range(5_000).repartition(10).write.parquet(path)
    report = compact_parquet(spark, path, target_mb=256, retain_old=True)
    assert report["compacted"]
    assert os.path.exists(path + "._compact_old")
    # next run drops the retained backup (publish already completed)
    from meds_transforms_spark.sources.compaction import recover_compaction

    assert recover_compaction(path) == "dropped_old"


def test_partitioned_hot_value_splits_by_target(spark, tmp_path):
    """A hot partition value must split across ~its byte share of the
    target, not collapse into one giant file/task."""
    import os

    from meds_transforms_spark.sources.compaction import _partition_cols

    path = str(tmp_path / "hot")
    # lang=0 holds 95% of rows
    spark.range(100_000).select(
        F.when(F.col("id") % 20 == 0, "1").otherwise("0").alias("lang"),
        F.md5(F.col("id").cast("string")).alias("payload"),
        "id",
    ).repartition(16).write.partitionBy("lang").parquet(path)
    assert _partition_cols(path) == ["lang"]
    before = dir_stats(path)
    # tiny target -> multiple files demanded; the hot value must get
    # nearly all of them
    report = compact_parquet(spark, path, target_mb=1)
    assert report["after"]["rows"] == before["rows"] == 100_000
    hot_files = glob.glob(path + "/lang=0/*.parquet")
    cold_files = glob.glob(path + "/lang=1/*.parquet")
    assert len(hot_files) > 1          # hot value split across tasks
    assert len(cold_files) >= 1
    got = spark.read.parquet(path)
    assert got.filter(F.col("lang") == "0").count() == 95_000


def test_partitioned_null_value_rows_survive(spark, tmp_path):
    """NULL partition values land in __HIVE_DEFAULT_PARTITION__ dirs;
    the salted rewrite must keep them (a typed equi-join on the
    partition cols would silently drop them and trip the audit)."""
    path = str(tmp_path / "nullpart")
    spark.range(30_000).select(
        F.when(F.col("id") % 3 == 0, None).otherwise(
            (F.col("id") % 2).cast("string")
        ).alias("lang"),
        F.md5(F.col("id").cast("string")).alias("payload"),
        "id",
    ).repartition(12).write.partitionBy("lang").parquet(path)
    before = dir_stats(path)
    assert before["rows"] == 30_000
    report = compact_parquet(spark, path, target_mb=1)
    assert report["compacted"]
    assert report["after"]["rows"] == 30_000
    got = spark.read.parquet(path)
    assert got.count() == 30_000
    assert got.filter(F.col("lang").isNull()).count() == 10_000


def test_partitioned_special_char_value_keeps_salt(spark, tmp_path):
    """Partition values with spaces/percent signs produce URI-encoded
    input_file_name() paths; the salting match must normalize them —
    an unmatched hot value silently falls back to splits=1 and lands
    in a single giant file."""
    import os

    path = str(tmp_path / "specialpart")
    # 'a b' (space; hot, 95%) and 'c%d' (percent; cold)
    spark.range(100_000).select(
        F.when(F.col("id") % 20 == 0, "c%d").otherwise("a b").alias("lang"),
        F.md5(F.col("id").cast("string")).alias("payload"),
        "id",
    ).repartition(16).write.partitionBy("lang").parquet(path)
    before = dir_stats(path)
    report = compact_parquet(spark, path, target_mb=1)
    assert report["compacted"]
    assert report["after"]["rows"] == before["rows"] == 100_000
    import glob as _g

    # on disk: space stays raw ('lang=a b'), '%' escapes to 'lang=c%25d'
    hot_dirs = [d for d in os.listdir(path) if d == "lang=a b"]
    assert len(hot_dirs) == 1
    hot_files = _g.glob(os.path.join(path, hot_dirs[0], "*.parquet"))
    assert len(hot_files) > 1  # the space-valued hot partition still split
    got = spark.read.parquet(path)
    assert got.filter(F.col("lang") == "a b").count() == 95_000
    assert got.filter(F.col("lang") == "c%d").count() == 5_000


def test_compact_refuses_in_flight_tmp(spark, tmp_path):
    """A fresh ._compact_tmp (possible live writer) must NOT be
    clobbered by compact_parquet — it skips with a report instead."""
    import os

    path = str(tmp_path / "busy")
    spark.range(5_000).repartition(10).write.parquet(path)
    tmp = path + "._compact_tmp"
    os.makedirs(tmp)
    with open(os.path.join(tmp, "part-live.parquet"), "wb") as f:
        f.write(b"live")
    report = compact_parquet(spark, path, target_mb=256)
    assert not report["compacted"]
    assert report["skipped"] == "tmp_in_flight"
    # the live writer's tmp survives untouched
    with open(os.path.join(tmp, "part-live.parquet"), "rb") as f:
        assert f.read() == b"live"
    # once the tmp is stale debris, compaction proceeds normally
    report = compact_parquet(spark, path, target_mb=256)  # still fresh
    assert report["skipped"] == "tmp_in_flight"
    os.utime(tmp)
    for fn in os.listdir(tmp):
        os.utime(os.path.join(tmp, fn), (0, 0))
    os.utime(tmp, (0, 0))
    report = compact_parquet(spark, path, target_mb=256)
    assert report["compacted"]


def test_recover_tolerates_vanishing_tmp_file(spark, tmp_path, monkeypatch):
    """A file renamed away between os.walk and its stat (concurrent
    writer committing) must read as fresh activity, not crash."""
    import os

    from meds_transforms_spark.sources import compaction

    path = str(tmp_path / "race")
    spark.range(100).coalesce(1).write.parquet(path)
    tmp = path + "._compact_tmp"
    os.makedirs(tmp)
    with open(os.path.join(tmp, "part-0.parquet"), "wb") as f:
        f.write(b"x")
    os.utime(tmp, (0, 0))
    os.utime(os.path.join(tmp, "part-0.parquet"), (0, 0))

    real_getmtime = os.path.getmtime

    def racy_getmtime(p):
        if p.endswith("part-0.parquet"):
            raise FileNotFoundError(p)  # vanished between walk and stat
        return real_getmtime(p)

    monkeypatch.setattr(compaction.os.path, "getmtime", racy_getmtime)
    # every statable file is ancient, but the vanished one counts as
    # fresh activity -> tmp kept in-flight (old code: FileNotFoundError)
    assert compaction.recover_compaction(path) == "kept_tmp_in_flight"
    assert os.path.exists(tmp)


def test_rollback_drops_dead_writers_tmp(spark, tmp_path):
    """Regression: a crash between the two publish renames left a FRESH
    tmp that tripped the tmp_in_flight skip for the whole grace window.
    The roll-back journal proves that writer is dead (it finished tmp
    before renaming path away), so recovery must drop the tmp and let
    the retry compact immediately."""
    import os

    from meds_transforms_spark.sources.compaction import (
        compact_parquet,
        recover_compaction,
    )

    path = str(tmp_path / "crashed")
    spark.range(5_000).repartition(10).write.parquet(path)
    old = path + "._compact_old"
    tmp = path + "._compact_tmp"
    # simulate the crash window: tmp fully written, path renamed to old
    os.makedirs(tmp)
    with open(os.path.join(tmp, "part-dead.parquet"), "wb") as f:
        f.write(b"dead")
    os.rename(path, old)

    assert recover_compaction(path) == "rolled_back"
    assert not os.path.exists(tmp)  # dead writer's tmp dropped
    assert spark.read.parquet(path).count() == 5_000

    # and a retry straight after the crash compacts without stalling
    os.makedirs(tmp)
    with open(os.path.join(tmp, "part-dead.parquet"), "wb") as f:
        f.write(b"dead")
    os.rename(path, old)
    report = compact_parquet(spark, path, target_mb=256)
    assert report["compacted"]
    assert spark.read.parquet(path).count() == 5_000


def test_compact_hive_partitioned_with_map_column(spark, tmp_path):
    """Regression: the skew salt hashed EVERY column with xxhash64,
    which fails analysis on MapType columns."""
    import glob

    from pyspark.sql import functions as F

    from meds_transforms_spark.sources.compaction import compact_parquet

    path = str(tmp_path / "mapped")
    (
        spark.range(4_000)
        .select(
            F.col("id"),
            (F.col("id") % 2).cast("string").alias("lang"),
            F.create_map(F.lit("k"), F.col("id").cast("string")).alias("props"),
        )
        .repartition(12)
        .write.partitionBy("lang")
        .parquet(path)
    )
    report = compact_parquet(spark, path, target_mb=1024)
    assert report["compacted"]
    got = spark.read.parquet(path)
    assert got.count() == 4_000
    assert dict(got.dtypes)["props"].startswith("map<")
