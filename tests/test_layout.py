"""Tests for Z-order layout (operators/layout)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F


def _morton(bu: int, bv: int, bits: int = 8) -> int:
    z = 0
    for j in range(bits):
        z |= ((bu >> j) & 1) << (2 * j + 1)
        z |= ((bv >> j) & 1) << (2 * j)
    return z


def test_zorder_key_matches_python_reference(spark):
    from meds_transforms_spark.operators.layout import zorder_key

    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(
        [(0, 0), (255, 255), (0, 255), (255, 0), (17, 200), (128, 128)]
    )]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out = {r.id: r.zkey for r in zorder_key(df, ["x", "y"], bits=8).collect()}
    for i, x, y in rows:
        # min=0 max=255 → bucket == value exactly
        assert out[i] == _morton(int(x), int(y)), (i, x, y)


def test_zorder_constant_dimension_degrades(spark):
    from meds_transforms_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(i, 7.0, float(i)) for i in range(16)], "id long, x double, y double"
    )
    out = zorder_key(df, ["x", "y"], bits=4).orderBy("id").collect()
    # constant x contributes zero bits: key strictly increases with y
    keys = [r.zkey for r in out]
    assert keys == sorted(keys) and len(set(keys)) == 16


def test_zorder_rejects_overflow(spark):
    import pytest

    from meds_transforms_spark.operators.layout import zorder_key

    df = spark.createDataFrame([(1, 1.0)], "id long, x double")
    with pytest.raises(ValueError):
        zorder_key(df, ["x"] * 4, bits=16)


def test_write_zordered_tightens_file_ranges(spark, tmp_path):
    """Every file's (user-dim, time-dim) footer span must be far below
    the global span — the property parquet min/max pruning feeds on."""
    import pyarrow.parquet as pq

    from meds_transforms_spark.operators.layout import write_zordered

    n = 20_000
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 500).cast("double").alias("u"),
        F.floor(F.col("id") / 40).cast("double").alias("t"),
    )
    path = str(tmp_path / "z")
    write_zordered(df, path, ["u", "t"], bits=12, num_files=16)

    def span_frac(col):
        spans, glo = [], None
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            idx = names.index(col)
            st = [md.row_group(g).column(idx).statistics for g in range(md.num_row_groups)]
            spans.append(max(s.max for s in st) - min(s.min for s in st))
        return sum(spans) / len(spans)

    u_frac = span_frac("u") / 499.0
    t_frac = span_frac("t") / float((n - 1) // 40)
    # a single-column sort would give ~1.0 on the other column;
    # z-order keeps BOTH around sqrt(1/16)=0.25
    assert u_frac < 0.5 and t_frac < 0.5, (u_frac, t_frac)
    # and the data round-trips
    assert spark.read.parquet(path).count() == n


def test_zorder_rowgroups_skippable_on_both_dims(spark, tmp_path):
    """The skip test the reader actually runs: a selective range
    predicate on EITHER dimension must leave most row groups'
    [min,max] footer stats non-overlapping (those groups are skipped by
    parquet predicate pushdown without reading a data page), and the
    surviving groups must contain exactly the matching rows."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.layout import write_zordered

    n = 40_000
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 1000).cast("double").alias("u"),
        F.floor(F.col("id") / 40).cast("double").alias("t"),
    )
    path = str(tmp_path / "z")
    write_zordered(df, path, ["u", "t"], bits=12, num_files=16)

    def overlapping_groups(col, lo, hi):
        total = hit = 0
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            idx = names.index(col)
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                total += 1
                if st.max >= lo and st.min <= hi:
                    hit += 1
        return hit, total

    u_hit, total = overlapping_groups("u", 100.0, 120.0)
    t_hit, _ = overlapping_groups("t", 50.0, 80.0)
    assert total >= 16
    # selectivity ~2-3%: most groups must be skippable on EITHER dim
    assert u_hit <= total // 2, (u_hit, total)
    assert t_hit <= total // 2, (t_hit, total)
    # and the pushed filter returns exactly the right rows
    got = spark.read.parquet(path).filter(F.col("u").between(100, 120)).count()
    assert got == sum(1 for i in range(n) if 100 <= i % 1000 <= 120)


def test_zorder_null_dimension_values_get_min_bucket(spark):
    from meds_transforms_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, None, 255.0), (3, 255.0, 255.0)],
        "id long, x double, y double",
    )
    out = {r.id: r.zkey for r in zorder_key(df, ["x", "y"], bits=8).collect()}
    assert out[2] is not None               # null dim → bucket 0, not null key
    assert out[2] == _morton(0, 255)
    assert out[1] == 0 and out[3] == _morton(255, 255)


def test_zorder_key_property_matches_reference(spark):
    """Hypothesis sweep: for any set of (x, y) integer points, the
    engine's Morton key equals the pure-python interleave of the
    min/max-normalized buckets."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from meds_transforms_spark.operators.layout import zorder_key

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 10_000), st.integers(0, 10_000)),
            min_size=2,
            max_size=12,
            unique=True,
        )
    )
    def check(points):
        bits = 6
        top = (1 << bits) - 1
        rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(points)]
        df = spark.createDataFrame(rows, "id long, x double, y double")
        got = {r.id: r.zkey for r in zorder_key(df, ["x", "y"], bits=bits).collect()}
        xs, ys = [p[0] for p in points], [p[1] for p in points]
        lox, hix, loy, hiy = min(xs), max(xs), min(ys), max(ys)

        def bucket(v, lo, hi):
            if hi <= lo:
                return 0
            import math
            return min(max(int(math.floor((v - lo) / (hi - lo) * top)), 0), top)

        for i, (x, y) in enumerate(points):
            assert got[i] == _morton(bucket(x, lox, hix), bucket(y, loy, hiy), bits), (
                i, x, y, points,
            )

    check()
