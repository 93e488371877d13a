"""Deterministic sampling / balancing operators."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("zh")),
            (F.pmod(F.xxhash64("id", F.lit(99)), F.lit(3)) + 1).cast("int"),
        ).alias("lang"),
    )


def test_deterministic_sample_rate_and_stability(spark):
    from meds_transforms_spark.operators.sampling import deterministic_sample

    df = _docs(spark)
    s1 = deterministic_sample(df, 0.3, on="doc_id", seed=7)
    got1 = {r.doc_id for r in s1.collect()}
    # Stable under re-partitioning — the selection is a function of the data.
    got2 = {
        r.doc_id
        for r in deterministic_sample(
            df.repartition(13), 0.3, on="doc_id", seed=7
        ).collect()
    }
    assert got1 == got2
    assert 0.25 < len(got1) / 2000 < 0.35
    # Different seed → different (mostly disjoint-ish) selection.
    got3 = {r.doc_id for r in deterministic_sample(df, 0.3, on="doc_id", seed=8).collect()}
    assert got3 != got1


def test_deterministic_sample_correlated_across_tables(spark):
    """Hashing the same key selects the same entities in any table."""
    from meds_transforms_spark.operators.sampling import deterministic_sample

    subjects = spark.range(500).select(F.col("id").alias("subject_id"))
    events = spark.range(5000).select(
        F.col("id").alias("event_id"),
        F.pmod(F.col("id"), F.lit(500)).alias("subject_id"),
    )
    kept_subj = {
        r.subject_id
        for r in deterministic_sample(subjects, 0.2, on="subject_id", seed=1).collect()
    }
    kept_ev_subj = {
        r.subject_id
        for r in deterministic_sample(events, 0.2, on="subject_id", seed=1)
        .select("subject_id")
        .distinct()
        .collect()
    }
    assert kept_ev_subj == kept_subj


def test_stratified_sample_rates(spark):
    from meds_transforms_spark.operators.sampling import stratified_sample

    df = _docs(spark, 3000)
    out = stratified_sample(
        df, "lang", {"en": 1.0, "de": 0.5}, on="doc_id", seed=3, default_fraction=0.0
    )
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r.lang: r.n for r in df.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["en"] == totals["en"]          # keep-all stratum
    assert "zh" not in counts                     # default 0 drops stratum
    assert 0.4 < counts["de"] / totals["de"] < 0.6


def test_group_cap_exact_and_deterministic(spark):
    from meds_transforms_spark.operators.sampling import group_cap

    df = _docs(spark)
    out = group_cap(df, "lang", 25, on="doc_id", seed=5)
    counts = [r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()]
    assert counts == [25, 25, 25]
    again = group_cap(df.repartition(17), "lang", 25, on="doc_id", seed=5)
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}
    # Both physical strategies produce the identical set.
    single = group_cap(df, "lang", 25, on="doc_id", seed=5, two_phase=False)
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in single.collect()}
    # order_by path: smallest doc_ids win
    first = group_cap(df, "lang", 3, order_by=["doc_id"])
    ids = sorted(r.doc_id for r in first.filter("lang = 'en'").collect())
    en_ids = sorted(r.doc_id for r in df.filter("lang = 'en'").collect())
    assert ids == en_ids[:3]


def test_sampling_md5_mode_matches_duckdb(spark):
    """The md5_60 hash mode reproduces bit-identically in DuckDB —
    sampling is oracle-checkable like every other operator."""
    import duckdb

    from meds_transforms_spark.operators.sampling import deterministic_sample

    df = spark.range(300).select(F.col("id").alias("doc_id"))
    got = sorted(
        r.doc_id
        for r in deterministic_sample(
            df, 0.25, on="doc_id", seed=11, hash_fn="md5_60"
        ).collect()
    )
    want = [
        r[0]
        for r in duckdb.sql(
            "SELECT i AS doc_id FROM range(300) t(i) "
            "WHERE CAST('0x' || substr(md5('11:' || CAST(i AS VARCHAR)), 1, 15) AS BIGINT) "
            "      % 1000000 < 250000 ORDER BY 1"
        ).fetchall()
    ]
    assert got == want and got


def test_deterministic_sample_on_stream(spark, tmp_path):
    """The hash filter is stateless — sampling applies to a streaming
    source unchanged (and selects the same rows as the batch path)."""
    from meds_transforms_spark.operators.sampling import deterministic_sample

    df = _docs(spark, 400)
    src = str(tmp_path / "docs")
    df.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, lang string").parquet(src)
    (
        deterministic_sample(stream, 0.3, on="doc_id", seed=7)
        .writeStream.format("memory")
        .queryName("sample_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = {r.doc_id for r in spark.sql("select doc_id from sample_out").collect()}
    want = {r.doc_id for r in deterministic_sample(df, 0.3, on="doc_id", seed=7).collect()}
    assert got == want


def test_cluster_balanced_sample(spark):
    """Cluster cap: three tight embedding clusters with very different
    sizes come back balanced; assignment is deterministic and refined
    centroids (iters>0) still produce a valid capped partition."""
    import numpy as np

    from meds_transforms_spark.operators.sampling import cluster_balanced_sample

    rng = np.random.RandomState(3)
    centers = {0: [10.0, 0.0], 1: [0.0, 10.0], 2: [-10.0, -10.0]}
    sizes = {0: 40, 1: 12, 2: 3}
    # Round-robin ids across clusters so the deterministic seed
    # centroids (first n_cells by vec_id) span all three modes.
    schedule = []
    remaining = dict(sizes)
    while any(remaining.values()):
        for c in centers:
            if remaining[c]:
                schedule.append(c)
                remaining[c] -= 1
    rows = []
    for vid, c in enumerate(schedule):
        vec = (np.array(centers[c]) + rng.normal(0, 0.2, 2)).tolist()
        rows.append((vid, vec, c))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, true_cluster int")

    out = cluster_balanced_sample(
        emb, n_cells=3, cap_per_cluster=5, seed=1
    ).collect()
    per_cluster: dict[int, int] = {}
    for r in out:
        per_cluster[r.cluster_id] = per_cluster.get(r.cluster_id, 0) + 1
    # every cluster capped at 5; the 3-vector cluster keeps all 3
    assert all(v <= 5 for v in per_cluster.values())
    assert sum(per_cluster.values()) == 5 + 5 + 3
    # deterministic
    again = cluster_balanced_sample(emb, n_cells=3, cap_per_cluster=5, seed=1).collect()
    assert {(r.vec_id, r.cluster_id) for r in again} == {
        (r.vec_id, r.cluster_id) for r in out
    }

    refined = cluster_balanced_sample(
        emb, n_cells=3, cap_per_cluster=5, seed=1, iters=2
    ).collect()
    assert len(refined) <= 13 and len({r.vec_id for r in refined}) == len(refined)


def test_order_bucket_md5_60_exact_range_and_monotone(spark):
    """_order_bucket's md5_60 slice is exact-integer (ADVICE r10): the
    old double division rounded top-of-range 60-bit keys (within ~128
    of 2**60) into bucket == n_buckets — an out-of-range extra
    partition. The shift formula keeps every bucket in [0, n) and
    non-decreasing in the key."""
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.sampling import _order_bucket

    n = 37  # non-power-of-two
    top = (1 << 60) - 1
    keys = sorted(
        {0, 1, 2, top, top - 1, top - 127, (1 << 60) - (1 << 30)}
        | {(i * ((1 << 60) // 97)) % (1 << 60) for i in range(97)}
    )
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    rows = (
        df.withColumn("b", _order_bucket(F.col("k"), "md5_60", n))
        .orderBy("k")
        .collect()
    )
    buckets = [r.b for r in rows]
    assert all(0 <= b < n for b in buckets), buckets
    assert buckets == sorted(buckets)  # monotone in the key
    assert buckets[0] == 0 and buckets[-1] == n - 1
