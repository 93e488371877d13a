"""Partition-layout invariance for the round-6 operators.

A distributed operator's OUTPUT must be a pure function of the data,
never of how the input happened to be split across tasks — otherwise
a cluster resize (or AQE coalescing) silently changes results. These
tests run each operator under two unrelated repartitionings and pin
set-equality of the collected output.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _events(spark):
    from meds_transforms_spark.sources.testdata import load_table

    return load_table(spark, "/root/testdata/sf0.001", "events")


def test_rolling_bucketized_partition_invariant(spark):
    from meds_transforms_spark.operators.rolling import rolling_time_stats

    ev = _events(spark)
    kw = dict(
        keys="event_type",
        time_col="ts",
        value_col="value",
        window_seconds=6 * 3600,
        bucket_seconds=86400,
    )

    def run(df):
        return {
            (r.event_id, r.w21600s_n, r.w21600s_sum)
            for r in rolling_time_stats(df, **kw)
            .select("event_id", "w21600s_n", "w21600s_sum")
            .collect()
        }

    a = run(ev.repartition(3))
    b = run(ev.repartition(17))
    assert a == b and a


def test_winnow_overlap_packed_partition_invariant(spark):
    from meds_transforms_spark.operators.winnow import winnow_overlap

    docs = _docs(spark)
    kw = dict(k=10, w=8, min_shared=2, max_df=100, packed_ids=True)

    def run(df):
        return {
            (r.id_a, r.id_b, r.n_shared) for r in winnow_overlap(df, **kw).collect()
        }

    a = run(docs.repartition(2))
    b = run(docs.repartition(13))
    assert a == b and a


def test_semantic_dedup_arrow_partition_invariant(spark):
    """Arrow batch boundaries move with the partitioning; the per-row
    matmul argmax (and therefore the survivor set) must not."""
    from meds_transforms_spark.operators.dedup import semantic_dedup

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .limit(150)
    )
    aug = emb.select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("emb", lambda x: x * 1.01).alias("emb"),
    )
    both = (emb.unionByName(aug)).localCheckpoint()
    kw = dict(vec_col="emb", id_col="vec_id", n_cells=8, threshold=0.95, exact=True)

    a = {r.vec_id for r in semantic_dedup(both.repartition(2), assign="arrow", **kw).collect()}
    b = {r.vec_id for r in semantic_dedup(both.repartition(11), assign="arrow", **kw).collect()}
    assert a == b and len(a) == 150
