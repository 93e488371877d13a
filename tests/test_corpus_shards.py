"""Sharded corpus export round-trip tests."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc body number "), F.col("id").cast("string")).alias("text"),
    )


def test_hash_shards_roundtrip_and_manifest(spark, tmp_path):
    from meds_transforms_spark.sources.corpus_shards import (
        read_corpus_shards,
        read_manifest,
        write_corpus_shards,
    )

    path = str(tmp_path / "corpus")
    manifest = write_corpus_shards(_docs(spark), path, n_shards=4)
    assert manifest["total_docs"] == 200
    assert manifest["total_tokens"] == 200 * 4
    assert len(manifest["shards"]) == 4
    assert sum(s["n_docs"] for s in manifest["shards"]) == 200
    # every shard got a reasonable share (hash uniformity at n=200)
    assert all(s["n_docs"] > 10 for s in manifest["shards"])
    on_disk = read_manifest(spark, path)
    assert on_disk == manifest

    back = read_corpus_shards(spark, path)
    assert back.count() == 200
    assert {r.doc_id for r in back.select("doc_id").collect()} == set(range(200))


def test_shard_assignment_deterministic(spark, tmp_path):
    from meds_transforms_spark.sources.corpus_shards import write_corpus_shards

    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = write_corpus_shards(_docs(spark).repartition(3), p1, n_shards=4)
    m2 = write_corpus_shards(_docs(spark).repartition(11), p2, n_shards=4)
    assert m1["shards"] == m2["shards"]


def test_shard_pruning_reads_subset(spark, tmp_path):
    from meds_transforms_spark.sources.corpus_shards import (
        read_corpus_shards,
        write_corpus_shards,
    )

    path = str(tmp_path / "corpus")
    manifest = write_corpus_shards(_docs(spark), path, n_shards=4)
    only2 = read_corpus_shards(spark, path, shards=[2])
    assert only2.count() == manifest["shards"][2]["n_docs"]
    # partition pruning: the shard filter must land in PartitionFilters
    # (pruned at the file index — directories for other shards never scan)
    plan = only2._jdf.queryExecution().executedPlan().toString()
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "shard" in pf.group(1) and "= 2" in pf.group(1), plan


def test_id_order_shards_are_intervals(spark, tmp_path):
    from meds_transforms_spark.sources.corpus_shards import (
        read_corpus_shards,
        write_corpus_shards,
    )

    path = str(tmp_path / "corpus")
    write_corpus_shards(_docs(spark), path, n_shards=4, order="id")
    back = read_corpus_shards(spark, path)
    spans = (
        back.groupBy("shard")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # each shard covers a contiguous id interval: span size == row count
    for r in spans:
        assert r.hi - r.lo + 1 == r.n


def test_json_format(spark, tmp_path):
    from meds_transforms_spark.sources.corpus_shards import (
        read_corpus_shards,
        write_corpus_shards,
    )

    path = str(tmp_path / "corpus")
    write_corpus_shards(_docs(spark, 50), path, n_shards=2, fmt="json")
    assert read_corpus_shards(spark, path).count() == 50
    with open(os.path.join(path, "manifest.json")) as f:
        assert json.load(f)["format"] == "json"
