"""Sharded corpus export — the training-dataloader handoff format.

Pretraining ingestion wants a corpus as N similar-sized shards plus a
manifest (docs/tokens per shard) so the dataloader can plan epochs,
resume, and stripe across workers without re-scanning data. This sink
lays documents out as ``shard=K`` partitioned parquet (or JSON-lines)
with a deterministic doc→shard assignment and writes
``manifest.json`` next to it.

Shard assignment is the engine's standard hash discipline (see
operators/sampling.py): ``shard = pmod(hash(seed, id), n_shards)`` —
a pure codegen projection, reproducible across runs/partitionings/
engines (md5_60 mode included), and uniform to within sampling noise,
so shard sizes self-balance without a global sort. ``order="id"``
instead range-buckets by id for locality-preserving shards (one range
shuffle). At 100 TB the only data movement is the ONE shuffle into
shard partitioning; the manifest aggregation reuses it map-side.

The reference's sharding counterpart is the `.shards.json` subject map
(`/root/reference/src/MEDS_transforms/stages/reshard_to_split.py`);
this generalizes it to document corpora with token accounting.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meds_transforms_spark.operators.dedup import _h64


def write_corpus_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    seed: int = 0,
    order: str = "hash",
    fmt: str = "parquet",
    hash_fn: str = "xxhash64",
) -> dict:
    """Write ``path/data/shard=K/`` + ``path/manifest.json``; returns
    the manifest dict.

    ``order="hash"`` shards by deterministic hash (shards mix sources —
    the right default for training); ``order="id"`` range-buckets ids
    so each shard is an id interval (locality for lookup workloads).
    Token counts come from ``token_col`` or a whitespace count of
    ``text_col``; NULL text counts 0.
    """
    if order not in ("hash", "id"):
        raise ValueError(f"order must be 'hash' or 'id', got {order!r}")
    if fmt not in ("parquet", "json"):
        raise ValueError(f"fmt must be 'parquet' or 'json', got {fmt!r}")
    if token_col is None:
        from meds_transforms_spark.operators.text import _tokens

        n_tok = F.coalesce(F.size(_tokens(F.col(text_col))).cast("long"), F.lit(0))
    else:
        n_tok = F.coalesce(F.col(token_col).cast("long"), F.lit(0))

    if order == "hash":
        shard = F.pmod(
            _h64(hash_fn, F.lit(int(seed)).cast("string"), F.col(id_col)),
            F.lit(n_shards),
        ).cast("int")
        sharded = df.withColumn("shard", shard).withColumn("__ntok", n_tok)
        sharded = sharded.repartition(n_shards, "shard")
    else:
        # spark_partition_id after a range shuffle is partitioner-
        # dependent (sampled boundaries) — the persist below pins ONE
        # assignment across the write job and the stats job, so the
        # manifest always describes the files actually written.
        sharded = (
            df.withColumn("__ntok", n_tok)
            .repartitionByRange(n_shards, id_col)
            .withColumn("shard", F.spark_partition_id())
        )
    sharded = sharded.persist()
    try:
        data_path = os.path.join(path, "data")
        writer = sharded.drop("__ntok").write.partitionBy("shard").mode("overwrite")
        if fmt == "parquet":
            writer.parquet(data_path)
        else:
            writer.json(data_path)

        stats = (
            sharded.groupBy("shard")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("__ntok").alias("n_tokens"),
            )
            .orderBy("shard")
            .collect()  # one row per shard — driver-side by design
        )
    finally:
        sharded.unpersist()
    manifest = {
        "format": fmt,
        "n_shards": n_shards,
        "order": order,
        "seed": seed,
        "hash_fn": hash_fn,
        "shards": [
            {"shard": r["shard"], "n_docs": r["n_docs"], "n_tokens": r["n_tokens"]}
            for r in stats
        ],
        "total_docs": sum(r["n_docs"] for r in stats),
        "total_tokens": sum(r["n_tokens"] for r in stats),
    }
    spark = df.sparkSession
    _write_text(spark, os.path.join(path, "manifest.json"), json.dumps(manifest, indent=2))
    return manifest


def read_corpus_shards(
    spark: SparkSession, path: str, shards: list[int] | None = None
) -> DataFrame:
    """Read a sharded corpus back; ``shards`` prunes to specific shard
    partitions (partition pruning — only those directories scan)."""
    manifest = read_manifest(spark, path)
    fmt = manifest.get("format", "parquet")
    reader = spark.read.format(fmt)
    df = reader.load(os.path.join(path, "data"))
    if shards is not None:
        df = df.filter(F.col("shard").isin([int(s) for s in shards]))
    return df


def read_manifest(spark: SparkSession, path: str) -> dict:
    with open(os.path.join(path, "manifest.json")) as f:
        return json.load(f)


def _write_text(spark: SparkSession, path: str, content: str) -> None:
    """Driver-side small-file write (manifest is a few KB)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)
