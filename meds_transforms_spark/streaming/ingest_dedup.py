"""Streaming corpus ingestion with near-dedup against a durable index.

Near-dedup (MinHash band collision) can't live in the streaming state
store: a doc's state key set is its ~bands bucket hashes and matches
must survive arbitrarily long (a crawl re-fetches a page months
later — no watermark bounds that). The production shape is instead
``foreachBatch`` + the durable band-bucket index from
``operators/dedup_index``:

every micro-batch → ``ingest_batch`` (drop docs colliding with the
index OR with in-batch near-dups) → append the survivors' buckets to
the index path → append the clean docs to the output path.

Exactly-once notes: foreachBatch may re-run a batch on failure, so
every write is idempotent under replay:

- clean docs land in a ``__batch_id=N`` partition via DYNAMIC partition
  overwrite — a replay rewrites (not re-appends) exactly that
  partition. If the crash happened after the index delta was applied,
  the replayed batch flags all its docs as corpus dups, ``clean`` is
  empty, and the overwrite touches nothing — the committed partition
  survives intact.
- the index append is gated on the last committed ``batch_id`` in the
  sidecar state file. The one crash window (after the delta append,
  before the state write) can double-append delta rows; duplicate
  (id, bucket) rows are harmless — the probe is a semi-join against
  DISTINCT buckets.
- the index's MinHash parameters are persisted on first use and
  validated on every batch and restart — restarting the stream with
  different parameters raises instead of silently matching nothing.

At scale each micro-batch probes the index with one AQE-broadcast
semi-join (batch side small, index parquet-pruned to bucket/id
columns); the index grows by survivors only. The batch's bucket table
is computed once, persisted, and shared by the clean/delta writes.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.operators.dedup_index import (
    _effective_params,
    build_minhash_index,
    ingest_batch,
)


def start_ingest_dedup_stream(
    stream: DataFrame,
    index_path: str,
    output_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger_once: bool = False,
    **params,
):
    """Start the foreachBatch ingest query; returns the StreamingQuery.

    ``index_path`` holds ``buckets/`` (parquet (id, __bucket) rows),
    ``params.json`` (MinHash build parameters, validated every batch),
    and ``state.json`` (last applied batch id). ``output_path``
    receives clean docs as ``__batch_id``-partitioned parquet.
    """
    spark = stream.sparkSession
    buckets_dir = os.path.join(index_path, "buckets")
    state_file = os.path.join(index_path, "state.json")
    params_file = os.path.join(index_path, "params.json")

    def _last_batch() -> int:
        try:
            with open(state_file) as f:
                return json.load(f)["batch_id"]
        except (OSError, KeyError, ValueError):
            return -1

    def _resolved_params() -> dict:
        stored = None
        try:
            with open(params_file) as f:
                stored = json.load(f)
        except (OSError, ValueError):
            pass
        return _effective_params(stored, dict(params))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        p = _resolved_params()
        if os.path.isdir(buckets_dir):
            index = spark.read.parquet(buckets_dir)
        else:
            index = spark.createDataFrame(
                [], f"{id_col} long, __bucket long"
            )
        buckets = build_minhash_index(batch_df, text_col, id_col, **p).persist()
        try:
            clean, delta = ingest_batch(
                batch_df,
                index,
                text_col=text_col,
                id_col=id_col,
                new_buckets=buckets,
                **p,
            )
            (
                clean.withColumn("__batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("__batch_id")
                .parquet(output_path)
            )
            if batch_id > _last_batch():
                delta.write.mode("append").parquet(buckets_dir)
                os.makedirs(index_path, exist_ok=True)
                if not os.path.exists(params_file):
                    with open(params_file, "w") as f:
                        json.dump(p, f)
                with open(state_file, "w") as f:
                    json.dump({"batch_id": batch_id}, f)
        finally:
            buckets.unpersist()

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
