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

Exactly-once notes: foreachBatch may re-run a batch on failure.
Re-ingesting batch N against an index that already contains batch N's
delta flags every batch-N doc as a corpus dup — writing zero rows the
second time and never duplicating output; the index append itself is
deduplicated by recording the last committed ``batch_id`` in the index
manifest and skipping appends for batches already applied (the
standard idempotent-foreachBatch recipe).

At scale each micro-batch probes the index with one AQE-broadcast
semi-join (batch side small, index parquet-pruned to bucket/id
columns); the index grows by survivors only.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from meds_transforms_spark.operators.dedup_index import ingest_batch


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

    ``index_path`` holds ``buckets/`` (parquet (id, __bucket) rows) and
    ``state.json`` (last applied batch id). ``output_path`` receives
    clean docs as appended parquet.
    """
    spark = stream.sparkSession
    buckets_dir = os.path.join(index_path, "buckets")
    state_file = os.path.join(index_path, "state.json")

    def _last_batch() -> int:
        try:
            with open(state_file) as f:
                return json.load(f)["batch_id"]
        except (OSError, KeyError, ValueError):
            return -1

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if os.path.isdir(buckets_dir):
            index = spark.read.parquet(buckets_dir)
        else:
            index = spark.createDataFrame(
                [], f"{id_col} long, __bucket long"
            )
        clean, delta = ingest_batch(
            batch_df, index, text_col=text_col, id_col=id_col, **params
        )
        clean = clean.persist()
        try:
            clean.write.mode("append").parquet(output_path)
            if batch_id > _last_batch():
                delta.write.mode("append").parquet(buckets_dir)
                os.makedirs(index_path, exist_ok=True)
                with open(state_file, "w") as f:
                    json.dump({"batch_id": batch_id}, f)
        finally:
            clean.unpersist()

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
