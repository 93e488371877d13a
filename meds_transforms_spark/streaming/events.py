"""Structured Streaming ingestion for MEDS-shaped event streams.

The reference is strictly batch (SURVEY §2.9) — its only "streaming"
behavior is workers polling the filesystem for new shard files
(mapreduce/reducer.py:206-208). The Spark-native upgrade of that
pattern is a file-source Structured Stream: new parquet files landing
in a directory are picked up incrementally, transformed with the same
stage logic, and appended to the dataset — no polling loops, exactly-
once sink semantics via checkpointing.

These utilities make the batch operators stream-capable where semantics
allow (stateless projections/filters apply verbatim; windowed
aggregations get watermarked event-time windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meds_transforms_spark.schema import CODE, MEDS_DATA_SCHEMA, SUBJECT_ID, TIME


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema=None,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """Incremental parquet-directory source for MEDS event shards."""
    return (
        spark.readStream.schema(schema or MEDS_DATA_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_code_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-code event counts over tumbling event-time windows.

    Watermarking bounds state for late data — the streaming analog of
    aggregate_code_metadata's code/n_occurrences.
    """
    return (
        stream.filter(F.col(TIME).isNotNull())
        .withWatermark(TIME, watermark)
        .groupBy(F.window(F.col(TIME), window).alias("win"), F.col(CODE))
        .agg(
            F.count(F.lit(1)).alias("code/n_occurrences"),
            F.approx_count_distinct(SUBJECT_ID).alias("code/n_subjects_approx"),
        )
    )


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    time_col: str = "ts",
    watermark: str = "1 hour",
    normalize: bool = True,
) -> DataFrame:
    """Streaming exact dedup: drop later arrivals with identical
    (normalized) content.

    ``dropDuplicatesWithinWatermark`` on the 64-bit content hash — the
    streaming analog of ``operators.dedup.exact_dedup``. State is
    bounded by the watermark: a duplicate arriving more than
    ``watermark`` after its first occurrence is admitted again (the
    standard trade for bounded state on an unbounded stream; the batch
    operator remains the exact pass for compaction jobs).

    At scale the state store is keyed by a single long per distinct doc
    in the watermark horizon — RocksDB state backend handles billions;
    no shuffle beyond the dedup key exchange.
    """
    from meds_transforms_spark.operators.dedup import _normalized

    c = F.col(text_col)
    key = F.xxhash64(_normalized(c) if normalize else c)
    return (
        stream.withWatermark(time_col, watermark)
        .withColumn("__key", key)
        .dropDuplicatesWithinWatermark(["__key"])
        .drop("__key")
    )


def attribution_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    left_time: str = "ts",
    right_time: str = "ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
    join_type: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join — e.g. attribute each
    purchase (right) to the click (left) that preceded it within
    ``within``.

    This is the Structured Streaming capability with no batch
    counterpart shortcut: BOTH sides are unbounded, so Spark buffers
    each in the state store and the event-time range condition plus the
    two watermarks bound how long a row waits for its match — state is
    provably droppable once ``right_time`` can no longer land in
    ``[left_time, left_time + within]``. Outer variants additionally
    need both watermarks to emit their NULL-padded rows.

    At scale: state is keyed by the join key, partitioned by the normal
    exchange; RocksDB backend for large key cardinality. The range
    condition MUST be on event-time columns (not computed epochs) for
    the state-cleanup planner to see it.
    """
    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (rt >= lt)
        & (rt <= lt + F.expr(f"INTERVAL {within}"))
    )
    return (
        left.withWatermark(left_time, watermark)
        .alias("l")
        .join(right.withWatermark(right_time, watermark).alias("r"), cond, join_type)
    )


def stream_to_meds_sink(
    stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    trigger_seconds: int | None = None,
):
    """Append transformed events to a MEDS data directory exactly-once."""
    writer = (
        stream.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
