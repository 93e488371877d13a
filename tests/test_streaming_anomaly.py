"""Tests for the stateful streaming anomaly detector."""

from __future__ import annotations

import datetime as dt


def test_anomaly_stream_flags_spike_across_batches(spark, tmp_path):
    """State carries across micro-batches: the baseline is learned in
    batch 1, the spike arrives in batch 2 and is judged against the
    accumulated statistics (never against itself)."""
    from meds_transforms_spark.streaming.anomaly import anomaly_stream

    base = dt.datetime(2024, 1, 1)
    schema = "event_type string, ts timestamp, value double"
    src = str(tmp_path / "src")
    # batch 1: 20 calm events
    spark.createDataFrame(
        [("m", base + dt.timedelta(seconds=i), 10.0 + (i % 4) * 0.5) for i in range(20)],
        schema,
    ).coalesce(1).write.parquet(src)
    # batch 2 (separate file): one spike + one calm
    spark.createDataFrame(
        [("m", base + dt.timedelta(seconds=30), 400.0),
         ("m", base + dt.timedelta(seconds=31), 10.5)],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force multi-batch processing
        .parquet(src)
    )
    out = anomaly_stream(stream, z_threshold=3.0, min_events=10)
    q = (
        out.writeStream.format("memory")
        .queryName("anomaly_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # ProcessingTimeTimeout keeps the stateful query alive servicing
    # timeouts, so processAllAvailable never returns — poll the sink
    # (the sessionize-test pattern), then stop.
    import time

    try:
        deadline = time.time() + 120
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM anomaly_out ORDER BY event_time").collect()
            if len(rows) >= 22:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert len(rows) == 22
    by_val = {r.value: r for r in rows}
    assert by_val[400.0].is_anomaly
    assert by_val[400.0].seen_before == 20       # judged against batch-1 stats only
    assert not by_val[10.5].is_anomaly           # calm event after the spike
    # warmup events (fewer than min_events seen) are never flagged
    assert all(not r.is_anomaly for r in rows if r.seen_before < 10)


def test_anomaly_stream_welford_matches_batch_stats(spark, tmp_path):
    """The streamed running stats must agree with a direct computation:
    the final state after N events reproduces numpy mean/var."""
    import numpy as np

    from meds_transforms_spark.streaming.anomaly import anomaly_stream

    base = dt.datetime(2024, 1, 1)
    vals = [float(((i * 37) % 100) / 10.0) for i in range(50)]
    schema = "event_type string, ts timestamp, value double"
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("k", base + dt.timedelta(seconds=i), v) for i, v in enumerate(vals)], schema
    ).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = anomaly_stream(stream, z_threshold=3.0, min_events=10)
    q = (
        out.writeStream.format("memory")
        .queryName("anomaly_w")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    import time

    try:
        deadline = time.time() + 120
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM anomaly_w ORDER BY event_time").collect()
            if len(rows) >= len(vals):
                break
            time.sleep(0.5)
    finally:
        q.stop()
    last = rows[-1]
    prior = np.array(vals[:-1])
    expect_z = (vals[-1] - prior.mean()) / prior.std()
    assert abs(last.z_score - expect_z) < 1e-9


def test_null_value_does_not_poison_state(spark, tmp_path):
    """A NULL reading must pass through unjudged and leave the key's
    Welford statistics intact for subsequent events."""
    import datetime as dt

    from meds_transforms_spark.streaming.anomaly import anomaly_stream

    base = dt.datetime(2024, 1, 1)
    schema = "event_type string, ts timestamp, value double"
    rows = [("m", base + dt.timedelta(seconds=i), 10.0 + (i % 3) * 0.5) for i in range(12)]
    rows.append(("m", base + dt.timedelta(seconds=12), None))     # bad reading
    rows.append(("m", base + dt.timedelta(seconds=13), 10.5))
    rows.append(("m", base + dt.timedelta(seconds=14), 500.0))    # real spike
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = anomaly_stream(stream, z_threshold=3.0, min_events=10)
    q = (
        out.writeStream.format("memory")
        .queryName("anomaly_null")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    import time

    try:
        deadline = time.time() + 120
        res = []
        while time.time() < deadline:
            res = spark.sql("SELECT * FROM anomaly_null ORDER BY event_time").collect()
            if len(res) >= 15:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert len(res) == 15
    null_row = [r for r in res if r.value is None][0]
    assert null_row.z_score is None and not null_row.is_anomaly
    spike = [r for r in res if r.value == 500.0][0]
    assert spike.is_anomaly                   # state survived the NULL
    assert spike.seen_before == 13            # the NULL never counted
