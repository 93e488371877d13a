"""Scale spot-checks for the round-2c operators (gopher filter, DSIR,
z-order layout, table profile, semantic dedup).

Synthetic data is generated IN Spark and persisted so the measurement
is operator cost, not synthesis. Run:
    python scripts/scale_round2c.py [n_docs] [n_vecs]
Prints one timing line per check (paste into SCALING.md).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from meds_transforms_spark import get_spark  # noqa: E402


def timed(label, df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"{label}: {dt:.1f}s")
    return dt


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    spark = get_spark("scale_round2c")

    words = F.transform(
        F.sequence(F.lit(1), F.lit(60)),
        lambda i: F.concat(
            F.lit("w"),
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("id").cast("string"), F.lit(":"), i.cast("string"))),
                    1, 4,
                ),
                16, 10,
            ),
        ),
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", words).alias("text"),
        F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias("source"),
    ).persist()
    docs.count()

    from meds_transforms_spark.operators.text import gopher_quality_filter

    timed(
        f"gopher_quality_filter over {n_docs:,} docs",
        gopher_quality_filter(docs).select("doc_id", "gopher_pass"),
    )

    from meds_transforms_spark.operators.dsir import dsir_weights

    timed(
        f"dsir_weights (8k buckets, bigrams) over {n_docs:,} docs",
        dsir_weights(docs, "source IN ('src0','src1','src2')").select(
            "doc_id", "dsir_logweight"
        ),
    )

    from meds_transforms_spark.operators.profile import profile_table

    timed(f"profile_table approx over {n_docs:,} docs", profile_table(docs))

    from meds_transforms_spark.operators.layout import write_zordered, zorder_key

    rows = spark.range(n_docs * 10).select(
        F.col("id"),
        (F.col("id") % 9973).cast("double").alias("u"),
        F.floor(F.col("id") / 100).cast("double").alias("t"),
    ).persist()
    rows.count()
    timed(f"zorder_key over {n_docs * 10:,} rows", zorder_key(rows, ["u", "t"]))
    t0 = time.time()
    with tempfile.TemporaryDirectory() as d:
        write_zordered(rows, d + "/z", ["u", "t"], num_files=64)
        print(f"write_zordered 64 files over {n_docs * 10:,} rows: {time.time() - t0:.1f}s")

    vecs = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda j: (
                F.pmod(
                    F.xxhash64(F.col("id") % 5000, j), F.lit(1000)
                ).cast("double")
                / 500.0
                - 1.0
            ),
        ).alias("embedding"),
    ).persist()
    vecs.count()

    from meds_transforms_spark.operators.dedup import semantic_dedup

    # ids repeat every 5000 → dup groups of n_vecs/5000 → real dup mass;
    # 256 cells keep the within-cell pair join at ~n_vecs²/cells pairs
    timed(
        f"semantic_dedup 256 cells over {n_vecs:,} x 64-dim (5000 distinct vecs)",
        semantic_dedup(vecs, n_cells=256, threshold=0.99).select("vec_id"),
    )

    from meds_transforms_spark.operators.anomaly import rolling_anomaly

    ev = spark.range(n_docs * 10).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("t"), (F.col("id") % 50).cast("string")).alias("event_type"),
        F.timestamp_micros(F.lit(1704067200000000) + F.col("id") * 1000000).alias("ts"),
        (F.pmod(F.xxhash64("id"), F.lit(1000)).cast("double") / 10.0).alias("value"),
    ).persist()
    ev.count()
    timed(
        f"rolling_anomaly 1h windows over {n_docs * 10:,} events / 50 keys",
        rolling_anomaly(ev, keys="event_type", time_col="ts", value_col="value"),
    )

    from meds_transforms_spark.operators.tokenizer import bpe_encode, fit_bpe_merges

    t0 = time.time()
    merges = fit_bpe_merges(docs, num_merges=200)
    print(f"fit_bpe_merges 200 merges over {n_docs:,} docs: {time.time() - t0:.1f}s")
    timed(
        f"bpe_encode (200 merges) over {n_docs:,} docs",
        bpe_encode(docs, merges).select("doc_id", "n_bpe_tokens"),
    )

    from meds_transforms_spark.operators.ids import assign_stable_ids

    timed(
        f"assign_stable_ids over {n_docs * 10:,} rows",
        assign_stable_ids(rows, ["u", "t", "id"]),
    )


if __name__ == "__main__":
    main()
