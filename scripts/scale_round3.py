"""Scale spot-checks for the round-3 operators (winnowing, bigram LM,
ccnet buckets, shuffle shards, hash reshard).

Synthetic data is generated IN Spark and persisted so the measurement
is operator cost, not synthesis. Run:
    python scripts/scale_round3.py [n_docs] [n_rows]
Prints one timing line per check (paste into SCALING.md).
"""

from __future__ import annotations

import os
import sys
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
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    spark = get_spark("scale_round3")

    # ~60-word docs from a 16k-word zipf-ish vocabulary; 1% of docs embed
    # a fixed 8-word passage so overlap detection has planted signal.
    words = F.transform(
        F.sequence(F.lit(1), F.lit(60)),
        lambda i: F.concat(
            F.lit("w"),
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.col("id").cast("string"), F.lit(":"), i.cast("string"))
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ),
        ),
    )
    passage = "planted shared passage for winnow overlap detection check"
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.when(
                F.col("id") % 100 == 0,
                F.concat(F.concat_ws(" ", words), F.lit(" " + passage)),
            )
            .otherwise(F.concat_ws(" ", words))
            .alias("text"),
            F.concat(F.lit("l"), (F.col("id") % 4).cast("string")).alias("lang"),
        )
        .repartition(32)
        .persist()
    )
    print(f"docs: {docs.count():,}")

    from meds_transforms_spark.operators.winnow import (
        winnow_contains,
        winnow_fingerprints,
        winnow_overlap,
    )

    timed(f"winnow_fingerprints {n_docs:,} docs (k=10,w=8)", winnow_fingerprints(docs, k=10, w=8))
    timed(
        f"winnow_overlap {n_docs:,} docs (k=10,w=8,min_shared=5,max_df=1000)",
        winnow_overlap(docs, k=10, w=8, min_shared=5, max_df=1000),
    )
    probes = docs.filter(F.col("doc_id") % 1000 == 500).select(
        F.col("doc_id").alias("eval_id"), F.col("text")
    )
    timed(
        f"winnow_contains {n_docs:,} corpus x {n_docs // 1000} probes",
        winnow_contains(
            docs, probes, k=10, w=8, min_shared=3, max_df=1000,
            probe_id_col="eval_id",
        ),
    )

    from meds_transforms_spark.operators.lm import bigram_logprob, ccnet_buckets

    timed(f"bigram_logprob {n_docs:,} docs (self-fit)", bigram_logprob(docs))
    timed(f"ccnet_buckets {n_docs:,} docs / 4 langs", ccnet_buckets(docs))

    from meds_transforms_spark.operators.ids import shuffle_shards

    rows = spark.range(n_rows).select(F.col("id").alias("doc_id")).persist()
    print(f"rows: {rows.count():,}")
    timed(f"shuffle_shards {n_rows:,} rows -> 1024 shards", shuffle_shards(rows, 1024))

    from meds_transforms_spark.operators.reshard_to_split import reshard_to_split

    meds = spark.range(n_rows).select(
        (F.col("id") % (n_rows // 10)).alias("subject_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") % 86400).alias("time"),
        F.lit("C").alias("code"),
    )
    timed(
        f"reshard_to_split hash mode {n_rows:,} rows / {n_rows // 10:,} subjects",
        reshard_to_split(meds, method="hash"),
    )


def extra(n_docs: int = 200_000) -> None:
    """Round-3b spot-checks: corpus_diff and the ccnet e2e composition.
    Run: python -c "import scripts.scale_round3 as s; s.extra()" or
    python scripts/scale_round3.py extra [n_docs]."""
    spark = get_spark("scale_round3b")
    words = F.transform(
        F.sequence(F.lit(1), F.lit(60)),
        lambda i: F.concat(
            F.lit("the w"),
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.col("id").cast("string"), F.lit(":"), i.cast("string"))
                    ),
                    1,
                    3,
                ),
                16,
                10,
            ),
        ),
    )
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", words).alias("text"),
            F.concat(F.lit("l"), (F.col("id") % 4).cast("string")).alias("lang"),
            F.concat(F.lit("s"), (F.col("id") % 8).cast("string")).alias("source"),
        )
        .repartition(32)
        .persist()
    )
    print(f"docs: {docs.count():,}")

    from meds_transforms_spark.operators.diff import corpus_diff

    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    timed(f"corpus_diff {n_docs:,} x {n_docs:,} docs", corpus_diff(old, new))

    from meds_transforms_spark.plans.corpus import curate_corpus_ccnet

    probes = docs.filter(F.col("doc_id") % 997 == 3)
    timed(
        f"curate_corpus_ccnet e2e {n_docs:,} docs, {n_docs // 997} probes",
        curate_corpus_ccnet(
            docs, probes,
            gopher_kwargs={"min_words": 20, "min_required_stopwords": 1},
            winnow_k=12, min_shared=10,
        ),
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "extra":
        extra(int(sys.argv[2]) if len(sys.argv) > 2 else 200_000)
    else:
        main()
