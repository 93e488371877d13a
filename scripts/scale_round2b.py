"""Scale spot-checks for the round-2b operators (substring dedup,
domain_mix, unigram LM, classifier serving, covariance/PCA, retention).

Synthetic data is generated IN Spark (spark.range + codegen exprs) so
the measurement is operator cost, not ingest. Run:
    python scripts/scale_round2b.py [n_docs]
Appends nothing; prints one timing line per check (paste into
SCALING.md).
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
    spark = get_spark("scale_round2b")

    # ~40-word docs; every 10th is a near-copy of doc (id - id%10).
    words = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda i: F.concat(
            F.lit("w"),
            F.conv(
                F.substring(F.md5(F.concat((F.col("id") - F.col("id") % 10).cast("string"), F.lit(":"), i.cast("string"))), 1, 4),
                16, 10,
            ),
        ),
    )
    # persist: the md5-heavy generator must not be re-evaluated on
    # each operator scan — the timing is the operator, not synthesis.
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", words).alias("text"),
        F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias("source"),
    ).persist()
    docs.count()

    from meds_transforms_spark.operators.substring import duplicated_span_stats

    timed(
        f"duplicated_span_stats k=20 stride=4 over {n_docs:,} docs",
        duplicated_span_stats(docs, k=20, stride=4).select(
            "doc_id", "n_dup_positions"
        ),
    )

    from meds_transforms_spark.operators.sampling import domain_mix

    timed(
        f"domain_mix (20 sources, 1M-token budget) over {n_docs:,} docs",
        domain_mix(docs, {f"src{i}": 0.05 for i in range(20)}, 1_000_000),
    )

    from meds_transforms_spark.operators.text import unigram_logprob

    timed(f"unigram_logprob self-fit over {n_docs:,} docs", unigram_logprob(docs))

    from meds_transforms_spark.operators.classifier import (
        demo_weights,
        hashed_linear_score,
    )

    timed(
        f"hashed_linear_score (4096 buckets) over {n_docs:,} docs",
        hashed_linear_score(docs, demo_weights(spark, 4096)),
    )

    n_vec = max(n_docs * 5, 1_000_000)
    emb = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: F.sin(F.col("id") * i.cast("double") * 0.7),
        ).alias("embedding"),
    ).persist()
    emb.count()
    from meds_transforms_spark.operators.linalg import embedding_covariance, pca_fit

    timed(f"embedding_covariance over {n_vec:,} × 64-dim", embedding_covariance(emb))
    t0 = time.time()
    comps, evar, mean = pca_fit(emb, k=8)
    print(f"pca_fit k=8 over {n_vec:,} × 64-dim: {time.time() - t0:.1f}s")

    n_ev = max(n_docs * 50, 10_000_000)
    ev = spark.range(n_ev).select(
        (F.col("id") % 100_000).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + F.pmod(F.xxhash64("id"), F.lit(86_400 * 180))
        ).alias("ts"),
    )
    from meds_transforms_spark.operators.retention import cohort_retention

    timed(
        f"cohort_retention weekly over {n_ev:,} events / 100k users",
        cohort_retention(ev, period="week"),
    )


if __name__ == "__main__":
    main()
