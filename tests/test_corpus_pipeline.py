"""Composed training-corpus pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_prepare_training_corpus(spark, tmp_path):
    from meds_transforms_spark.plans.corpus import (
        prepare_training_corpus,
        write_training_corpus,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and that is for sure "
        "a long enough document with many words in it to pass the filters "
    ) * 3
    rows = [
        (1, base),
        (2, base),                      # exact dup → dropped
        (3, base + "slightly changed"),  # near dup → dropped by LSH
        (4, "short"),                    # too few tokens → dropped
        (5, "word " * 40),               # low stopword/quality signal
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_training_corpus(
        docs, min_quality=0.3, min_tokens=10, near_dedup=True
    )
    got = {r.doc_id: r for r in out.collect()}
    assert 1 in got
    assert 2 not in got
    assert 3 not in got
    assert 4 not in got
    r = got[1]
    assert r.n_tokens > 30 and 0 <= r.quality <= 1 and r.lang_pred == "en"
    assert isinstance(r.fingerprint, int)
    assert 0 <= r.quality_bucket <= 9

    path = str(tmp_path / "corpus")
    write_training_corpus(out, path)
    back = spark.read.parquet(path)
    assert back.count() == out.count()
    # Partition pruning on the export layout.
    plan = (
        back.filter(F.col("lang_pred") == "en")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(lang_pred" in plan
