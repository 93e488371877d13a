"""ngram_decontaminate — benchmark-overlap flagging/dropping."""

from __future__ import annotations

import pytest


@pytest.fixture()
def corpora(spark):
    train = spark.createDataFrame(
        [
            # Verbatim copy of eval doc 100 (13+ shared words).
            (1, "the quick brown fox jumps over the lazy dog while the cat sleeps peacefully nearby"),
            # Shares a 13-gram span with eval doc 101 despite a changed tail.
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu DIFFERENT ending"),
            # No overlap at all.
            (3, "completely unrelated text with no shared content whatsoever in any window of words here"),
            # Short doc, exact match of short eval doc (whole-text gram).
            (4, "short match"),
            # Short doc, no match.
            (5, "short miss"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog while the cat sleeps peacefully nearby"),
            (101, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron"),
            (102, "short match"),
        ],
        "doc_id long, text string",
    )
    return train, eval_df


def test_flag_and_drop_modes(spark, corpora):
    from meds_transforms_spark.operators.decontaminate import ngram_decontaminate

    train, eval_df = corpora
    flagged = {
        r.doc_id: r.contaminated
        for r in ngram_decontaminate(train, eval_df, n=13).collect()
    }
    assert flagged == {1: True, 2: True, 3: False, 4: True, 5: False}

    kept = {
        r.doc_id
        for r in ngram_decontaminate(train, eval_df, n=13, mode="drop").collect()
    }
    assert kept == {3, 5}

    with pytest.raises(ValueError, match="mode"):
        ngram_decontaminate(train, eval_df, mode="purge")


def test_normalization_and_case_insensitivity(spark, corpora):
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.decontaminate import ngram_decontaminate

    train, eval_df = corpora
    shouty = train.withColumn("text", F.upper("text"))
    flagged = {
        r.doc_id: r.contaminated
        for r in ngram_decontaminate(shouty, eval_df, n=13).collect()
    }
    assert flagged[1] is True and flagged[3] is False


def test_plan_broadcasts_eval_side(spark, corpora):
    """The eval gram-hash set must reach the training stream as a
    broadcast (map-side semi probe) — the 100 TB-critical property."""
    from meds_transforms_spark.operators.decontaminate import ngram_decontaminate

    train, eval_df = corpora
    plan = (
        ngram_decontaminate(train, eval_df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_blank_docs_never_contaminate(spark):
    """Regression: NULL/empty docs hashed their NULL/empty token slice
    to the xxhash64 seed constant, so one blank eval row flagged every
    blank training doc as contaminated."""
    from meds_transforms_spark.operators.decontaminate import ngram_decontaminate

    train = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "real shared overlap text here")],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(10, None), (11, ""), (12, "real shared overlap text here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.contaminated for r in ngram_decontaminate(train, evals, n=5).collect()}
    assert out == {1: False, 2: False, 3: True}


def test_ids_mode_matches_flag_mode(spark):
    """mode='ids' returns exactly the ids flag-mode marks contaminated
    — one column, no join-back (round-8 scale-output mode)."""
    from meds_transforms_spark.operators.decontaminate import ngram_decontaminate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    eval_df = docs.filter((docs.doc_id % 7) == 0)
    flagged = {
        r.doc_id
        for r in ngram_decontaminate(docs, eval_df, n=5, mode="flag")
        .filter("contaminated")
        .collect()
    }
    out = ngram_decontaminate(docs, eval_df, n=5, mode="ids")
    assert out.columns == ["doc_id"]
    ids = {r.doc_id for r in out.collect()}
    assert ids == flagged and ids
