"""fit_unigram_lm / unigram_logprob unit tests."""

from __future__ import annotations

import math

import pytest


def test_fit_unigram_lm_counts(spark):
    from meds_transforms_spark.operators.text import fit_unigram_lm

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "B c")], "doc_id long, text string"
    )
    counts = {r.tok: r.n for r in fit_unigram_lm(df).collect()}
    assert counts == {"a": 2, "b": 2, "c": 1}  # lowercased


def test_unigram_logprob_self_fit_exact(spark):
    from meds_transforms_spark.operators.text import unigram_logprob

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, None)], "doc_id long, text string"
    )
    # corpus counts: a=2, b=2, c=1, N=5
    out = {r.doc_id: r.avg_logprob for r in unigram_logprob(df).collect()}
    exp1 = (2 * math.log(2 / 5) + math.log(2 / 5)) / 3
    exp2 = (math.log(2 / 5) + math.log(1 / 5)) / 2
    assert out[1] == pytest.approx(exp1)
    assert out[2] == pytest.approx(exp2)
    assert out[3] is None


def test_unigram_logprob_external_lm_with_smoothing(spark):
    from meds_transforms_spark.operators.text import unigram_logprob

    lm = spark.createDataFrame([("the", 9), ("cat", 1)], "tok string, n long")
    df = spark.createDataFrame(
        [(1, "the the"), (2, "zebra")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.avg_logprob
        for r in unigram_logprob(df, lm=lm, alpha=1.0).collect()
    }
    # N=10, V=2: p(the) = 10/12, p(zebra OOV) = 1/12
    assert out[1] == pytest.approx(math.log(10 / 12))
    assert out[2] == pytest.approx(math.log(1 / 12))


def test_unigram_logprob_external_lm_requires_smoothing(spark):
    from meds_transforms_spark.operators.text import unigram_logprob

    lm = spark.createDataFrame([("a", 1)], "tok string, n long")
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="alpha"):
        unigram_logprob(df, lm=lm)


def test_unigram_logprob_gibberish_scores_below_prose(spark):
    from meds_transforms_spark.operators.text import unigram_logprob

    prose = "the cat sat on the mat and the dog sat on the rug"
    df = spark.createDataFrame(
        [(i, prose) for i in range(5)] + [(99, "xq zv qqj wqx plk")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.avg_logprob for r in unigram_logprob(df).collect()}
    assert out[99] < out[0]


def test_token_pmi_exact(spark):
    import math

    from meds_transforms_spark.operators.text import token_pmi

    # 4 docs: (a,b) always together -> strong positive PMI;
    # (a,c) never together -> pair absent entirely.
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b x"), (3, "c x"), (4, "c y")],
        "doc_id long, text string",
    )
    out = {
        (r.tok_a, r.tok_b): r
        for r in token_pmi(df, min_pair_docs=1, round_to=None).collect()
    }
    ab = out[("a", "b")]
    assert (ab.n_ab, ab.df_a, ab.df_b) == (2, 2, 2)
    assert ab.pmi == pytest.approx(math.log(2 * 4 / (2 * 2)))
    assert ("a", "c") not in out
    cx = out[("c", "x")]
    assert cx.pmi == pytest.approx(math.log(1 * 4 / (2 * 2)))


def test_token_pmi_doc_token_guard(spark):
    from meds_transforms_spark.operators.text import token_pmi

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b")], "doc_id long, text string"
    )
    out = token_pmi(df, min_pair_docs=1, max_doc_tokens=3).collect()
    # doc 1 (6 distinct tokens) dropped by the guard; only doc 2's pair left
    assert {(r.tok_a, r.tok_b) for r in out} == {("a", "b")}


def test_corpus_report_per_source(spark):
    from meds_transforms_spark.operators.text import corpus_report

    rows = [
        (1, "srcA", "the cat and the dog"),     # en
        (2, "srcA", "the cat and the dog"),     # exact dup of 1
        (3, "srcA", "der hund ist nicht da"),   # de
        (4, "srcB", "le chat est pour la vie"), # fr
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.source: r for r in corpus_report(df).collect()}
    a = out["srcA"]
    assert (a.n_docs, a.n_exact_dups) == (3, 1)
    assert a.dup_rate == pytest.approx(1 / 3)
    assert a.n_tokens == 5 + 5 + 5
    assert a.top_lang == "en"
    b = out["srcB"]
    assert (b.n_docs, b.n_exact_dups, b.top_lang) == (1, 0, "fr")
