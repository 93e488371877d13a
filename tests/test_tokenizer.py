"""Tests for the BPE tokenizer (operators/tokenizer)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def test_learn_merges_classic_example():
    """The Sennrich toy corpus: {low, lower, newest, widest} — the
    first merges must assemble the common suffixes."""
    from meds_transforms_spark.operators.tokenizer import learn_merges

    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = learn_merges(freqs, 10)
    assert merges[0] == ("e", "s")       # 'es' appears 9 times
    assert ("es", "t</w>") in merges or ("est", "</w>") not in merges
    # 'low' must eventually be one token
    from meds_transforms_spark.operators.tokenizer import encode_word

    ranks = {p: i for i, p in enumerate(learn_merges(freqs, 50))}
    assert encode_word("low", ranks) == ["low</w>"]
    assert encode_word("newest", ranks) == ["newest</w>"]


def test_encode_word_roundtrip_property():
    from meds_transforms_spark.operators.tokenizer import (
        EOW,
        encode_word,
        learn_merges,
    )

    freqs = {"hello": 10, "help": 7, "hero": 4, "shell": 2}
    ranks = {p: i for i, p in enumerate(learn_merges(freqs, 30))}

    @settings(max_examples=50, deadline=None)
    @given(st.text(alphabet="helorspx", min_size=1, max_size=12))
    def check(word):
        toks = encode_word(word, ranks)
        assert "".join(toks).replace(EOW, "") == word  # lossless
        assert toks[-1].endswith(EOW)

    check()


def test_fit_and_encode_on_spark(spark):
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.tokenizer import (
        bpe_encode,
        encode_word,
        fit_bpe_merges,
    )

    docs = spark.createDataFrame(
        [(1, "the lowest tower in the town"), (2, "lower and lower it went"), (3, None)],
        "doc_id long, text string",
    )
    merges = fit_bpe_merges(docs, num_merges=40)
    out = {r.doc_id: r for r in bpe_encode(docs, merges).collect()}
    # distributed encode must equal the driver-side reference encode
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    expect = []
    for w in "the lowest tower in the town".split():
        expect.extend(encode_word(w, ranks))
    assert list(out[1].bpe_tokens) == expect
    assert out[1].n_bpe_tokens == len(expect)
    assert out[3].bpe_tokens is None and out[3].n_bpe_tokens == 0
    # frequent whole words collapse to single tokens
    assert "the</w>" in out[1].bpe_tokens


def test_fit_is_deterministic(spark):
    from meds_transforms_spark.operators.tokenizer import fit_bpe_merges

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma alpha beta alpha") for i in range(20)],
        "doc_id long, text string",
    ).repartition(7)
    m1 = fit_bpe_merges(docs, num_merges=25)
    m2 = fit_bpe_merges(docs.repartition(3), num_merges=25)
    assert m1 == m2


def test_incremental_fit_matches_brute_force():
    """The inverted-index incremental trainer must produce EXACTLY the
    brute-force (full-rescan) merge sequence on random vocabularies."""
    import random

    from meds_transforms_spark.operators.tokenizer import (
        _word_symbols,
        learn_merges,
    )

    def brute(word_freqs, num_merges):
        vocab = {_word_symbols(w): c for w, c in word_freqs.items() if w}
        merges = []
        for _ in range(num_merges):
            pairs = {}
            for syms, c in vocab.items():
                for p in zip(syms, syms[1:]):
                    pairs[p] = pairs.get(p, 0) + c
            if not pairs:
                break
            top = max(pairs.values())
            best = min(
                (p for p, n in pairs.items() if n == top),
                key=lambda p: (len(p[0] + p[1]), p),
            )
            merges.append(best)
            a, b = best
            ab = a + b
            nv = {}
            for syms, c in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(ab)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                nv[tuple(out)] = nv.get(tuple(out), 0) + c
            vocab = nv
        return merges

    for seed in range(3):
        random.seed(seed)
        freqs = {
            "".join(random.choices("abcde", k=random.randint(1, 8))): random.randint(1, 50)
            for _ in range(300)
        }
        assert learn_merges(freqs, 60) == brute(freqs, 60), seed


def test_bpe_encode_overwrites_existing_token_columns(spark):
    """Composing after text_stats (which already adds an n_bpe_tokens
    estimate) must overwrite, not duplicate, the column."""
    from meds_transforms_spark.operators.text import text_stats
    from meds_transforms_spark.operators.tokenizer import bpe_encode, fit_bpe_merges

    docs = spark.createDataFrame(
        [(1, "the lowest tower in the town")], "doc_id long, text string"
    )
    staged = text_stats(docs)
    merges = fit_bpe_merges(docs, num_merges=20)
    out = bpe_encode(staged, merges)
    assert out.columns.count("n_bpe_tokens") == 1
    row = out.collect()[0]
    assert row.n_bpe_tokens == len(row.bpe_tokens)  # the REAL count won
