"""duplicated_span_stats / filter_duplicated_spans unit tests."""

from __future__ import annotations

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicated_span_coverage_exact(spark):
    from meds_transforms_spark.operators.substring import duplicated_span_stats

    shared = "the quick brown fox jumps over the lazy dog"  # 43 chars
    df = _docs(
        spark,
        [
            (1, shared + " alpha unique tail one"),
            (2, shared + " totally different ending here"),
            (3, "no overlap with anything else at all ok"),
            (4, "tiny"),  # shorter than k -> no positions
        ],
    )
    out = {
        r.doc_id: r
        for r in duplicated_span_stats(df, k=20, stride=1).collect()
    }
    # doc 1/2 share a 44-char prefix (43 chars + the space before the
    # tails): k-grams starting at pos 1..25 are shared (25 = 44 - 20 +
    # 1); every later gram crosses into the unique tails.
    assert out[1].n_dup_positions == 25
    assert out[2].n_dup_positions == 25
    assert out[3].n_dup_positions == 0
    assert out[4].n_positions == 0 and out[4].n_dup_positions == 0
    assert out[4].dup_fraction is None
    assert out[1].n_positions == len(out[1].text) - 19
    assert out[1].dup_fraction == pytest.approx(25 / out[1].n_positions)


def test_stride_sampling_counts_every_kth_position(spark):
    from meds_transforms_spark.operators.substring import duplicated_span_stats

    text = "abcdefghij" * 6  # 60 chars
    df = _docs(spark, [(1, text), (2, text)])
    out = duplicated_span_stats(df, k=10, stride=5).collect()
    for r in out:
        # positions 1,6,11,...,51 -> 11 sampled, all duplicated
        assert r.n_positions == 11
        assert r.n_dup_positions == 11
        assert r.dup_fraction == 1.0


def test_within_doc_repeats_do_not_count_as_duplication(spark):
    from meds_transforms_spark.operators.substring import duplicated_span_stats

    df = _docs(spark, [(1, "repeat me repeat me repeat me repeat me")])
    out = duplicated_span_stats(df, k=10, stride=1).collect()[0]
    # min_df counts DISTINCT documents, so a single doc repeating
    # itself is not corpus duplication.
    assert out.n_dup_positions == 0


def test_filter_duplicated_spans_drops_heavy_docs_keeps_short(spark):
    from meds_transforms_spark.operators.substring import filter_duplicated_spans

    boiler = "all rights reserved copyright notice " * 3
    df = _docs(
        spark,
        [
            (1, boiler + "x"),
            (2, boiler + "y"),
            (3, "a genuinely original document body with plenty of words"),
            (4, "tiny"),
        ],
    )
    kept = {r.doc_id for r in filter_duplicated_spans(df, max_dup_fraction=0.5, k=20).collect()}
    assert kept == {3, 4}


def test_md5_mode_matches_xxhash_mode(spark):
    from meds_transforms_spark.operators.substring import duplicated_span_stats

    df = _docs(
        spark,
        [(1, "shared shared shared prefix body one"), (2, "shared shared shared prefix body two")],
    )
    a = {
        (r.doc_id, r.n_positions, r.n_dup_positions)
        for r in duplicated_span_stats(df, k=12).collect()
    }
    b = {
        (r.doc_id, r.n_positions, r.n_dup_positions)
        for r in duplicated_span_stats(df, k=12, hash_fn="md5_60").collect()
    }
    assert a == b


def _python_span_stats(texts: dict, k: int, stride: int, min_df: int):
    """Brute-force reference for duplicated_span_stats."""
    import re

    norm = {
        i: re.sub(r"\s+", " ", t.strip().lower()) for i, t in texts.items() if t is not None
    }
    grams = {
        i: [t[p : p + k] for p in range(0, max(len(t) - k + 1, 0), stride)]
        for i, t in norm.items()
    }
    df_docs = {}
    for i, gs in grams.items():
        for g in set(gs):
            df_docs[g] = df_docs.get(g, 0) + 1
    out = {}
    for i, gs in grams.items():
        n = len(gs)
        nd = sum(1 for g in gs if df_docs[g] >= min_df)
        out[i] = (n, nd)
    return out


@pytest.mark.parametrize("min_df", [2, 3])
def test_span_stats_both_topologies_match_python(spark, min_df):
    """min_df<=2 runs the skew-immune unique-complement topology,
    min_df>2 the join topology — both must match a brute-force python
    reference on data exercising shared, unique, and repeated grams."""
    from meds_transforms_spark.operators.substring import duplicated_span_stats

    texts = {
        1: "the quick brown fox jumps over the lazy dog again and again",
        2: "the quick brown fox naps under the lazy dog again and again",
        3: "the quick brown fox jumps over the lazy dog again and again",
        4: "completely unrelated text with no shared spans whatsoever xyz",
        5: "short",
        6: None,
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    k, stride = 10, 3
    ref = _python_span_stats(texts, k, stride, min_df)
    got = {
        r.doc_id: (r.n_positions, r.n_dup_positions)
        for r in duplicated_span_stats(df, k=k, stride=stride, min_df=min_df).collect()
    }
    for i in texts:
        exp = ref.get(i, (0, 0))
        assert got[i] == exp, f"doc {i} min_df={min_df}: {got[i]} != {exp}"
