"""chunk_documents unit tests."""

from __future__ import annotations

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunking_with_overlap_covers_all_tokens(spark):
    from meds_transforms_spark.operators.text import chunk_documents

    words = [f"w{i}" for i in range(25)]
    df = _docs(spark, [(1, " ".join(words))])
    out = sorted(
        chunk_documents(df, max_tokens=10, overlap=3).collect(),
        key=lambda r: r.chunk_id,
    )
    # step 7: chunks start at 0, 7, 14, 21 → 4 chunks
    assert [r.chunk_id for r in out] == [0, 1, 2, 3]
    assert out[0].chunk_text == " ".join(words[0:10])
    assert out[1].chunk_text == " ".join(words[7:17])
    assert out[3].chunk_text == " ".join(words[21:25])  # short tail
    assert out[3].chunk_tokens == 4
    # consecutive chunks share exactly `overlap` tokens
    assert out[0].chunk_text.split()[-3:] == out[1].chunk_text.split()[:3]
    # every token appears somewhere
    seen = {t for r in out for t in r.chunk_text.split()}
    assert seen == set(words)


def test_short_doc_single_chunk(spark):
    from meds_transforms_spark.operators.text import chunk_documents

    df = _docs(spark, [(1, "  a   b  c ")])
    out = chunk_documents(df, max_tokens=10).collect()
    assert len(out) == 1
    assert out[0].chunk_id == 0
    assert out[0].chunk_text == "a b c"  # whitespace normalized
    assert out[0].chunk_tokens == 3


def test_null_and_empty_docs_keep_one_row(spark):
    from meds_transforms_spark.operators.text import chunk_documents

    df = _docs(spark, [(1, None), (2, "")])
    out = {r.doc_id: r for r in chunk_documents(df, max_tokens=4).collect()}
    assert set(out) == {1, 2}
    for r in out.values():
        assert r.chunk_id == 0
        assert r.chunk_text is None
        assert r.chunk_tokens == 0


def test_exact_boundary_no_empty_tail_chunk(spark):
    from meds_transforms_spark.operators.text import chunk_documents

    df = _docs(spark, [(1, " ".join(f"t{i}" for i in range(20)))])
    out = chunk_documents(df, max_tokens=10, overlap=0).collect()
    assert len(out) == 2
    assert all(r.chunk_tokens == 10 for r in out)


def test_invalid_params_raise(spark):
    from meds_transforms_spark.operators.text import chunk_documents

    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=5, overlap=5)
