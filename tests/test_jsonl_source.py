"""Tests for the JSONL corpus source (sources/jsonl_corpus)."""

from __future__ import annotations

import gzip
import json


def _write_lines(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_good_and_quarantine_split(spark, tmp_path):
    from meds_transforms_spark.sources.jsonl_corpus import (
        ingest_report,
        read_jsonl_corpus,
    )

    lines = [
        json.dumps({"doc_id": 1, "text": "hello world", "lang": "en", "source": "a"}),
        json.dumps({"doc_id": 2, "text": "zwei", "lang": "de"}),      # missing keys → NULL
        '{"doc_id": 3, "text": "broken',                               # malformed
        "not json at all",                                             # malformed
        json.dumps({"doc_id": 4, "text": None, "source": "b"}),        # null text ok
    ]
    _write_lines(tmp_path / "drop.jsonl", lines)
    good, quar = read_jsonl_corpus(spark, str(tmp_path / "drop.jsonl"))
    rows = {r.doc_id: r for r in good.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1].n_chars == 11
    assert rows[2].source is None          # missing key → NULL, row kept
    assert rows[4].n_chars is None         # null text preserved
    rep = ingest_report(quar)
    assert rep["n_corrupt"] == 2
    assert any("broken" in s for s in rep["samples"])


def test_gzip_drop_and_repartition(spark, tmp_path):
    from meds_transforms_spark.sources.jsonl_corpus import read_jsonl_corpus

    lines = [
        json.dumps({"doc_id": i, "text": f"doc {i}", "lang": "en", "source": "gz"})
        for i in range(100)
    ]
    with gzip.open(tmp_path / "drop.jsonl.gz", "wt") as f:
        f.write("\n".join(lines))
    good, quar = read_jsonl_corpus(
        spark, str(tmp_path / "drop.jsonl.gz"), repartition_to=6
    )
    assert good.count() == 100 and quar.count() == 0
    assert good.rdd.getNumPartitions() == 6


def test_downstream_operators_apply_unchanged(spark, tmp_path):
    from meds_transforms_spark.operators.text import gopher_quality_filter
    from meds_transforms_spark.sources.jsonl_corpus import read_jsonl_corpus

    lines = [
        json.dumps({"doc_id": i, "text": "the quick brown fox and the dog", "source": "s"})
        for i in range(10)
    ]
    _write_lines(tmp_path / "d.jsonl", lines)
    good, _ = read_jsonl_corpus(spark, str(tmp_path / "d.jsonl"))
    out = gopher_quality_filter(good, min_words=3, min_required_stopwords=1)
    assert out.filter("rule_word_count AND rule_stopwords").count() == 10


def test_curate_cli_end_to_end(spark, tmp_path):
    """`python -m meds_transforms_spark curate`: JSONL drop → quarantine
    split → YAML stage pipeline → parquet, driven in-process."""
    import json

    from meds_transforms_spark.__main__ import main

    lines = [
        json.dumps({"doc_id": 1, "text": "the quick brown fox and the dog ran home today", "source": "tgt"}),
        json.dumps({"doc_id": 2, "text": "tiny", "source": "raw"}),
        "corrupt {not json",
        json.dumps({"doc_id": 3, "text": "all of the words that have to be here and more beyond", "source": "raw"}),
    ]
    (tmp_path / "drop.jsonl").write_text("\n".join(lines) + "\n")
    (tmp_path / "pipe.yaml").write_text(
        """
stages:
  - gopher_quality_filter: {min_words: 8, min_required_stopwords: 1}
  - filter_rows: {matcher: {gopher_pass: true}}
  - dsir_weights: {target: "source = 'tgt'", n_buckets: 64}
"""
    )
    rc = main([
        "curate", str(tmp_path / "pipe.yaml"),
        "--input", str(tmp_path / "drop.jsonl"),
        "--output", str(tmp_path / "out"),
        "--quarantine", str(tmp_path / "quar"),
    ])
    assert rc == 0
    out = spark.read.parquet(str(tmp_path / "out"))
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert ids == {1, 3}                                  # doc 2 filtered
    assert "dsir_logweight" in out.columns
    quar = spark.read.parquet(str(tmp_path / "quar"))
    assert quar.count() == 1
