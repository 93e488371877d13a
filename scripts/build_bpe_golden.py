"""Build the golden BPE token-count table for the docs_bpe_tokens oracle.

The BPE merge loop has no relational form, so the driver's DuckDB
oracle cannot recompute it from SQL. Instead, this script produces a
golden ``(corpus_chars, doc_id, n_bpe_tokens)`` parquet — one row per
document per scale factor — computed by an INDEPENDENT pure-python
pipeline:

- word frequencies via ``collections.Counter`` over ``re.findall``
  (independent of the engine's explode + groupBy count), with the same
  top-``max_words`` (n desc, word asc) ordering;
- merges via :func:`learn_merges` (driver-side pure python in both
  paths — not a distributed component);
- per-word encode by applying merges SEQUENTIALLY IN RANK ORDER (the
  classic Sennrich formulation), independent of the engine's
  GPT-2-style lowest-rank-first loop in :func:`encode_word` — the two
  are equivalent by construction, so agreement here cross-checks both.

``corpus_chars`` (total text length of the corpus) discriminates the
scale factor inside static oracle SQL: sf0.001 and sf0.01 both have
500 docs, but their total char counts differ, so the oracle selects
the right golden slice with a scalar subquery on the live corpus.

Run: ``python scripts/build_bpe_golden.py`` (re-run only if the
testdata or the tokenizer's fit parameters change).
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from meds_transforms_spark.operators.tokenizer import (  # noqa: E402
    PRETOKEN_REGEX,
    _word_symbols,
    learn_merges,
)

NUM_MERGES = 60  # matches q_docs_bpe_tokens
MAX_WORDS = 1_000_000


def encode_word_sequential(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Classic BPE encode: apply each merge rule, in learned order, to
    the symbol sequence. Independent of tokenizer.encode_word's
    lowest-rank-first loop (the two formulations are equivalent)."""
    syms = list(_word_symbols(word))
    for a, b in merges:
        out, j = [], 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
        if len(syms) == 1:
            break
    return syms


def golden_for_sf(sf_dir: str) -> tuple[int, list[tuple[int, int]]]:
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    pat = re.compile(PRETOKEN_REGEX)
    corpus_chars = sum(len(t) for _, t in rows if t is not None)

    counts: Counter[str] = Counter()
    for _, text in rows:
        if text is not None:
            counts.update(pat.findall(text.lower()))
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:MAX_WORDS]
    merges = learn_merges(dict(top), NUM_MERGES)

    word_tokens: dict[str, int] = {}
    out = []
    for doc_id, text in rows:
        if text is None:
            out.append((doc_id, 0))
            continue
        n = 0
        for w in pat.findall(text.lower()):
            k = word_tokens.get(w)
            if k is None:
                k = len(encode_word_sequential(w, merges))
                word_tokens[w] = k
            n += k
        out.append((doc_id, n))
    return corpus_chars, out


def main() -> None:
    root = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
    dest = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
    os.makedirs(dest, exist_ok=True)
    cc, dids, toks = [], [], []
    for sf in ["sf0.001", "sf0.01", "sf0.1"]:
        sf_dir = os.path.join(root, sf)
        if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
            continue
        chars, rows = golden_for_sf(sf_dir)
        print(f"{sf}: corpus_chars={chars}, docs={len(rows)}")
        for d, n in rows:
            cc.append(chars)
            dids.append(d)
            toks.append(n)
    table = pa.table(
        {
            "corpus_chars": pa.array(cc, type=pa.int64()),
            "doc_id": pa.array(dids, type=pa.int64()),
            "n_bpe_tokens": pa.array(toks, type=pa.int64()),
        }
    )
    out_path = os.path.join(dest, "bpe_tokens_golden.parquet")
    pq.write_table(table, out_path)
    print(f"wrote {out_path}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
