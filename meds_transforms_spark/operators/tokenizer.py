"""Byte-pair-encoding tokenizer: distributed fit + Arrow-batched encode.

The one text primitive the regex pre-tokenizer only approximates:
actual subword tokenization, the unit every mixing / packing / budget
decision downstream really wants to count.

Public algorithm (Sennrich et al. 2016; the GPT-2 reference
implementation popularized the word-frequency formulation):

- **fit** learns merge rules from the corpus's WORD-FREQUENCY table,
  not the raw corpus: counting words is one distributed explode +
  groupBy (shuffle rows are (word, count)); the top-``max_words``
  table is Zipf-tiny relative to the corpus (1M rows ≈ tens of MB for
  100 TB of text) and the merge loop runs over it in memory — the
  same shape every production BPE trainer uses.
- **encode** ships the merge ranks to executors (Arrow-batched
  ``mapInPandas`` — this is the documented slow path, but merges are
  inherently sequential per word so no relational form exists) and
  memoizes per distinct word within each batch, so the per-row cost
  collapses to a dict lookup for all but first occurrences.

UDF-boundary note: encode is the package's ONLY Pandas-UDF hot path
besides the multimodal decoders; everything feeding it (pre-tokenize,
word counts) and consuming it (explode, counts, packing) stays JVM-side.
"""

from __future__ import annotations

from typing import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage

#: GPT-2-shaped pre-tokenizer (simplified public idiom, shared with
#: text.TOKEN_REGEX): word pieces, numbers, or single symbols.
PRETOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: End-of-word marker (Sennrich-style), so "low" the word and "low" the
#: prefix of "lower" learn distinct merges.
EOW = "</w>"


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + EOW,)


def learn_merges(word_freqs: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word→count table (pure python;
    the table is vocabulary-sized, not corpus-sized). Ties on pair
    frequency break by shortest merged string then lexicographically —
    deterministic regardless of dict order.

    Incremental: pair counts and a pair→words inverted index are
    maintained across rounds, so each merge touches only the words that
    CONTAIN the merged pair (per Zipf, a shrinking minority) instead of
    rescanning the whole vocabulary — the standard trainer optimization
    (~10× at 200 merges over a 150k-word table)."""
    words = [list(_word_symbols(w)) for w in word_freqs if w]
    counts = [c for w, c in word_freqs.items() if w]

    pairs: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        c = counts[i]
        for p in zip(syms, syms[1:]):
            pairs[p] = pairs.get(p, 0) + c
            where.setdefault(p, set()).add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = {p: n for p, n in pairs.items() if n > 0}
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
        for i in list(where.get(best, ())):
            syms, c = words[i], counts[i]
            # retract this word's pair contributions, rewrite, re-add
            for p in zip(syms, syms[1:]):
                pairs[p] -= c
                s = where.get(p)
                if s is not None:
                    s.discard(i)
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(ab)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            for p in zip(out, out[1:]):
                pairs[p] = pairs.get(p, 0) + c
                where.setdefault(p, set()).add(i)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word: repeatedly merge the lowest-rank
    adjacent pair (the GPT-2 encode loop)."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


@register_stage("fit_bpe_merges")
def fit_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_words: int = 1_000_000,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus.

    Distributed part: pre-tokenize + word-frequency groupBy (one
    shuffle of (word, count) pairs). Driver part: the merge loop over
    the top-``max_words`` table — bounded memory by construction (the
    collect is the word table, NEVER corpus rows; reference pattern:
    every production BPE trainer materializes word frequencies first).
    """
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    words = (
        df.select(F.explode(F.regexp_extract_all(c, F.lit(PRETOKEN_REGEX), F.lit(0))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w"))
        .limit(int(max_words))
    )
    freqs = {r.w: r.n for r in words.collect()}
    return learn_merges(freqs, num_merges)


@register_stage("bpe_encode")
def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]] | Iterable[tuple[str, str]],
    text_col: str = "text",
    output_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Encode ``text_col`` into subword tokens with a fitted merge list.

    Arrow-batched ``mapInPandas``: merge ranks ride the closure (a
    plain dict — no model join, no shuffle), and a per-batch word cache
    memoizes segmentation so Zipf makes the amortized cost per token a
    dict hit. Output adds ``output_col`` (array<string>) and
    ``n_bpe_tokens``; NULL text → NULL tokens, 0 count.
    """
    import re

    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    pat = re.compile(PRETOKEN_REGEX)
    # fresh StructType: StructType.add mutates in place, and df.schema
    # is cached on the DataFrame — never .add onto it. Pre-existing
    # columns with the output names (e.g. text_stats' n_bpe_tokens
    # estimate) are OVERWRITTEN, not duplicated — a duplicate field
    # would make the Arrow conversion or any later reference ambiguous.
    out_schema = StructType(
        [f for f in df.schema.fields if f.name not in (output_col, "n_bpe_tokens")]
        + [
            StructField(output_col, ArrayType(StringType())),
            StructField("n_bpe_tokens", LongType()),
        ]
    )
    df = df.drop(output_col, "n_bpe_tokens")
    lc = lowercase

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        # re-initialized per BATCH (below), not per partition: distinct
        # pretokens are unbounded (PRETOKEN_REGEX matches numbers), so
        # a partition-lifetime dict grows until the Python worker OOMs
        cache: dict[str, list[str]] = {}

        def enc_text(text):
            if text is None:
                return None
            toks: list[str] = []
            for w in pat.findall(text.lower() if lc else text):
                seg = cache.get(w)
                if seg is None:
                    seg = encode_word(w, ranks)
                    cache[w] = seg
                toks.extend(seg)
            return toks

        for pdf in batches:
            cache.clear()  # bound memo memory to one batch's vocabulary
            tok_lists = pdf[text_col].map(enc_text)
            pdf = pdf.copy()
            pdf[output_col] = tok_lists
            pdf["n_bpe_tokens"] = tok_lists.map(lambda t: 0 if t is None else len(t))
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
