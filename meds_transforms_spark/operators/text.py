"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in Catalyst functions (regex, split,
aggregate over arrays) — JVM-side, codegen'd, zero Python in the loop —
so each operator is a pure projection that scales linearly with no
shuffle.

Operators:
- ``text_stats``       length / token / punctuation / digit statistics
- ``token_count``      whitespace + BPE-ish regex token counting
- ``quality_score``    heuristic document quality in [0,1]
- ``language_id``      stopword-hit n-gram heuristic language guess
- ``fingerprint``      64-bit document fingerprint (normalized xxhash)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage

#: BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
#: (the GPT-2 pre-tokenizer shape, simplified to a public regex idiom).
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Tiny per-language stopword inventories for the n-gram heuristic.
#: Deliberately small: the operator is a heuristic scorer, not a model.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "für", "von"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "pour", "que", "une"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por", "con", "para"],
}


def _tokens(col: Column) -> Column:
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


@register_stage("text_stats")
def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    toks = _tokens(c)
    n_tokens = F.size(toks)
    return (
        df.withColumn("n_chars_computed", F.length(c).cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn(
            "n_bpe_tokens", F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), F.lit(0))).cast("long")
        )
        .withColumn(
            "punct_ratio",
            F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), F.lit(0))) / F.greatest(F.length(c), F.lit(1)),
        )
        .withColumn(
            "digit_ratio",
            F.size(F.regexp_extract_all(c, F.lit(r"[0-9]"), F.lit(0))) / F.greatest(F.length(c), F.lit(1)),
        )
        .withColumn(
            "mean_token_len",
            F.when(
                n_tokens > 0,
                F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
                / n_tokens,
            ),
        )
    )


@register_stage("token_count")
def token_count(df: DataFrame, text_col: str = "text", method: str = "whitespace") -> DataFrame:
    c = F.col(text_col)
    if method == "whitespace":
        cnt = F.size(_tokens(c))
    elif method == "bpe":
        cnt = F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), F.lit(0)))
    else:
        raise ValueError(f"Unknown token_count method {method!r}")
    return df.withColumn("n_tokens", cnt.cast("long"))


@register_stage("quality_score")
def quality_score(
    df: DataFrame,
    text_col: str = "text",
    min_chars: int = 200,
    max_punct_ratio: float = 0.2,
) -> DataFrame:
    """Heuristic quality in [0,1]: length sufficiency × (1 − punct excess)
    × stopword presence — the C4/Gopher-style rule family expressed as
    one codegen'd projection."""
    c = F.col(text_col)
    length_score = F.least(F.length(c) / F.lit(float(min_chars)), F.lit(1.0))
    punct_ratio = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), F.lit(0))) / F.greatest(
        F.length(c), F.lit(1)
    )
    punct_score = F.when(punct_ratio > max_punct_ratio, F.lit(0.5)).otherwise(F.lit(1.0))
    toks = _tokens(F.lower(c))
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.array_intersect(toks, en_stop))
    stop_score = F.least(stop_hits / F.lit(3.0), F.lit(1.0))
    return df.withColumn(
        "quality", (length_score * punct_score * (F.lit(0.5) + F.lit(0.5) * stop_score)).cast("double")
    )


@register_stage("language_id")
def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language guess: argmax over per-language hit counts.

    Pure array built-ins: tokenize once, intersect with each language's
    stopword set, take the best-scoring language (ties → lexicographic
    first for determinism); no hits at all → 'und' (undetermined).
    """
    toks = F.array_distinct(_tokens(F.lower(F.col(text_col))))
    scored = F.array(
        *[
            F.struct(
                F.size(
                    F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
                ).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(STOPWORDS.items())
        ]
    )
    best = F.array_max(F.filter(scored, lambda s: s["hits"] > 0))
    return df.withColumn("lang_pred", F.coalesce(best["lang"], F.lit("und")))


@register_stage("top_k_tokens")
def top_k_tokens(df: DataFrame, text_col: str = "text", k: int = 100) -> DataFrame:
    """Corpus-level token vocabulary: top-k tokens by frequency.

    Explode + two-phase hash count — the vocabulary-building primitive.
    At 100 TB the shuffle carries (token, partial_count) pairs only;
    ties broken lexicographically for determinism.
    """
    toks = _tokens(F.lower(F.col(text_col)))
    return (
        df.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(int(k))
    )


@register_stage("fingerprint")
def fingerprint(df: DataFrame, text_col: str = "text", normalize: bool = True) -> DataFrame:
    """64-bit content fingerprint: xxhash64 over whitespace/case-normalized
    text. The normalization makes trivially-reformatted copies collide —
    the exact-dedup key at scale."""
    c = F.col(text_col)
    if normalize:
        c = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return df.withColumn("fingerprint", F.xxhash64(c))


@register_stage("tf_idf")
def tf_idf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """(doc, token, tf, df, tfidf) — smoothed TF-IDF, fully relational.

    tf = in-doc term count; df = number of docs containing the token;
    idf = ln((N+1)/(df+1)) + 1 (sklearn-style smoothing: never zero,
    defined for unseen tokens). Two hash aggregations — (doc, token)
    and (token) — plus one broadcast of the per-token df table when it
    fits, else a plain shuffle join Catalyst picks. Shuffles carry
    (token, count) pairs, never text bodies. ``min_df`` prunes the
    ultra-rare tail before the join (the standard vocabulary guard —
    at web scale most tokens are hapaxes that triple join traffic for
    no modeling value).
    """
    n_docs = df.select(id_col).distinct().count()
    toks = df.select(
        F.col(id_col), F.explode(_tokens(F.lower(F.col(text_col)))).alias("tok")
    )
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        tf.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= int(min_df))
    )
    idf = F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0
    return tf.join(dfreq, "tok").select(
        F.col(id_col),
        "tok",
        "tf",
        "df",
        (F.col("tf") * idf).alias("tfidf"),
    )
