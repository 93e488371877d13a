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
- ``top_k_tokens``     corpus token vocabulary (two-phase hash count)
- ``tf_idf``           smoothed TF-IDF, fully relational
- ``scrub_pii``        typed redaction + per-category audit counts
- ``repetition_stats`` Gopher-style duplication fractions
- ``dedupe_doc_lines`` within-doc repeated-line removal
- ``remove_boilerplate_lines`` per-source frequent-line removal
- ``fit_unigram_lm`` / ``unigram_logprob``  LM quality scoring
- ``chunk_documents``  overlapping token-window splitting
- ``token_pmi``        document-level collocation PMI
- ``corpus_report``    per-source curation dashboard rollup
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
    stopword set, take the best-scoring language (array_max on the
    (hits, lang) struct — equal-hit ties resolve to the
    lexicographically LAST language code, deterministically); no hits
    at all → 'und' (undetermined).
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
    from meds_transforms_spark.operators.dedup import _normalized

    c = F.col(text_col)
    if normalize:
        c = _normalized(c)  # the SAME normalization exact_dedup keys on
    # NULL text → NULL fingerprint: xxhash64 of an all-NULL input
    # returns the SEED (42), which would stamp every NULL doc with one
    # shared "content" key — the silent-collapse hazard exact_dedup and
    # corpus_report both guard against.
    return df.withColumn(
        "fingerprint", F.when(F.col(text_col).isNotNull(), F.xxhash64(c))
    )


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
    # N rides in as a broadcast single-row cross join (the pattern
    # unigram_logprob documents) — an eager distinct().count() here
    # would run a full corpus scan at PLAN-CONSTRUCTION time and a
    # second at execution.
    ndocs_row = df.agg(F.countDistinct(id_col).cast("double").alias("__n_docs"))
    toks = df.select(
        F.col(id_col), F.explode(_tokens(F.lower(F.col(text_col)))).alias("tok")
    )
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        tf.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= int(min_df))
    )
    idf = F.log((F.col("__n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    return tf.join(dfreq, "tok").join(F.broadcast(ndocs_row)).select(
        F.col(id_col),
        "tok",
        "tf",
        "df",
        (F.col("tf") * idf).alias("tfidf"),
    )


#: PII categories → (regex, replacement token). Patterns are restricted
#: to the Java-regex ∩ RE2 common dialect so Spark and SQL oracles agree.
PII_PATTERNS = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
}


@register_stage("scrub_pii")
def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    categories: tuple = ("email", "phone", "ipv4"),
    out_col: str | None = None,
) -> DataFrame:
    """Redact PII spans and count redactions per category.

    A training-data hygiene pass: email addresses, phone numbers and
    IPv4 literals are replaced with typed placeholder tokens, and a
    ``n_<category>`` count column records how many spans each document
    had (the audit signal — pipelines threshold or route on it).

    Pure projection: regexp_count + chained regexp_replace, all
    whole-stage codegen, no shuffle, linear at any scale. Order matters:
    counts are taken on the ORIGINAL text, then replacements applied
    email→phone→ipv4 (email first — its local part may contain digits
    that the looser patterns would otherwise bite into).
    """
    out_col = out_col or text_col
    src = F.col(text_col)
    for cat in categories:
        pat, _ = PII_PATTERNS[cat]
        df = df.withColumn(f"n_{cat}", F.regexp_count(src, F.lit(pat)).cast("long"))
    scrubbed = src
    for cat in categories:
        pat, repl = PII_PATTERNS[cat]
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.withColumn(out_col, scrubbed)


@register_stage("repetition_stats")
def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style within-document repetition signals.

    Per document: word count, distinct-word count, duplicate-word
    fraction, duplicate-bigram fraction, and the frequency share of the
    single most common word. High values mark boilerplate / degenerate
    documents that repetition filters drop before training.

    Plan shape: the set-based fractions are array expressions on the
    split token list — a pure codegen projection, no shuffle. Only the
    top-word share needs a histogram: explode → (doc, word) hash count →
    (doc) max, two partial-agg shuffles carrying counts (never text),
    joined back on ``id_col``. All word math is on lowercased
    whitespace tokens, matching ``tf_idf``/``top_k_tokens``.
    """
    ws = _tokens(F.lower(F.col(text_col)))
    n = F.size(ws)
    # zip_with over two shifted slices, NOT transform(sequence(...),
    # i -> element_at(ws, i)): the lambda form re-evaluates the split
    # expression per element (no CSE inside higher-order functions),
    # turning an O(n) projection into O(n²) per document. The slice
    # pair evaluates the split a constant number of times. Guarded:
    # slice with a negative length (n < 2) errors.
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(ws, 1, n - 1),
            F.slice(ws, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = df.select(
        F.col(id_col),
        ws.alias("__ws"),
        n.alias("n_words"),
        F.size(F.array_distinct(ws)).alias("n_distinct_words"),
        F.size(bigrams).alias("__nb"),
        F.size(F.array_distinct(bigrams)).alias("__ndb"),
    )
    hist = (
        base.select(F.col(id_col), F.explode("__ws").alias("__w"))
        .groupBy(id_col, "__w")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(F.max("__c").alias("__top"))
    )
    frac = lambda num, den: F.round(num / F.greatest(den, F.lit(1)), 6)
    return (
        base.join(hist, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_words").cast("long").alias("n_words"),
            F.col("n_distinct_words").cast("long").alias("n_distinct_words"),
            frac(F.col("n_words") - F.col("n_distinct_words"), F.col("n_words")).alias(
                "dup_word_fraction"
            ),
            frac(F.col("__nb") - F.col("__ndb"), F.col("__nb")).alias(
                "dup_bigram_fraction"
            ),
            frac(F.coalesce(F.col("__top"), F.lit(0)), F.col("n_words")).alias(
                "top_word_fraction"
            ),
        )
    )


@register_stage("dedupe_doc_lines")
def dedupe_doc_lines(
    df: DataFrame,
    text_col: str = "text",
    keep_blank: bool = True,
) -> DataFrame:
    """Drop repeated lines WITHIN each document, keeping the first
    occurrence — the intra-page half of the C4/Gopher cleanup
    (nav-menu/footer lines repeated inside one page), complementing
    :func:`remove_boilerplate_lines` which removes lines repeated
    ACROSS documents.

    Implementation is a single codegen-free-of-shuffle projection:
    keep line i iff ``array_position(lines, line)`` equals its own
    index (first occurrence). The per-document cost is O(L²) in line
    count through the interpreted HOF path — bounded by page length,
    independent of corpus size, and embarrassingly parallel, so the
    operator has NO shuffle and no scale coupling at all. Blank lines
    are kept by default (paragraph structure); NULL text stays NULL.
    """
    lines = F.split(F.col(text_col), "\n")
    keep = lambda x, i: F.array_position(lines, x) == i + F.lit(1)  # noqa: E731
    if keep_blank:
        inner = keep
        keep = lambda x, i: (F.trim(x) == "") | inner(x, i)  # noqa: E731
    deduped = F.concat_ws("\n", F.filter(lines, keep))
    return df.withColumn(
        text_col,
        F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(deduped),
    )


@register_stage("remove_boilerplate_lines")
def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    id_col: str = "doc_id",
    min_docs: int = 2,
    min_frac: float | None = None,
) -> DataFrame:
    """Drop lines that repeat across many documents of the same source —
    the classic web-corpus cleanup (site headers, nav bars, cookie
    banners, copyright footers) ahead of dedup/training.

    A line is boilerplate within ``group_col`` when it appears in at
    least ``min_docs`` distinct documents (and, if ``min_frac`` is
    given, in at least that fraction of the source's documents —
    whichever threshold is higher).

    Plan shape: one explode→distinct→count shuffle on (source, line)
    discovers boilerplate; the per-source boilerplate LIST (small by
    definition — boilerplate is the handful of lines every page shares)
    is broadcast back and removal is an order-preserving array filter
    in the projection: no second explode, no re-sort, document text
    never shuffles.
    """
    lines = F.split(F.col(text_col), "\n")
    # Blank / whitespace-only lines appear in nearly every multi-line
    # document; counting them would strip all paragraph breaks corpus-wide
    # once a source reaches min_docs, so they are never boilerplate
    # candidates (and the removal filter below keeps them).
    candidate_lines = F.filter(lines, lambda x: F.trim(x) != "")
    occurrences = df.select(
        group_col, id_col, F.explode(candidate_lines).alias("__line")
    ).dropDuplicates([group_col, id_col, "__line"])
    counts = occurrences.groupBy(group_col, "__line").agg(
        F.count(F.lit(1)).alias("__n_docs")
    )
    threshold = F.lit(int(min_docs))
    if min_frac is not None:
        per_source = df.groupBy(group_col).agg(
            F.countDistinct(id_col).alias("__src_docs")
        )
        counts = counts.join(F.broadcast(per_source), group_col)
        threshold = F.greatest(
            threshold, F.ceil(F.col("__src_docs") * F.lit(float(min_frac)))
        )
    bl = (
        counts.filter(F.col("__n_docs") >= threshold)
        .groupBy(group_col)
        .agg(F.collect_list("__line").alias("__bl"))
    )
    return (
        df.join(F.broadcast(bl), group_col, "left")
        .withColumn(
            text_col,
            # NULL text stays NULL (split(NULL)->NULL would otherwise
            # collapse to '' via concat_ws's null-skipping).
            F.when(
                F.col("__bl").isNull() | F.col(text_col).isNull(),
                F.col(text_col),
            ).otherwise(
                F.concat_ws(
                    "\n",
                    F.filter(
                        lines,
                        lambda x: (F.trim(x) == "")
                        | ~F.array_contains(F.col("__bl"), x),
                    ),
                )
            ),
        )
        .drop("__bl")
    )


@register_stage("fit_unigram_lm")
def fit_unigram_lm(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus unigram language model: ``(tok, n)`` counts over
    lowercased whitespace tokens. Explode + map-side-combined hash
    count — shuffles carry (token, partial_count) only. Feed the result
    to :func:`unigram_logprob` (self-corpus or held-out scoring)."""
    toks = _tokens(F.lower(F.col(text_col)))
    return (
        df.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register_stage("unigram_logprob")
def unigram_logprob(
    df: DataFrame,
    lm: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.0,
    round_to: int | None = None,
) -> DataFrame:
    """Per-document mean token log-probability under a unigram LM —
    the CCNet-style "LM quality" signal with a unigram model: typical
    prose scores high, rare-token gibberish scores very negative.

    ``lm`` is a ``(tok, n)`` frame (from :func:`fit_unigram_lm`, over
    this corpus or a trusted reference corpus); omitted, the model is
    fit on ``df`` itself. ``alpha`` is add-alpha smoothing —
    ``p(tok) = (n + alpha) / (N + alpha·V)`` — required when scoring
    against an external LM (out-of-vocabulary tokens have n = 0; with
    ``alpha = 0`` they'd score -inf).

    Plan: per-doc token counts ((id, tok) groupBy — collapses repeats
    BEFORE the vocab join), shuffle-join with the LM on the token
    (AQE broadcasts it when it fits), weighted mean per doc. The LM's
    scalar totals (N, V) ride in as a broadcast single-row cross join,
    keeping the whole plan lazy — no driver materialization.

    Adds ``avg_logprob`` (NULL for token-less docs); ``round_to``
    rounds it (engine-agnostic comparisons — ln() differs in the last
    ULP across engines).
    """
    if lm is not None and alpha <= 0:
        raise ValueError(
            "scoring against an external lm requires alpha > 0 "
            "(out-of-vocabulary tokens have zero probability)"
        )
    per_doc = (
        df.select(F.col(id_col), F.explode(_tokens(F.lower(F.col(text_col)))).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("__n_local"))
    )
    if lm is None:
        # Self-fit: derive the LM from per_doc instead of a second
        # independent corpus explode (fit_unigram_lm) — the separate
        # subtree would not canonicalize into a ReusedExchange, so the
        # tokenization would run once per consumer (the measured
        # _bigram_scores finding, lm.py). Pin per_doc: totals, the LM
        # derivation, and the score join all read it.
        per_doc = per_doc.localCheckpoint(eager=False)
        # Pin the self-fit model table too (round-10, the lm.py
        # _bigram_scores finding): lm feeds TWO consumers below (the
        # totals aggregate and the score join), and the broadcast-side
        # and totals-side subtrees never canonicalize into one
        # ReusedExchange — unpinned, the (tok) aggregation ran twice
        # over the per_doc blocks. The table is vocabulary-sized
        # (Zipf: ≪ corpus), so the pinned blocks are tiny.
        lm = (
            per_doc.groupBy("tok")
            .agg(F.sum("__n_local").alias("n"))
            .localCheckpoint(eager=False)
        )
    totals = lm.agg(
        F.sum("n").cast("double").alias("__N"),
        F.count(F.lit(1)).cast("double").alias("__V"),
    )
    joined = per_doc.join(lm, "tok", "left").join(F.broadcast(totals))
    p = (F.coalesce(F.col("n"), F.lit(0)) + F.lit(float(alpha))) / (
        F.col("__N") + F.lit(float(alpha)) * F.col("__V")
    )
    scored = joined.groupBy(id_col).agg(
        (
            F.sum(F.col("__n_local") * F.log(p)) / F.sum("__n_local")
        ).alias("avg_logprob")
    )
    if round_to is not None:
        scored = scored.withColumn(
            "avg_logprob", F.round("avg_logprob", int(round_to)) + F.lit(0.0)
        )
    return df.join(scored, id_col, "left")


@register_stage("chunk_documents")
def chunk_documents(
    df: DataFrame,
    max_tokens: int = 512,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into (overlapping) token-window chunks — the
    long-document preprocessing step for context-window-bounded
    training and retrieval corpora.

    Emits one row per chunk: ``(id, chunk_id, chunk_text, chunk_tokens)``
    with ``chunk_id`` 0-based in document order. Chunks start every
    ``max_tokens - overlap`` tokens; the last chunk may be shorter, and
    every token belongs to at least one chunk. ``chunk_text`` is
    rebuilt from whitespace tokens joined by single spaces (original
    inter-token whitespace is NOT preserved — chunking is defined on
    the token stream, which keeps the operator a deterministic pure
    function of the tokens in any engine).

    Plan: tokens materialize into a column (one projection — the HOF
    CSE rule), chunk indices explode from a sequence, each output row
    slices only ITS window — rows never carry the full document, so
    generate-output bytes are O(len · (1 + overlap/step)), not
    O(len · chunks). Zero shuffles; NULL/token-less docs yield one
    empty chunk row (chunk_id 0, NULL text) so no document silently
    disappears.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must be in [0, max_tokens)")
    step = max_tokens - overlap
    toks = _tokens(F.col(text_col))
    n = F.size("__toks")
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(
        F.ceil((n - F.lit(max_tokens)) / F.lit(step)).cast("int") + 1
    )
    chunk = F.slice("__toks", F.col("__c") * step + 1, max_tokens)
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .select(
            id_col,
            "__toks",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(n_chunks, F.lit(1)) - 1)
            ).alias("__c"),
        )
        .select(
            id_col,
            F.col("__c").alias("chunk_id"),
            F.when(F.size(chunk) > 0, F.concat_ws(" ", chunk)).alias("chunk_text"),
            F.coalesce(F.size(chunk), F.lit(0)).alias("chunk_tokens"),
        )
    )


@register_stage("token_pmi")
def token_pmi(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_pair_docs: int = 5,
    max_doc_tokens: int | None = 10_000,
    round_to: int | None = None,
) -> DataFrame:
    """Document-level pointwise mutual information of token pairs:
    ``pmi(a,b) = ln( p(a,b) / (p(a)·p(b)) )`` with probabilities =
    document frequencies / N — the collocation / topic-drift signal of
    corpus analytics (ordered pairs ``tok_a < tok_b``).

    Relational co-occurrence (same discipline as ngram_jaccard_pairs):
    per-doc DISTINCT tokens self-join on the doc id, so only pairs that
    actually co-occur materialize — never a vocab² cross join. The
    per-doc quadratic term is the hazard at scale: ``max_doc_tokens``
    drops pathological docs (a 10⁶-distinct-token doc alone would emit
    5·10¹¹ pairs); ``min_pair_docs`` prunes the long tail before the
    DF join. Outputs ``(tok_a, tok_b, n_ab, df_a, df_b, pmi)``.
    """
    # explode(array_distinct(...)) already emits unique (id, tok) rows —
    # a dropDuplicates here would re-shuffle the largest frame for nothing
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(_tokens(F.lower(F.col(text_col))))).alias("tok"),
    )
    if max_doc_tokens is not None:
        from pyspark.sql import Window as W

        toks = (
            toks.withColumn("__n", F.count(F.lit(1)).over(W.partitionBy(id_col)))
            .filter(F.col("__n") <= int(max_doc_tokens))
            .drop("__n")
        )
    # Four consumers follow (N, dfreq, both pair sides) — pin so the
    # explode + cap window run once.
    toks = toks.localCheckpoint(eager=False)
    # N must be the doc universe the df_a/df_b/n_ab counts live in — the
    # docs SURVIVING the cap with ≥1 token; counting all of df would
    # uniformly inflate every PMI by ln(N_all/N_retained). It rides in
    # as a broadcast single-row cross join (lazy — no plan-time job).
    ndocs_row = toks.agg(
        F.countDistinct(id_col).cast("double").alias("__n_docs")
    )
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    a = toks.select(F.col(id_col), F.col("tok").alias("tok_a"))
    b = toks.select(F.col(id_col), F.col("tok").alias("tok_b"))
    pairs = (
        a.join(b, id_col)
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= int(min_pair_docs))
    )
    da = dfreq.select(F.col("tok").alias("tok_a"), F.col("df").alias("df_a"))
    db = dfreq.select(F.col("tok").alias("tok_b"), F.col("df").alias("df_b"))
    pmi = F.log(
        (F.col("n_ab") * F.col("__n_docs"))
        / (F.col("df_a").cast("double") * F.col("df_b"))
    )
    out = (
        pairs.join(da, "tok_a")
        .join(db, "tok_b")
        .join(F.broadcast(ndocs_row))
        .withColumn("pmi", pmi)
        .select("tok_a", "tok_b", "n_ab", "df_a", "df_b", "pmi")
    )
    if round_to is not None:
        out = out.withColumn("pmi", F.round("pmi", int(round_to)) + F.lit(0.0))
    return out


@register_stage("corpus_report")
def corpus_report(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source curation dashboard: one row per ``group_col`` with
    the signals a mix designer reads before weighting — volume, token
    mass, length spread, exact-duplicate rate, dominant language.

    Composes the existing projections (token counts, normalized
    fingerprint, language_id) into ONE aggregation over the group key;
    the only extra shuffle beyond the groupBy is the fingerprint
    duplicate count, which is computed from a (fingerprint-within-
    group) count window folded into the same pass via a pre-agg on
    (group, fingerprint). Dominant language = mode of the per-doc
    stopword guess (ties lexicographic via max on (count, lang)).
    """
    from meds_transforms_spark.operators.dedup import _normalized

    toks = _tokens(F.lower(F.col(text_col)))
    # the SAME normalized fingerprint exact_dedup keys on — the report's
    # dup_rate must predict what that operator would actually remove.
    # NULL-text docs keep a NULL fingerprint and are excluded from the
    # dup count below: they can't be "exact duplicates" of anything
    # (hashing NULL yields the seed constant and would collapse them).
    fp = F.when(F.col(text_col).isNotNull(), F.xxhash64(_normalized(F.col(text_col))))
    base = language_id(
        df.select(
            F.col(group_col).alias("__g"),
            F.col(text_col),
            F.size(toks).alias("__ntok"),
            F.length(F.col(text_col)).alias("__nchar"),
            fp.alias("__fp"),
        ),
        text_col=text_col,
    ).drop(text_col)
    # Two aggregations consume base (per_fp and lang_counts) — pin so
    # the scan + tokenize + fingerprint + language scoring run once.
    base = base.localCheckpoint(eager=False)
    # exact-dup mass per group: groupBy (group, fingerprint) first —
    # map-side combined, shuffle rows are (group, long, count)
    per_fp = base.groupBy("__g", "__fp").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__ntok").alias("__tok"),
        F.sum("__nchar").alias("__chr"),
    )
    nn = F.when(F.col("__fp").isNotNull(), F.col("__n")).otherwise(0)
    per_group = per_fp.groupBy("__g").agg(
        F.sum("__n").alias("n_docs"),
        F.sum("__tok").alias("n_tokens"),
        F.sum("__chr").alias("n_chars"),
        # dup mass over HASHED docs only: the NULL-fingerprint group is
        # null-text docs, which are never duplicates of each other
        (F.sum(nn) - F.sum(F.when(F.col("__fp").isNotNull(), 1).otherwise(0))).alias(
            "n_exact_dups"
        ),
    )
    lang_counts = base.groupBy("__g", "lang_pred").agg(
        F.count(F.lit(1)).alias("__ln")
    )
    top_lang = lang_counts.groupBy("__g").agg(
        F.max(F.struct(F.col("__ln"), F.col("lang_pred"))).alias("__top")
    ).select("__g", F.col("__top.lang_pred").alias("top_lang"))
    # Null-safe group join: an equi-join on __g would silently DROP the
    # NULL-group row (docs with NULL source) from the report, leaving
    # n_docs short of the corpus with no error.
    return (
        per_group.join(
            top_lang.withColumnRenamed("__g", "__g2"),
            per_group["__g"].eqNullSafe(F.col("__g2")),
        )
        .select(
            F.col("__g").alias(group_col),
            "n_docs",
            "n_tokens",
            "n_chars",
            "n_exact_dups",
            (F.col("n_exact_dups") / F.col("n_docs")).alias("dup_rate"),
            "top_lang",
        )
    )


#: The Gopher quality-rule required-stopword list (Rae et al. 2021,
#: "Scaling Language Models: ... Gopher", Appendix A1.1).
GOPHER_REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


@register_stage("gopher_quality_filter")
def gopher_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_stopwords: int = 2,
) -> DataFrame:
    """The published Gopher document-quality rule set (Rae et al. 2021,
    Appendix A1.1) as explicit boolean rule columns plus a combined
    ``gopher_pass`` flag — the standard pre-training corpus filter,
    kept rule-per-column so curation dashboards can report WHICH rule
    rejected each document, not just that one did.

    Rules (each True = document passes that rule):

    - ``rule_word_count``     ``min_words <= n <= max_words``
    - ``rule_mean_word_len``  mean token length in [min, max]
    - ``rule_symbol_ratio``   (#'#' + #'...') / words <= threshold
    - ``rule_bullet_lines``   < max fraction of lines start with a bullet
    - ``rule_ellipsis_lines`` <= max fraction of lines end with ellipsis
    - ``rule_alpha_words``    >= min fraction of words contain a letter
    - ``rule_stopwords``      >= N distinct required stopwords present

    Plan: ONE shuffle-free codegen projection — tokens and lines are
    each computed once into intermediate columns (HOF re-computation is
    the O(n²) CSE pitfall documented in SCALING.md), every rule is an
    array aggregate over them, and NULL text fails closed (all rules
    False). Linear in bytes, embarrassingly parallel at 100 TB.
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    with_arrays = df.withColumn(
        "__toks", F.filter(F.split(c, r"\s+"), lambda t: t != "")
    ).withColumn("__lines", F.split(c, "\n"))
    toks, lines = F.col("__toks"), F.col("__lines")
    n_words = F.size(toks)
    n_lines = F.greatest(F.size(lines), F.lit(1))
    mean_len = F.when(
        n_words > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
        / n_words,
    ).otherwise(F.lit(0.0))
    n_symbols = F.size(F.regexp_extract_all(c, F.lit(r"#|\.\.\."), F.lit(0)))
    bullet_frac = (
        F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[•*-]\s"))) / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))) / n_lines
    )
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(toks, lambda t: t.rlike(r"[A-Za-z]"))) / n_words,
    ).otherwise(F.lit(0.0))
    required = F.array(*[F.lit(w) for w in GOPHER_REQUIRED_STOPWORDS])
    n_stop = F.size(F.array_intersect(F.transform(toks, F.lower), required))
    rules = {
        "rule_word_count": (n_words >= min_words) & (n_words <= max_words),
        "rule_mean_word_len": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "rule_symbol_ratio": F.when(n_words > 0, n_symbols / n_words <= max_symbol_word_ratio).otherwise(F.lit(False)),
        "rule_bullet_lines": bullet_frac < max_bullet_line_frac,
        "rule_ellipsis_lines": ellipsis_frac <= max_ellipsis_line_frac,
        "rule_alpha_words": alpha_frac >= min_alpha_word_frac,
        "rule_stopwords": n_stop >= min_required_stopwords,
    }
    out = with_arrays.withColumn("n_words", n_words.cast("long"))
    passed = F.lit(True)
    not_null = F.col(text_col).isNotNull()
    for name, rule in rules.items():
        # NULL text fails EVERY rule, including the trivially-true line
        # rules — dashboards counting per-rule failures see null docs.
        out = out.withColumn(name, not_null & rule)
        passed = passed & F.col(name)
    return out.withColumn("gopher_pass", passed).drop("__toks", "__lines")
