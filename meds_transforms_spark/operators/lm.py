"""Interpolated bigram language model: distributed fit + per-doc scoring.

The CCNet recipe (Wenzek et al. 2020) ranks web text by LM perplexity;
the unigram scorer (text.unigram_logprob) captures vocabulary oddity
but is blind to word ORDER — "the of of the and" scores like prose.
This module adds the next model up: an interpolated bigram LM

    p(w2 | w1) = λ · c(w1,w2)/c(w1·)  +  (1−λ) · (c(·w2)+α)/(N+α·V)

fit over bigram EVENTS (c(w1·) = Σ_w2 c(w1,w2), c(·w2) = Σ_w1, N = Σ
all, V = distinct right-contexts — so the model is self-contained in
one bigram-count table and its marginals; no separate unigram pass).

100 TB design: bigrams are formed INSIDE a per-row array HOF (token
array → (w1,w2) struct array — zero shuffle, whole-stage codegen; no
lag() window over an exploded token stream). ONE explode feeds a
(doc, w1, w2) count aggregation, and the model + both marginals +
scalar totals all derive from that aggregate by re-aggregation —
corpus text is scanned once, and every shuffle after the first carries
(hashable-token, long) rows. Model-side tables are vocabulary-sized
(Zipf: ≪ corpus); the score join leaves broadcast-vs-shuffle to AQE
since a 100 TB corpus's bigram vocabulary can exceed broadcast limits.

Reference scope note: the reference engine (Polars/Hydra ETL) has no
LM plane; this extends the curation suite alongside text.py and
dsir.py. Cited pattern: classic interpolated Katz/Jelinek-Mercer
smoothing, any NLP textbook.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage
from meds_transforms_spark.operators.text import _tokens


def _bigram_structs(toks: Column) -> Column:
    """(w1, w2) struct array from an already-MATERIALIZED token array
    column (HOF-CSE rule: never pass the tokenization expression).
    Sequence guard: ``sequence(1, 0)`` DESCENDS in Spark, so docs with
    <2 tokens must short-circuit to an empty array."""
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))


@register_stage("fit_bigram_lm")
def fit_bigram_lm(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus bigram counts ``(w1, w2, n)`` — the model table.

    Tokenization matches the unigram LM: lowercase, whitespace split.
    """
    per_doc = _per_doc_bigrams(df, text_col, id_col)
    return per_doc.groupBy("w1", "w2").agg(F.sum("__n_local").alias("n"))


def _per_doc_bigrams(
    df: DataFrame, text_col: str, id_col: str, keys: str = "tokens"
) -> DataFrame:
    """Per-doc bigram counts ``(id, w1, w2, __n_local)``.

    ``keys="tokens"``: w1/w2 are the token STRINGS (the public model
    key — what fit_bigram_lm returns). ``keys="hash64"``: w1/w2 are
    64-bit poly64 token hashes via the Arrow kernel
    (operators/grams.bigram_hash_counts_poly) — same count multiset,
    same marginals (collisions aside), but the token split + per-pair
    struct HOF (interpreted) becomes one numpy pass per batch and the
    model-plane shuffles carry fixed-width longs instead of word
    pairs. Valid whenever the keys never leave the model plane (the
    self-fit scoring path)."""
    if keys == "hash64":
        from meds_transforms_spark.operators.grams import bigram_hash_counts_poly

        return bigram_hash_counts_poly(df, text_col=text_col, id_col=id_col)
    toks_df = df.select(
        F.col(id_col), _tokens(F.lower(F.col(text_col))).alias("__toks")
    )
    return (
        toks_df.select(
            F.col(id_col), F.explode(_bigram_structs(F.col("__toks"))).alias("__bg")
        )
        .select(F.col(id_col), F.col("__bg.w1"), F.col("__bg.w2"))
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("__n_local"))
    )


@register_stage("bigram_logprob")
def bigram_logprob(
    df: DataFrame,
    lm: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
    alpha: float = 0.1,
    round_to: int | None = None,
    pin_lm: bool = True,
) -> DataFrame:
    """Per-document mean bigram log-probability under the interpolated
    model — adds ``avg_bigram_logprob`` (NULL for docs with <2 tokens).

    ``lm`` is a ``(w1, w2, n)`` frame (from :func:`fit_bigram_lm`, over
    this corpus or a trusted reference corpus); omitted, the model is
    fit on ``df`` itself — in that case the per-doc bigram aggregate is
    computed once and the model derives from it by re-aggregation
    (corpus scanned once). Unseen bigrams get the interpolation floor
    (1−λ)·α/(N+αV) > 0, so external-LM scoring never hits −inf.

    The arithmetic order is fixed — λ·(c12/c1) + (1−λ)·((c2+α)/(N+αV)),
    every count cast to double before its division — so a SQL oracle
    replaying the same order reproduces the doubles bit-for-bit;
    ``round_to`` absorbs the cross-engine ln() ULP.
    """
    scored = _bigram_scores(df, lm, text_col, id_col, lam, alpha, round_to, pin_lm)
    return df.join(scored, id_col, "left")


def _bigram_scores(
    df: DataFrame,
    lm: DataFrame | None,
    text_col: str,
    id_col: str,
    lam: float,
    alpha: float,
    round_to: int | None,
    pin_lm: bool = True,
) -> DataFrame:
    """The slim ``(id_col, avg_bigram_logprob)`` scoring frame — shared
    by :func:`bigram_logprob` (which joins it back onto ``df``) and
    :func:`ccnet_buckets` (which persists it so the quantile pass and
    the output join evaluate the scoring pipeline once).

    Self-fit (lm=None) keys the model plane by 64-bit token hashes
    (the Arrow bigram kernel): only per-doc SCORES leave this
    function, and the score is a pure function of the count multiset,
    so the key representation is unobservable — while the bigram
    construction drops the interpreted per-pair HOF and the model
    shuffles carry longs. An external ``lm`` is string-keyed by
    contract, so that path keeps token keys.

    Summation-order note: the per-doc Σ n·ln(p) is a float sum whose
    addend ORDER is partition-dependent under either keying — the
    round_to contract (docstring above) already absorbs sub-round_to
    ULP wiggle; hash keying adds no new error class.
    """
    per_doc = _per_doc_bigrams(
        df, text_col, id_col, keys="hash64" if lm is None else "tokens"
    )
    if lm is None:
        # Self-fit: per_doc feeds FIVE consumers (the score join, lm,
        # and through lm both marginals and the totals) and their
        # subtrees do not canonicalize into ReusedExchange — unpinned,
        # the corpus explode ran 5× (measured: 5 Generate nodes). Pin
        # the aggregated (id, w1, w2, n) frame — one thin row per
        # distinct bigram per doc — so the explode runs once and
        # everything else is a re-aggregation. localCheckpoint, not
        # persist: blocks release with the frame (no session-lifetime
        # cache leak).
        per_doc = per_doc.localCheckpoint(eager=False)
        # Pin the self-fit model table too (round-10): lm feeds FOUR
        # consumers below (c1, c2, totals, score join) — unpinned, each
        # re-runs the (w1, w2) aggregation over the per_doc blocks.
        # The table is vocab-bigram-sized (bounded by the distinct
        # bigram count, not the corpus), so the pinned blocks are tiny.
        lm = per_doc.groupBy("w1", "w2").agg(
            F.sum("__n_local").alias("n")
        ).localCheckpoint(eager=False)
    elif pin_lm:
        # External lm: the frame feeds FOUR consumers below (c1, c2,
        # totals, score join). When it is itself a lazy fit pipeline
        # over a large corpus, the whole fit aggregation would re-run
        # per consumer — pin it like the self-fit path pins per_doc.
        # Callers holding an lm that is already materialized (a tiny
        # literal table, a cached/persisted frame, a parquet read of a
        # saved model) pass ``pin_lm=False`` to skip the executor-local
        # materialization and keep the job recoverable on executor
        # loss.
        lm = lm.localCheckpoint(eager=False)
    c1 = lm.groupBy("w1").agg(F.sum("n").alias("__c1"))
    c2 = lm.groupBy("w2").agg(F.sum("n").alias("__c2"))
    totals = lm.agg(
        F.sum("n").cast("double").alias("__N"),
        F.count_distinct("w2").cast("double").alias("__V"),
    )
    joined = (
        per_doc.join(lm, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .join(c2, "w2", "left")
        .join(F.broadcast(totals))
    )
    lam_f, alpha_f = float(lam), float(alpha)
    seen = (
        F.coalesce(F.col("n"), F.lit(0)).cast("double")
        / F.coalesce(F.col("__c1"), F.lit(1)).cast("double")
    )
    backoff = (F.coalesce(F.col("__c2"), F.lit(0)).cast("double") + F.lit(alpha_f)) / (
        F.col("__N") + F.lit(alpha_f) * F.col("__V")
    )
    p = F.lit(lam_f) * seen + F.lit(1.0 - lam_f) * backoff
    scored = joined.groupBy(id_col).agg(
        (F.sum(F.col("__n_local") * F.log(p)) / F.sum("__n_local")).alias(
            "avg_bigram_logprob"
        )
    )
    if round_to is not None:
        scored = scored.withColumn(
            "avg_bigram_logprob",
            F.round("avg_bigram_logprob", int(round_to)) + F.lit(0.0),
        )
    return scored


@register_stage("ccnet_buckets")
def ccnet_buckets(
    df: DataFrame,
    lm: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    lam: float = 0.7,
    alpha: float = 0.1,
    round_to: int = 6,
    pin_lm: bool = True,
) -> DataFrame:
    """CCNet's selection step: per-language perplexity terciles — adds
    ``avg_bigram_logprob`` and ``ppl_bucket`` ('head'/'middle'/'tail').

    CCNet (Wenzek et al. 2020) keeps the lowest-perplexity third of
    each language as premium training data. The naive per-language
    ``ntile(3)`` window funnels each language through ONE reducer — a
    single language can be most of a 100 TB corpus, so instead the two
    cut points come from :func:`~meds_transforms_spark.operators.
    quantiles.grouped_exact_quantiles` (distinct-value cumulative
    ranks: the shuffle carries one row per distinct (lang, score), and
    scores are pre-rounded so the distinct set is small) and are
    broadcast back as a tiny (lang, lo, hi) table. Exact nearest-rank
    quantiles — not approx — so the bucket assignment is a pure
    function of the data and a SQL oracle reproduces it.

    Docs with no score (<2 tokens / NULL text) get a NULL bucket.
    Higher mean log-prob = lower perplexity = better: scores ≥ the 2/3
    cut are 'head', ≥ the 1/3 cut 'middle', the rest 'tail'.
    """
    from meds_transforms_spark.operators.quantiles import grouped_exact_quantiles

    # Score once into the slim (id, score) frame and pin it: both the
    # quantile pass and the output join consume it, and without the
    # pin each would re-run the whole scoring pipeline (measured 2×).
    # GC-released checkpoint, not a session-lifetime persist.
    slim = _bigram_scores(
        df, lm, text_col, id_col, lam, alpha, round_to, pin_lm
    ).localCheckpoint(eager=False)
    scored = df.join(slim, id_col, "left")
    cuts = grouped_exact_quantiles(
        scored.select(lang_col, "avg_bigram_logprob"),
        [1.0 / 3.0, 2.0 / 3.0],
        keys=[lang_col],
        value_col="avg_bigram_logprob",
    )
    qlo, qhi = cuts.columns[-2], cuts.columns[-1]
    cuts = cuts.select(
        F.col(lang_col),
        F.col(f"`{qlo}`").alias("__cut_lo"),
        F.col(f"`{qhi}`").alias("__cut_hi"),
    )
    lp = F.col("avg_bigram_logprob")
    bucket = (
        # no score OR no cuts row (NULL lang never equi-joins; a lang
        # with zero scored docs has no terciles) → unbucketed NULL, not
        # a silent worst-tercile 'tail' label
        F.when(lp.isNull() | F.col("__cut_lo").isNull(), F.lit(None).cast("string"))
        .when(lp >= F.col("__cut_hi"), F.lit("head"))
        .when(lp >= F.col("__cut_lo"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored.join(F.broadcast(cuts), lang_col, "left")
        .withColumn("ppl_bucket", bucket)
        .drop("__cut_lo", "__cut_hi")
    )


@register_stage("bigram_logprob_projection")
def bigram_logprob_projection(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1 << 15,
    max_entries: int = 250_000,
    lam: float = 0.7,
    alpha: float = 0.1,
    hash_fn: str = "xxhash64",
    round_to: int | None = None,
) -> DataFrame:
    """Serve a fitted bigram LM as a PURE PROJECTION — the
    streaming-native scoring path (``bigram_logprob``'s relational form
    needs a per-doc aggregation + model joins, which a watermarkless
    stream can't run).

    The model's interpolated log-probabilities are precomputed
    driver-side and inlined as ONE dense array literal indexed by
    ``h(w1:w2) mod n_buckets`` (the dsir_score_projection pattern);
    per-row scoring is an array aggregate over the HOF-built bigram
    stream — no explode, no groupBy, no join, zero shuffle. Attach to a
    readStream like any stateless text operator.

    Hashed-serving approximations, documented: colliding bigrams share
    a slot (last-written wins by ascending count, so the most frequent
    bigram owns contested slots), the model is capped at the top
    ``max_entries`` bigrams by count — the served model IS that capped
    table (marginals, N, and V are all computed from the SAME retained
    rows, so the probabilities stay internally consistent; a capped
    model is a smaller model, not a corrupted one) — and
    unseen/out-of-model bigrams score the interpolation FLOOR
    ``ln((1−λ)·α/(N+αV))`` rather than the per-``w2`` backoff the exact
    scorer gives them. Self-fit corpora with vocab ≪ n_buckets and
    ≤ max_entries reproduce the exact scores.

    The collect here is the MODEL (≤ max_entries rows, ONE job even
    when ``lm`` is the lazy fit pipeline), never data.
    """
    import math

    from meds_transforms_spark.operators.dedup import _h64

    if not (0.0 <= float(lam) < 1.0):
        raise ValueError(
            f"bigram_logprob_projection: lam={lam} must be in [0, 1) — "
            "the unseen-bigram floor ln((1-lam)*alpha/(N+alpha*V)) is "
            "undefined at lam=1 (use the relational bigram_logprob for "
            "unsmoothed scoring)"
        )
    if float(alpha) <= 0.0:
        raise ValueError(
            f"bigram_logprob_projection: alpha={alpha} must be > 0 "
            "(out-of-model bigrams would have zero probability)"
        )
    b = int(n_buckets)
    rows = (
        lm.orderBy(F.col("n").desc(), "w1", "w2").limit(int(max_entries)).collect()
    )
    if not rows:
        raise ValueError(
            "bigram_logprob_projection: empty lm — serving it would "
            "score every document ln(p)=0.0 ('perfect prose')"
        )
    # every model statistic derives from the retained rows — one collect
    N = float(sum(r["n"] for r in rows))
    V = float(len({r["w2"] for r in rows}))
    c1: dict[str, int] = {}
    c2: dict[str, int] = {}
    for r in rows:
        c1[r["w1"]] = c1.get(r["w1"], 0) + r["n"]
        c2[r["w2"]] = c2.get(r["w2"], 0) + r["n"]
    lam_f, alpha_f = float(lam), float(alpha)
    # rows is non-empty and alpha > 0, so denom > 0 and the log's
    # argument is strictly positive (lam < 1 validated above)
    denom = N + alpha_f * V
    floor = math.log((1.0 - lam_f) * alpha_f / denom)
    dense = [floor] * b
    slots = _model_slots(
        lm.sparkSession, [f"{r['w1']}:{r['w2']}" for r in rows], b, hash_fn
    )
    # ascending count so the most frequent bigram wins contested slots
    for r in sorted(rows, key=lambda r: r["n"]):
        key = f"{r['w1']}:{r['w2']}"
        p = lam_f * (r["n"] / c1[r["w1"]]) + (1.0 - lam_f) * (
            (c2[r["w2"]] + alpha_f) / denom
        )
        dense[slots[key]] = math.log(p)
    lut = F.lit(dense)

    toks_expr = _tokens(F.lower(F.col(text_col)))
    base = df.withColumn("__toks", toks_expr)
    n = F.size(F.col("__toks"))
    bgs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.element_at(F.col("__toks"), i),
                F.lit(":"),
                F.element_at(F.col("__toks"), i + 1),
            ),
        ),
    )
    total_lp = F.aggregate(
        bgs,
        F.lit(0.0),
        lambda acc, f: acc
        + F.element_at(lut, (F.pmod(_h64(hash_fn, f), F.lit(b)) + 1).cast("int")),
    )
    avg = F.when(n >= 2, total_lp / (n - 1).cast("double"))
    if round_to is not None:
        avg = F.round(avg, int(round_to)) + F.lit(0.0)
    return base.withColumn("avg_bigram_logprob", avg.cast("double")).drop("__toks")


def _model_slots(spark, keys: list[str], b: int, hash_fn: str) -> dict[str, int]:
    """LUT slot per model key, computed with the SAME hash family the
    projection probes with. md5_60 has an exact python mirror; xxhash64
    does not (no stdlib implementation), so its slots come from one
    tiny Spark job over the key list — model-sized, driver-bounded,
    and paid once at build time."""
    if not keys:
        return {}
    if hash_fn == "md5_60":
        import hashlib

        return {k: int(hashlib.md5(k.encode()).hexdigest()[:15], 16) % b for k in keys}
    from meds_transforms_spark.operators.dedup import _h64

    kdf = spark.createDataFrame([(k,) for k in keys], "k string")
    rows = kdf.select(
        "k", F.pmod(_h64(hash_fn, F.col("k")), F.lit(b)).cast("int").alias("s")
    ).collect()
    return {r["k"]: r["s"] for r in rows}
