"""Data Selection via Importance Resampling (DSIR) weights.

Public method: Xie et al., "Data Selection for Language Models via
Importance Resampling" (NeurIPS 2023). Fit two bag-of-hashed-n-gram
unigram models — one on a small TARGET domain (the data you want more
of), one on the RAW pool — and score every raw document by its
importance log-weight

    log w(x) = sum_{feature f in x} [ log p_target(f) - log p_raw(f) ]

with add-1 smoothing over ``n_buckets`` hashed feature buckets.
Selecting the top-weighted (or Gumbel-resampled) documents then shifts
the training mix toward the target domain.

Plan shape (100 TB discipline):

- ONE text scan: tokens + bigrams are exploded once into
  ``(id, is_target, bucket)`` rows — after the hash the shuffle rows
  carry two longs and a boolean, never text.
- Both models come from the SAME aggregation: ``groupBy(bucket)`` with
  a conditional sum, so the target model costs no extra pass.
- The fitted model is a ``n_buckets``-row table (8k rows by default),
  explicitly broadcast back onto the per-doc feature stream.
- Per-doc reduction pre-aggregates on ``(id, bucket)`` (map-side
  combine collapses repeated features) before the model join.

Total: two shuffles of (long, long) tuples plus one broadcast — no
all-pairs anything, linear in corpus bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage
from meds_transforms_spark.operators.dedup import _h64


def _features(text: Column, use_bigrams: bool) -> Column:
    """Lowercased whitespace unigrams (+ adjacent-pair bigrams)."""
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")
    if not use_bigrams:
        return toks
    # Pair each token with its successor via zip_with over a slice —
    # both operate on the SAME array expression so Catalyst CSEs the
    # tokenization (recomputing it per-element is the O(n²) HOF
    # pitfall documented in SCALING.md).
    tail = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    bigrams = F.filter(
        F.zip_with(
            toks,
            tail,
            lambda a, b: F.when(b.isNotNull(), F.concat_ws(" ", a, b)),
        ),
        lambda g: g.isNotNull(),
    )
    return F.concat(toks, bigrams)


@register_stage("fit_dsir_model")
def fit_dsir_model(
    df: DataFrame,
    target: Column | str,
    text_col: str = "text",
    n_buckets: int = 8192,
    use_bigrams: bool = True,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Fit only: the ``(bucket, log_ratio)`` importance model plus its
    smoothing constants — an ``n_buckets``-row frame you can persist
    and serve later (the fit/serve split the hashed classifier uses).
    One text scan, one (bucket) aggregation."""
    if isinstance(target, str):
        target = F.expr(target)
    b = int(n_buckets)
    feats = df.select(
        target.alias("__t"),
        F.explode(_features(F.col(text_col), use_bigrams)).alias("__f"),
    ).select("__t", F.pmod(_h64(hash_fn, F.col("__f")), F.lit(b)).alias("__b"))
    model = feats.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__n_raw"),
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("__n_tgt"),
    )
    totals = model.agg(
        F.sum("__n_raw").alias("__tot_raw"), F.sum("__n_tgt").alias("__tot_tgt")
    )
    return model.crossJoin(F.broadcast(totals)).select(
        F.col("__b").alias("bucket"),
        (
            F.log((F.col("__n_tgt") + 1) / (F.col("__tot_tgt") + b))
            - F.log((F.col("__n_raw") + 1) / (F.col("__tot_raw") + b))
        ).alias("log_ratio"),
        F.log(F.lit(1.0) / (F.col("__tot_tgt") + b)).alias("unseen_tgt_logp"),
        F.log(F.lit(1.0) / (F.col("__tot_raw") + b)).alias("unseen_raw_logp"),
        # fit-time bucket count rides WITH the model so a serve-side
        # n_buckets mismatch is a loud error, never silently wrong
        # hashes (or an IndexError in the projection server)
        F.lit(b).alias("n_buckets"),
    )


def _validated_buckets(model, n_buckets: int) -> int:
    """Serve-side bucket count, cross-checked against the model's
    fit-time value when present (one 1-row probe of the tiny model)."""
    b = int(n_buckets)
    if "n_buckets" in model.columns:
        row = model.select("n_buckets").limit(1).collect()
        if row and row[0][0] is not None and int(row[0][0]) != b:
            raise ValueError(
                f"dsir serve n_buckets={b} != model fit n_buckets="
                f"{int(row[0][0])}; weights would be silently wrong"
            )
    return b


@register_stage("dsir_score")
def dsir_score(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    use_bigrams: bool = True,
    hash_fn: str = "xxhash64",
    round_to: int | None = None,
) -> DataFrame:
    """Serve a fitted DSIR model over new documents (batch or
    stream-static: the scoring side is explode → hash → broadcast model
    join → per-doc sum, no corpus shuffle wider than (id, long)).

    Buckets absent from the model (possible when serving a corpus the
    model never saw and the fit didn't cover all ``n_buckets``) fall
    back to the model's unseen-bucket smoothing mass. When the model
    carries its fit-time ``n_buckets`` column (fit_dsir_model does),
    a mismatched serve-side ``n_buckets`` raises — hashing with the
    wrong modulus would be silently wrong, not approximately right."""
    b = _validated_buckets(model, n_buckets)
    per_doc = (
        df.select(
            F.col(id_col),
            F.explode(_features(F.col(text_col), use_bigrams)).alias("__f"),
        )
        .select(id_col, F.pmod(_h64(hash_fn, F.col("__f")), F.lit(b)).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    # unseen_* are constant across the model — lift them into a 1-row
    # frame (lazy broadcast cross join) so rows whose bucket the model
    # never saw still get the smoothing mass, not NULL.
    consts = model.agg(
        F.first("unseen_tgt_logp").alias("__utgt"),
        F.first("unseen_raw_logp").alias("__uraw"),
    )
    scored = per_doc.join(F.broadcast(model), "bucket", "left").crossJoin(
        F.broadcast(consts)
    )
    lr = F.coalesce(F.col("log_ratio"), F.col("__utgt") - F.col("__uraw"))
    weights = scored.groupBy(id_col).agg(
        F.sum(F.col("__n") * lr).alias("__w")
    )
    w = F.coalesce(F.col("__w"), F.lit(0.0))
    if round_to is not None:
        w = F.round(w, int(round_to)) + F.lit(0.0)
    return (
        df.join(weights, id_col, "left")
        .withColumn("dsir_logweight", w.cast("double"))
        .drop("__w")
    )


@register_stage("dsir_score_projection")
def dsir_score_projection(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    n_buckets: int = 8192,
    use_bigrams: bool = True,
    hash_fn: str = "xxhash64",
    round_to: int | None = None,
) -> DataFrame:
    """Serve a fitted DSIR model as a PURE PROJECTION: the model
    collapses to ONE dense array literal indexed by bucket (the
    pca_transform inline-the-model pattern), and the per-doc weight is
    an array aggregate over the feature stream — no explode, no
    groupBy, no join, zero shuffle.

    This is the streaming-native serving path (``dsir_score``'s
    relational form needs a per-doc aggregation, which a watermarkless
    stream can't run): attach it to a readStream like any stateless
    text operator. The collect here is the MODEL (``n_buckets`` rows,
    64 KB at the default 8k), never data."""
    b = _validated_buckets(model, n_buckets)
    rows = model.collect()
    if rows:
        unseen = rows[0]["unseen_tgt_logp"] - rows[0]["unseen_raw_logp"]
    else:
        unseen = 0.0
    dense = [float(unseen)] * b
    for r in rows:
        dense[int(r["bucket"])] = float(r["log_ratio"])
    lut = F.lit(dense)  # ONE ArrayType literal node
    feats = _features(F.col(text_col), use_bigrams)
    w = F.aggregate(
        feats,
        F.lit(0.0),
        lambda acc, f: acc
        + F.element_at(lut, (F.pmod(_h64(hash_fn, f), F.lit(b)) + 1).cast("int")),
    )
    w = F.coalesce(w, F.lit(0.0))
    if round_to is not None:
        w = F.round(w, int(round_to)) + F.lit(0.0)
    return df.withColumn("dsir_logweight", w.cast("double"))


@register_stage("dsir_weights")
def dsir_weights(
    df: DataFrame,
    target: Column | str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    use_bigrams: bool = True,
    hash_fn: str = "xxhash64",
    round_to: int | None = None,
) -> DataFrame:
    """Attach ``dsir_logweight`` to every document of ``df``.

    ``target`` is a boolean Column (or SQL string) marking the
    target-domain documents INSIDE ``df`` — e.g. a trusted source
    (``"source = 'wiki'"``) or a quality flag from
    :func:`~meds_transforms_spark.operators.text.gopher_quality_filter`.
    Both unigram models are fit in one aggregation pass; documents with
    no tokens get weight 0.0. ``hash_fn="md5_60"`` makes the feature
    hashing engine-independent so a SQL oracle can replay the whole
    fit + score pipeline; ``hash_fn="poly64"`` is ALSO
    oracle-replayable and routes the feature stream through the Arrow
    kernel (operators/grams.word_feature_bucket_counts_poly): per-doc
    bucket counts come out of one numpy pass per batch — no
    interpreted per-feature HOF, no feature-string explode, and the
    first exchange carries pre-aggregated (id, t, bucket, n) rows.
    ``round_to`` absorbs cross-engine ``ln`` ULPs the same way the
    tf_idf/unigram oracles do.
    """
    if isinstance(target, str):
        target = F.expr(target)
    b = int(n_buckets)
    if hash_fn == "poly64":
        from meds_transforms_spark.operators.grams import (
            word_feature_bucket_counts_poly,
        )

        per_doc = word_feature_bucket_counts_poly(
            df.select(F.col(id_col), target.alias("__t"), F.col(text_col)).where(
                F.col(id_col).isNotNull()
            ),
            n_buckets=b,
            text_col=text_col,
            passthrough=(id_col, "__t"),
            use_bigrams=use_bigrams,
        )
        # kernel output is already per-(doc, t, bucket) counts; pin it —
        # the model rollup AND the weight join both consume it, and a
        # Python-stage subtree never canonicalizes into ReusedExchange
        per_doc = per_doc.localCheckpoint(eager=False)
    else:
        feats = df.select(
            F.col(id_col),
            target.alias("__t"),
            F.explode(_features(F.col(text_col), use_bigrams)).alias("__f"),
        ).select(
            id_col, "__t", F.pmod(_h64(hash_fn, F.col("__f")), F.lit(b)).alias("__b")
        )
        # Semantically a no-op (__f is non-null ⇒ __b is non-null), but
        # it matters for the plan: the broadcast join below injects this
        # exact null filter into ITS branch only, which would
        # de-canonicalize the two consumers of per_doc and defeat
        # ReuseExchange — with the filter on both, the (id, t, bucket)
        # shuffle is computed once and the model rollup reads the reused
        # exchange instead of re-scanning and re-exploding the text.
        # (same story for the id: the final left join pushes
        # isnotnull(doc_id) into its branch's scan only)
        feats = feats.where(F.col("__b").isNotNull() & F.col(id_col).isNotNull())
        # ONE pass over the exploded text: pre-aggregate on (doc,
        # bucket). Both the per-doc reduction AND the model derive from
        # this frame — the model rollup reads #docs×#distinct-buckets
        # rows, not the raw feature stream, so text is scanned and
        # exploded exactly once.
        per_doc = feats.groupBy(id_col, "__t", "__b").agg(
            F.count(F.lit(1)).alias("__n")
        )
    model = per_doc.groupBy("__b").agg(
        F.sum("__n").alias("__n_raw"),
        F.sum(F.when(F.col("__t"), F.col("__n")).otherwise(0)).alias("__n_tgt"),
    )
    totals = model.agg(
        F.sum("__n_raw").alias("__tot_raw"), F.sum("__n_tgt").alias("__tot_tgt")
    )
    # Lazy 1-row broadcast cross join — no driver round-trip.
    scored = model.crossJoin(F.broadcast(totals)).select(
        "__b",
        (
            F.log((F.col("__n_tgt") + 1) / (F.col("__tot_tgt") + b))
            - F.log((F.col("__n_raw") + 1) / (F.col("__tot_raw") + b))
        ).alias("__lr"),
    )
    weights = (
        per_doc.join(F.broadcast(scored), "__b")
        .groupBy(id_col)
        .agg(F.sum(F.col("__n") * F.col("__lr")).alias("__w"))
    )
    w = F.coalesce(F.col("__w"), F.lit(0.0))
    if round_to is not None:
        w = F.round(w, int(round_to)) + F.lit(0.0)
    return (
        df.join(weights, id_col, "left")
        .withColumn("dsir_logweight", w.cast("double"))
        .drop("__w")
    )
