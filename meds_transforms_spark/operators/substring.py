"""Duplicated-substring coverage — the exact-substring dedup signal.

Suffix-array substring dedup (Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better") finds verbatim spans shared across
documents. A literal distributed suffix array is a poor fit for Spark's
shuffle model; the relational formulation below computes the same
*signal* — which character positions of each document sit inside a
substring that also occurs elsewhere in the corpus — as three
hash-keyed aggregations:

1. positional char k-grams at a configurable ``stride`` (stride=1 is
   exact position coverage; stride=k//2 guarantees every duplicated
   span of length >= 1.5k still hits a sampled gram, at 1/stride the
   row volume);
2. corpus-wide document frequency per gram hash (two map-side-combined
   aggregations: (doc, hash) then hash — never a count-distinct
   expand);
3. join the duplicated hash set back and roll up per document.

Shuffled rows carry ``(long, long[, int])`` only — text bytes never
leave the scan stage. At 100 TB the dominant cost is the positional
explode, which is why ``stride`` exists; the hash-side tables are a
few percent of corpus size.

Reference has no such operator (its dedup plane is
``/root/reference/src/MEDS_transforms/__init__.py`` — none); this is
part of the training-data-pipeline extension layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage
from meds_transforms_spark.operators.dedup import _h64, _normalized


def positional_gram_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    stride: int = 1,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """One row per sampled gram position: (id, pos, gram hash).

    Positions are 1-based over the *normalized* text (lowercased,
    whitespace collapsed) so trivial formatting differences don't hide
    duplication. Documents shorter than ``k`` produce no rows.
    """
    # Two-level chunked explode (same trick as dedup.lsh_band_buckets):
    # a direct per-position explode makes every generated row carry the
    # FULL normalized text — O(len²/stride) bytes through the generate
    # output. Splitting into CH-char chunks with a (k-1)-char overlap
    # first means position rows carry ≤ CH+k-1 bytes. The sampled
    # position stream is identical: chunk c covers global positions
    # (c·CH, c·CH+CH]; its first sampled offset is the smallest i ≥ 1
    # with c·CH+i ≡ 1 (mod stride), and the overlap supplies the
    # cross-boundary gram bytes, so substr(chunk, i, k) ==
    # substr(norm, c·CH+i, k) for every emitted (c, i).
    chunk = 64
    norm = _normalized(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("__id"),
        norm.alias("__norm"),
        (F.length(norm) - F.lit(k - 1)).alias("__n_pos"),
    ).filter(F.col("__n_pos") >= 1)
    chunks = base.select(
        "__id",
        "__n_pos",
        F.explode(
            F.sequence(F.lit(0), F.floor((F.col("__n_pos") - 1) / chunk).cast("int"))
        ).alias("__c"),
        F.col("__norm"),
    ).select(
        "__id",
        F.col("__norm")
        .substr(F.col("__c") * chunk + 1, F.lit(chunk + k - 1))
        .alias("__chunk"),
        (F.col("__c") * chunk).alias("__off"),
        F.least(F.lit(chunk), F.col("__n_pos") - F.col("__c") * chunk).alias("__hi"),
    )
    first_i = F.pmod(-F.col("__off"), F.lit(stride)) + 1
    positions = F.when(
        F.col("__hi") >= first_i, F.sequence(first_i, F.col("__hi"), F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    return (
        chunks.select(
            "__id", "__chunk", "__off", F.explode(positions).alias("__i")
        )
        .select(
            F.col("__id").alias(id_col),
            (F.col("__off") + F.col("__i")).alias("pos"),
            _h64(hash_fn, F.col("__chunk").substr(F.col("__i"), F.lit(k))).alias(
                "gram_hash"
            ),
        )
    )


@register_stage("duplicated_span_stats")
def duplicated_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    stride: int = 1,
    min_df: int = 2,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Annotate each document with its duplicated-substring coverage.

    Output columns (added to ``df``):

    - ``n_positions``      sampled gram positions in the doc (0 if len < k)
    - ``n_dup_positions``  positions whose k-gram occurs in >= ``min_df``
                           distinct documents
    - ``dup_fraction``     ratio (NULL when ``n_positions`` is 0)

    Plan shape, ``min_df <= 2`` (the standard "occurs elsewhere"
    setting, and the default): the duplicated count is computed as the
    COMPLEMENT of the unique count — a df==1 gram belongs to exactly
    one document, so ``min(id)``/``min(n_local)`` inside the per-hash
    aggregate attribute it to its owner with no join-back at all:

        explode → groupBy(id, hash) ─┬→ groupBy(id)   [totals]
                                     └→ groupBy(hash) [df + owner]
                                          → filter df==1 → groupBy(id)
        n_dup_positions = n_positions − n_unique_positions

    Every exchange carries long keys and has map-side partial
    aggregation, so a boilerplate gram appearing in millions of
    documents combines to one row per map partition before it ever
    shuffles — unlike the join-back (hot build key) or a window over
    the hash (one task owns the hot partition, not AQE-splittable),
    this shape has NO skew-sensitive stage. Measured 1.5× faster than
    the join topology at sf0.1 (2.2 s vs 3.3 s, identical results;
    window variant ties at 2.2 s but carries the skew hazard).

    General ``min_df > 2`` keeps the join topology: low-df grams can
    span up to min_df−1 documents, so single-owner attribution doesn't
    apply (a bounded per-hash owner collect would still blow up on hot
    grams). All shuffle keys remain 64-bit longs; the gram stream is
    generated ONCE either way — both counts roll up from the same
    (id, hash, n_local) aggregate, so the text scan isn't repeated
    (matters when ``df`` is an expensive upstream rather than a
    parquet scan).
    """
    grams = positional_gram_hashes(
        df, text_col=text_col, id_col=id_col, k=k, stride=stride, hash_fn=hash_fn
    )
    # (doc, hash) local occurrence counts — collapses repeated grams
    # within a doc before the global aggregation (map-side combine
    # makes this the cheap half of the pair of shuffles).
    per_doc = grams.groupBy(id_col, "gram_hash").agg(
        F.count("*").alias("n_local")
    )
    totals = per_doc.groupBy(id_col).agg(
        F.sum("n_local").cast("long").alias("n_positions")
    )
    if min_df <= 2:
        # df < min_df ⇔ df == 1 (or nothing, when min_df <= 1): the
        # single contributing row makes min() exact for both columns.
        uniq = (
            per_doc.groupBy("gram_hash")
            .agg(
                F.count("*").alias("df_docs"),
                F.min(id_col).alias(id_col),
                F.min("n_local").alias("n_local"),
            )
            .filter(F.col("df_docs") < min_df)
            .groupBy(id_col)
            .agg(F.sum("n_local").cast("long").alias("__n_uniq"))
        )
        stats = (
            totals.join(uniq, id_col, "left")
            .withColumn(
                "n_dup_positions",
                (
                    F.col("n_positions") - F.coalesce(F.col("__n_uniq"), F.lit(0))
                ).cast("long"),
            )
            .drop("__n_uniq")
        )
    else:
        # corpus document frequency per hash, WITHOUT count-distinct:
        # the (doc, hash) pre-aggregation already made rows unique per
        # doc.
        dup_hashes = (
            per_doc.groupBy("gram_hash")
            .agg(F.count("*").alias("df_docs"))
            .filter(F.col("df_docs") >= min_df)
            .select("gram_hash")
        )
        dup_per_doc = (
            per_doc.join(dup_hashes, "gram_hash", "inner")
            .groupBy(id_col)
            .agg(F.sum("n_local").alias("n_dup_positions"))
        )
        stats = totals.join(dup_per_doc, id_col, "left").withColumn(
            "n_dup_positions", F.coalesce(F.col("n_dup_positions"), F.lit(0)).cast("long")
        )
    stats = stats.withColumn(
        "dup_fraction", F.col("n_dup_positions") / F.col("n_positions")
    )
    return (
        df.join(stats, id_col, "left")
        .withColumn("n_positions", F.coalesce(F.col("n_positions"), F.lit(0)).cast("long"))
        .withColumn(
            "n_dup_positions", F.coalesce(F.col("n_dup_positions"), F.lit(0)).cast("long")
        )
    )


@register_stage("filter_duplicated_spans")
def filter_duplicated_spans(
    df: DataFrame,
    max_dup_fraction: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    stride: int = 1,
    min_df: int = 2,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Drop documents whose duplicated-substring coverage exceeds
    ``max_dup_fraction`` (docs too short to sample any gram are kept)."""
    stats = duplicated_span_stats(
        df,
        text_col=text_col,
        id_col=id_col,
        k=k,
        stride=stride,
        min_df=min_df,
        hash_fn=hash_fn,
    )
    keep = (F.col("dup_fraction").isNull()) | (
        F.col("dup_fraction") <= F.lit(max_dup_fraction)
    )
    return stats.filter(keep).drop("n_positions", "n_dup_positions", "dup_fraction")
