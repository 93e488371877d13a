"""prepare_training_corpus — the composed LLM-data pipeline.

One call chains the extension operators into the standard pretraining
data-prep shape:

    raw documents
      → text_stats + quality_score        (codegen projections)
      → quality filter
      → exact_dedup                       (content-hash window)
      → minhash_lsh_dedup                 (near-dup LSH collapse)
      → language filter (optional)
      → fingerprint + token counts attached
      → write partitioned by (lang, quality bucket)   [optional]

Everything stays one lazy Catalyst plan until the optional write; the
only shuffles are the two dedup key exchanges. Partitioning the output
by (lang, quality_bucket) gives downstream sampling jobs partition
pruning — e.g. "high-quality English only" reads a directory subtree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prepare_training_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    min_tokens: int = 10,
    near_dedup: bool = True,
    languages: list[str] | None = None,
    num_hashes: int = 32,
    bands: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Returns the cleaned corpus with quality/stats columns attached."""
    from meds_transforms_spark.operators.dedup import exact_dedup, minhash_lsh_dedup
    from meds_transforms_spark.operators.text import (
        fingerprint,
        language_id,
        quality_score,
        token_count,
    )

    out = token_count(docs, text_col=text_col)
    out = quality_score(out, text_col=text_col)
    out = out.filter(
        (F.col("quality") >= float(min_quality)) & (F.col("n_tokens") >= int(min_tokens))
    )
    out = exact_dedup(out, text_col=text_col, id_col=id_col)
    if near_dedup:
        out = minhash_lsh_dedup(
            out, text_col=text_col, id_col=id_col,
            num_hashes=num_hashes, bands=bands, hash_fn=hash_fn,
        )
    out = language_id(out, text_col=text_col)
    if languages:
        out = out.filter(F.col("lang_pred").isin(list(languages)))
    out = fingerprint(out, text_col=text_col)
    return out.withColumn(
        "quality_bucket", F.least(F.floor(F.col("quality") * 10).cast("int"), F.lit(9))
    )


def write_training_corpus(corpus: DataFrame, path: str) -> None:
    """Partitioned export: downstream readers prune by language/quality."""
    (
        corpus.write.mode("overwrite")
        .partitionBy("lang_pred", "quality_bucket")
        .parquet(path)
    )


def curate_corpus_dsir(
    docs,
    target,
    min_words: int = 40,
    min_required_stopwords: int = 1,
    top_k: int = 100,
    budget: int = 512,
    hash_fn: str = "xxhash64",
    round_to: int | None = None,
):
    """The round-2c curation composition: published Gopher rules →
    exact dedup → DSIR importance weighting toward a target domain →
    top-k selection → sequence packing. Every stage is the scale-shaped
    operator documented in its own module; chaining them adds NO new
    shuffles beyond each stage's own (the stages exchange only
    id-keyed frames).

    Returns the pack assignment for the selected documents:
    ``(doc_id, n_tokens, pack_id, pack_pos, pack_offset)``.
    """
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.dedup import exact_dedup
    from meds_transforms_spark.operators.dsir import dsir_weights
    from meds_transforms_spark.operators.packing import pack_sequences
    from meds_transforms_spark.operators.text import (
        gopher_quality_filter,
        token_count,
    )

    g = gopher_quality_filter(
        docs, min_words=min_words, min_required_stopwords=min_required_stopwords
    )
    kept = g.filter("gopher_pass").select(*docs.columns)
    deduped = exact_dedup(kept)
    weighted = dsir_weights(deduped, target, hash_fn=hash_fn, round_to=round_to)
    # top-k: weights are rounded (engine-identical), doc_id breaks ties
    sel = weighted.orderBy(
        F.desc("dsir_logweight"), F.col("doc_id")
    ).limit(int(top_k))
    counted = token_count(sel)
    return pack_sequences(counted, budget=int(budget), order="hash", hash_fn=hash_fn)
