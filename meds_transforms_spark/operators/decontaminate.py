"""Benchmark decontamination — flag/drop training documents that
overlap an evaluation corpus.

The standard LLM training-data hygiene step (GPT-3 appendix C / PaLM
style): a training document is *contaminated* when it shares any
word n-gram (n=13 by convention) with any benchmark/eval document.
The reference engine has no counterpart; this is part of the
training-pipeline extension layer (SURVEY §2 addendum).

Plan shape at 100 TB:

- Both corpora explode to (id, 64-bit gram hash) in one codegen'd
  projection each — document text never shuffles, join keys are
  ``(long, long)``.
- The eval side reduces to DISTINCT gram hashes; benchmarks are small
  (thousands of docs), so this side auto-broadcasts (hint available via
  ``broadcast_eval``) and contamination detection becomes a map-side
  LEFT SEMI probe of the training gram stream — zero shuffle of the
  training corpus.
- The contaminated-id set then left-joins back onto the training frame
  on ``id`` — one shuffle of ids, or none when AQE turns it into a
  broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage
from meds_transforms_spark.operators.dedup import word_tokens


@register_stage("ngram_decontaminate")
def ngram_decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    n: int = 13,
    mode: str = "flag",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Mark (``mode="flag"``: adds boolean ``contaminated``) or remove
    (``mode="drop"``) training rows sharing any word ``n``-gram with
    ``eval_df``.

    Overlap is computed on normalized text (lowercased, whitespace
    collapsed). Documents shorter than ``n`` words contribute their
    full token window as one "gram", matching the n-gram definition in
    ``dedup.word_ngrams`` — an exact short eval string still
    decontaminates its copies.

    Gram keys are ``xxhash64`` over the token-window ARRAY slice (not a
    re-joined string): tokens contain no whitespace, so equal windows ⇔
    equal grams, and skipping the per-position string build halves the
    gram-stream cost on top of the 2.5× from materializing the token
    split outside the lambda (no CSE inside higher-order functions).
    """
    if mode not in ("flag", "drop"):
        raise ValueError(f"mode must be 'flag' or 'drop', got {mode!r}")
    eval_text = eval_text_col or text_col

    def gram_hashes(frame, col, keep_cols):
        cnt = F.greatest(F.size("__toks") - F.lit(n - 1), F.lit(1))
        # NULL/empty docs emit NO grams: xxhash64 over a NULL (or
        # empty) slice degenerates to the seed constant, so one blank
        # eval row would otherwise flag every blank training doc as
        # contaminated. A blank doc can't contaminate anything.
        return frame.select(
            *keep_cols, word_tokens(F.col(col)).alias("__toks")
        ).filter(F.size("__toks") >= 1).select(
            *keep_cols,
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), cnt),
                        lambda i: F.xxhash64(F.slice("__toks", i, n)),
                    )
                )
            ).alias("__gh"),
        )

    train_grams = gram_hashes(df, text_col, [F.col(id_col)])
    eval_hashes = gram_hashes(eval_df, eval_text, []).distinct()
    if broadcast_eval:
        eval_hashes = F.broadcast(eval_hashes)
    contaminated = (
        train_grams.join(eval_hashes, "__gh", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("__contam", F.lit(True))
    )
    out = df.join(contaminated, id_col, "left").withColumn(
        "contaminated", F.coalesce(F.col("__contam"), F.lit(False))
    ).drop("__contam")
    if mode == "drop":
        return out.filter(~F.col("contaminated")).drop("contaminated")
    return out
