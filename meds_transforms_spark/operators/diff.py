"""Corpus snapshot diff: what changed between two dataset versions.

Every recurring ingestion (monthly crawl, re-sync, re-filter with new
thresholds) needs the regression question answered BEFORE training:
how many documents appeared, vanished, or changed, and where? This is
the dataset-versioning audit primitive — the corpus analog of a schema
migration review.

100 TB design: one full outer join on the id (the only shuffle; both
sides pre-projected to ``(id, group, 64-bit content fingerprint,
length)`` so the join carries ~40-byte rows, never text), then one
small-key aggregation per group. Output is |groups| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage
from meds_transforms_spark.operators.dedup import _h64, _normalized


def _fingerprinted(
    df: DataFrame, id_col: str, text_col: str, group_col: str | None, side: str
) -> DataFrame:
    cols = [
        F.col(id_col).alias("__id"),
        # fp stays NULL for NULL text (xxhash64(NULL) would return the
        # seed constant, silently equating NULL with a real document) —
        # the status comparison is null-safe so NULL<->non-NULL counts
        # as 'changed' and NULL<->NULL as 'unchanged', matching SQL's
        # IS DISTINCT FROM on the normalized text.
        F.when(
            F.col(text_col).isNotNull(),
            _h64("xxhash64", _normalized(F.col(text_col))),
        ).alias(f"__fp_{side}"),
        F.coalesce(F.length(text_col), F.lit(0)).cast("long").alias(f"__len_{side}"),
        F.lit(1).alias(f"__in_{side}"),
    ]
    if group_col is not None:
        cols.append(F.col(group_col).alias(f"__grp_{side}"))
    return df.select(*cols)


@register_stage("corpus_diff")
def corpus_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = "source",
) -> DataFrame:
    """Per-group change report between two corpus snapshots.

    One row per group: ``n_added`` (id only in new), ``n_removed`` (id
    only in old), ``n_changed`` (both, different normalized-text
    fingerprint), ``n_unchanged``, and the char mass entering/leaving
    (``chars_added`` = new chars of added+changed docs,
    ``chars_removed`` = old chars of removed+changed docs). "Changed"
    is content identity on the dedup-family normalization (case /
    whitespace drift does not count as change), modulo 64-bit
    fingerprint collisions. A doc that moved groups counts in its NEW
    group (added docs have no old group by definition; the group of
    record is where the doc lives now, falling back to the old group
    for removed docs).

    A NULL text is distinct from every non-NULL text (NULL<->non-NULL
    transitions count as 'changed'; NULL<->NULL is 'unchanged').

    Precondition: ``id_col`` must be unique within each snapshot —
    duplicate ids multiply through the full-outer join and inflate
    every counter. Run :func:`~meds_transforms_spark.operators.ids.
    assign_stable_ids` (which validates uniqueness) upstream if ids
    are not already trusted.

    ``group_col=None`` produces the single-row whole-corpus report
    (group = '<all>').
    """
    old = _fingerprinted(old_df, id_col, text_col, group_col, "o")
    new = _fingerprinted(new_df, id_col, text_col, group_col, "n")
    j = old.join(new, "__id", "full_outer")
    status = (
        F.when(F.col("__in_o").isNull(), F.lit("added"))
        .when(F.col("__in_n").isNull(), F.lit("removed"))
        .when(~F.col("__fp_o").eqNullSafe(F.col("__fp_n")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    if group_col is not None:
        grp = F.coalesce(F.col("__grp_n"), F.col("__grp_o")).alias("group")
    else:
        grp = F.lit("<all>").alias("group")
    rows = j.select(
        grp,
        status.alias("__st"),
        F.coalesce(F.col("__len_o"), F.lit(0)).alias("__lo"),
        F.coalesce(F.col("__len_n"), F.lit(0)).alias("__ln"),
    )
    st = F.col("__st")
    return rows.groupBy("group").agg(
        F.sum(F.when(st == "added", 1).otherwise(0)).cast("long").alias("n_added"),
        F.sum(F.when(st == "removed", 1).otherwise(0)).cast("long").alias("n_removed"),
        F.sum(F.when(st == "changed", 1).otherwise(0)).cast("long").alias("n_changed"),
        F.sum(F.when(st == "unchanged", 1).otherwise(0))
        .cast("long")
        .alias("n_unchanged"),
        F.sum(F.when(st.isin("added", "changed"), F.col("__ln")).otherwise(0))
        .cast("long")
        .alias("chars_added"),
        F.sum(F.when(st.isin("removed", "changed"), F.col("__lo")).otherwise(0))
        .cast("long")
        .alias("chars_removed"),
    )
