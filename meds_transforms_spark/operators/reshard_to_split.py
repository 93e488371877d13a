"""reshard_to_split — split assignment + subject-aligned repartitioning.

Reference semantics (src/MEDS_transforms/stages/reshard_to_split/
reshard_to_split.py:25-195): assign subjects to train/tuning/held_out
splits by a seeded permutation, then rewrite shards so each shard holds
whole subjects of one split (merge-sorted by subject).

Spark restatement: shard files are not a first-class concept — the
equivalents are (a) the split-assignment table and (b) a write layout
``partitionBy("split")`` + ``repartition(subject_id)`` +
``sortWithinPartitions`` so all downstream per-subject operators are
co-partitioned and partition-pruned. The seeded permutation runs
driver-side with numpy over the (small) distinct-subject list, exactly
as the reference does (§7: "never reimplement in Spark") — bit-identical
split assignment for the same seed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage
from meds_transforms_spark.schema import ORDER_KEY, SUBJECT_ID, TIME


DEFAULT_SPLIT_FRACS = {"train": 0.8, "tuning": 0.1, "held_out": 0.1}


def hash_split_expr(
    split_fracs: dict[str, float] | None = None, seed: int = 0
) -> F.Column:
    """Split assignment as a pure column expression over ``subject_id``.

    ``u = pmod(xxhash64(subject_id, seed), 2³²)/2³²`` is uniform per
    subject; cutting u at the cumulative fraction boundaries yields the
    split. Fully distributed — no collect, no join, no shuffle: the
    expression inlines into whatever plan consumes it, so it scales to
    any subject count (the escape hatch for corpora whose distinct
    subjects exceed driver memory). NOT seed-compatible with the
    reference's numpy permutation (use ``assign_splits`` when
    bit-parity with reshard_to_split.py:133-160 matters); fractions are
    binomial-approximate, not exact cuts.
    """
    split_fracs = split_fracs or DEFAULT_SPLIT_FRACS
    names = list(split_fracs)
    total = float(sum(split_fracs.values()))
    u = F.pmod(F.xxhash64(F.col(SUBJECT_ID), F.lit(int(seed))), F.lit(2**32)) / F.lit(
        float(2**32)
    )
    expr = F.lit(names[-1])
    cum = 0.0
    branches = []
    for n in names[:-1]:
        cum += split_fracs[n] / total
        branches.append((cum, n))
    for bound, name in reversed(branches):
        expr = F.when(u < F.lit(bound), F.lit(name)).otherwise(expr)
    return expr


def assign_splits(
    df: DataFrame,
    split_fracs: dict[str, float] | None = None,
    seed: int = 0,
    method: str = "permutation",
) -> DataFrame:
    """(subject_id, split) assignment via seeded numpy permutation.

    BIT-IDENTICAL split membership to the reference's shard_subjects
    (reshard_to_split.py:114-160) for the same seed, reproducing its
    full RNG sequence and sizing rules: (1) null fractions dropped and
    the remainder must sum to ~1 (raise, never silently normalize);
    (2) the FIRST rng draw permutes the split NAMES; (3) per-split
    sizes are round(frac·n) with the LAST permuted split absorbing the
    remainder; (4) an empty split borrows one subject from the largest
    (raise if still empty); (5) the SECOND rng draw permutes the
    np.unique-sorted subject array, cut at the cumulative sizes.
    Verified against the reference doctest goldens
    (reshard_to_split.py:64-68). Driver-side numpy on the
    distinct-subject list (#subjects ≪ #rows; at 100 TB with ~10⁸
    subjects this is still a few GB of int64). ``method="hash"``
    switches to the fully distributed :func:`hash_split_expr`
    assignment (no driver collect, seed-incompatible with the
    reference) for corpora beyond that.
    """
    import math

    import numpy as np

    split_fracs = split_fracs or DEFAULT_SPLIT_FRACS
    if method == "hash":
        return (
            df.select(SUBJECT_ID)
            .distinct()
            .select(SUBJECT_ID, hash_split_expr(split_fracs, seed).alias("split"))
        )
    if method != "permutation":
        raise ValueError(f"unknown split method: {method!r}")
    split_fracs = {k: v for k, v in split_fracs.items() if v is not None}
    cover = sum(split_fracs.values()) if split_fracs else 0
    if not math.isclose(cover, 1):
        raise ValueError(
            f"The sum of the split fractions must be equal to 1. Got {cover} "
            f"through {split_fracs}."
        )
    subjects = np.array(
        [r[0] for r in df.select(SUBJECT_ID).distinct().orderBy(SUBJECT_ID).collect()]
    )
    n = len(subjects)
    rng = np.random.default_rng(seed)
    names_idx = rng.permutation(len(split_fracs))
    names = np.array(list(split_fracs.keys()))[names_idx]
    fracs = np.array([split_fracs[k] for k in names])
    lens = np.round(fracs[:-1] * n).astype(int)
    lens = np.append(lens, n - lens.sum())
    if lens.min() == 0:
        lens[lens.argmax()] -= 1
        lens[lens.argmin()] += 1
    if lens.min() == 0:
        raise ValueError(
            "Unable to adjust splits to ensure all splits have at least 1 subject."
        )
    perm = rng.permutation(subjects)
    parts = np.split(perm, lens.cumsum())
    rows = [
        (int(s), str(name))
        for name, part in zip(names, parts)
        for s in part
    ]
    return df.sparkSession.createDataFrame(rows, "subject_id long, split string")


@register_stage("reshard_to_split")
def reshard_to_split(
    df: DataFrame,
    subject_splits: DataFrame | None = None,
    split_fracs: dict[str, float] | None = None,
    seed: int = 0,
    n_partitions: int | None = None,
    method: str = "permutation",
) -> DataFrame:
    """Attach ``split`` and repartition/sort by subject.

    The returned frame is ready for ``write.partitionBy("split")`` —
    the Spark equivalent of the reference's whole-subject shard files
    (merge_sorted at :315 becomes repartition + sortWithinPartitions).

    ``method="hash"`` (and no explicit ``subject_splits``) attaches the
    split as an inline column expression — no collect, no broadcast, no
    join at all — the path for subject counts beyond driver memory.
    """
    if subject_splits is None and method == "hash":
        joined = df.withColumn("split", hash_split_expr(split_fracs, seed))
    else:
        splits = subject_splits or assign_splits(df, split_fracs, seed, method)
        joined = df.join(F.broadcast(splits), on=SUBJECT_ID, how="left")
    parts = [n_partitions] if n_partitions else []
    sort_cols = [SUBJECT_ID, F.col(TIME).asc_nulls_first()]
    if ORDER_KEY in df.columns:
        sort_cols.append(F.col(ORDER_KEY))
    return joined.repartition(*parts, SUBJECT_ID).sortWithinPartitions(*sort_cols)
