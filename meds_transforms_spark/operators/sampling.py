"""Deterministic sampling / balancing — dataset-curation operators.

A 100 TB training-data pipeline constantly downsamples: cap a crawl
source, balance languages, carve a reproducible eval slice. Spark's
``df.sample``/``sampleBy`` draw from per-partition RNG streams, so the
selected set changes with partitioning, retries, and engine — useless
as a dataset DEFINITION. These operators instead hash a caller-chosen
key: a row is in the sample iff ``hash(seed, key) mod M < fraction·M``.

Properties that matter at scale:
- Pure codegen projections + filter — no shuffle, no RNG state, no
  driver coordination; pushes down like any filter.
- Reproducible across runs, partitionings, AND engines (the
  ``md5_60`` hash mode matches DuckDB's md5 arithmetic exactly, so
  sampling queries are oracle-checkable like everything else).
- CORRELATED: hashing the same key (e.g. subject_id) in different
  tables selects the SAME entities everywhere — a consistent
  cross-table subsample without any join.
- ``group_cap`` is the exact per-group variant (hard cap, not a rate):
  one shuffle on the group key, a row_number window, a filter — the
  same plan shape as any per-group window stage.

The reference has no sampling stage (SURVEY §2; its only subsetting is
predicate filters + train/test splits in reshard_to_split.py:133-160,
which uses driver-side seeded numpy over distinct subjects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage
from meds_transforms_spark.operators.dedup import _h64

#: hash-space modulus: fractions are expressed as thresholds out of M,
#: so rates are exact multiples of 1e-6 (and the SQL stays readable).
M = 1_000_000


def _bucket(on: list[str], seed: int, hash_fn: str):
    cols = [F.lit(int(seed)).cast("string"), *[F.col(c) for c in on]]
    return F.pmod(_h64(hash_fn, *cols), F.lit(M))


@register_stage("deterministic_sample")
def deterministic_sample(
    df: DataFrame,
    fraction: float,
    on: list[str] | str,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided by ``hash(seed, on…)`` —
    stable under re-partitioning/retries; same-key rows across tables
    are kept or dropped together."""
    on = [on] if isinstance(on, str) else list(on)
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(_bucket(on, seed, hash_fn) < F.lit(int(round(fraction * M))))


@register_stage("stratified_sample")
def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    on: list[str] | str,
    seed: int = 0,
    default_fraction: float = 0.0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-stratum keep rates (e.g. balance languages) in ONE filter —
    a when-chain maps the stratum to its threshold; no per-stratum scan
    or union, unlike ``sampleBy`` the decision is hash-deterministic."""
    on = [on] if isinstance(on, str) else list(on)
    thresh = None
    for value, frac in fractions.items():
        cond = F.col(strata_col) == F.lit(value)
        t = F.lit(int(round(frac * M)))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = (
        F.lit(int(round(default_fraction * M)))
        if thresh is None
        else thresh.otherwise(F.lit(int(round(default_fraction * M))))
    )
    return df.filter(_bucket(on, seed, hash_fn) < thresh)


@register_stage("group_cap")
def group_cap(
    df: DataFrame,
    group_cols: list[str] | str,
    n: int,
    on: list[str] | str | None = None,
    order_by: list[str] | None = None,
    seed: int = 0,
    hash_fn: str = "xxhash64",
    two_phase: bool = True,
) -> DataFrame:
    """Hard cap: at most ``n`` rows per group — source/domain caps.

    Survivors are the first ``n`` by ``order_by``, or by a deterministic
    hash of ``on`` (a shuffled-but-stable order) when only ``on`` is
    given; the hash (then ``on`` itself) always tie-breaks, so the
    result is a function of the data alone.

    Two-phase plan (the scalable per-key top-k): a single window on the
    group key sorts EVERY group's rows in one task — a billion-row
    domain capped to 5 is a one-core straggler (external sort included).
    Phase 1 caps within ``(group, input partition)`` — the shuffle key
    carries the partition id, so even one giant group spreads over all
    reducers; phase 2 ranks only the ≤ n·P survivors per group. Any
    input partition holding a global-top-n row ranks it ≤ n locally, so
    phase 1 always retains a superset of the answer, and phase 2's
    total order (order + hash + key tiebreaks) makes the final result
    independent of partitioning.

    Measured honestly (SCALING.md): the extra exchange + second window
    cost ~3× at ≤10M-row groups on local[32], where a one-task
    in-memory sort is cheap — the two-phase win needs groups big enough
    to spill or monopolize a core (≳10⁸ rows). ``two_phase=False``
    picks the single-window plan for workloads whose groups are known
    small.
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if on is None and order_by is None:
        raise ValueError("pass `on` (hash order) and/or `order_by`")
    on = [on] if isinstance(on, str) else list(on or [])
    order = [F.col(c) for c in (order_by or [])]
    if on:
        order += [_bucket(on, seed, hash_fn), *[F.col(c) for c in on]]
    else:
        # order_by alone can tie at the cap boundary, making the
        # survivor set partition-dependent — append a content hash over
        # every hashable column so the total order is a function of the
        # data alone (exact duplicate rows remain interchangeable).
        from pyspark.sql.types import MapType

        hashable = [
            c for c in df.columns
            if not isinstance(df.schema[c].dataType, MapType)
        ]
        order += [_bucket(hashable, seed, hash_fn)]

    survivors = df
    if two_phase:
        w1 = W.partitionBy(*group_cols, "__pid").orderBy(*order)
        survivors = (
            df.withColumn("__pid", F.spark_partition_id())
            .withColumn("__rn", F.row_number().over(w1))
            .filter(F.col("__rn") <= n)
            .drop("__pid", "__rn")
        )
    w2 = W.partitionBy(*group_cols).orderBy(*order)
    return (
        survivors.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


@register_stage("cluster_balanced_sample")
def cluster_balanced_sample(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    cap_per_cluster: int = 100,
    centroids: DataFrame | None = None,
    iters: int = 0,
    seed: int = 0,
    hash_fn: str = "xxhash64",
    two_phase: bool = True,
) -> DataFrame:
    """Embedding-space balanced curation: nearest-centroid cluster
    assignment + a per-cluster hard cap in deterministic hash order —
    the embedding analog of per-domain caps, downweighting
    over-represented semantic modes of a corpus before training.

    Assignment reuses the IVF machinery (:func:`ivf.build_ivf_index`:
    deterministic seed centroids, broadcast to a map-side scoring join,
    optional ``iters`` Lloyd refinements via :func:`ivf.kmeans_refine`);
    the cap reuses :func:`group_cap`'s two-phase per-key top-k, so a
    corpus collapsed into one giant cluster still spreads over all
    reducers. Returns ``(id, cluster_id)`` for the kept rows —
    broadcast-join back to the corpus for payloads.
    """
    from meds_transforms_spark.operators.ivf import build_ivf_index, kmeans_refine

    if centroids is None and iters:
        centroids = kmeans_refine(df, n_cells, iters, id_col, vec_col)
    idx = build_ivf_index(df, n_cells, id_col, vec_col, centroids=centroids)
    assigned = idx.select(
        F.col("vec_id").alias(id_col), F.col("__cell").alias("cluster_id")
    )
    return group_cap(
        assigned,
        "cluster_id",
        cap_per_cluster,
        on=id_col,
        seed=seed,
        hash_fn=hash_fn,
        two_phase=two_phase,
    )


def _order_bucket(ord_col, hash_fn: str, n_buckets: int):
    """Monotone (order-preserving) bucket of a hash-order key: every
    row in bucket i precedes every row in bucket i+1, so per-bucket
    running sums compose into an exact global prefix sum. Deterministic
    — unlike ``repartitionByRange`` there is no sampled partitioner to
    pin, so lineage recomputation can never re-draw boundaries."""
    if hash_fn == "md5_60":
        # Exact integer arithmetic (ADVICE r10): the old
        # (key / width).cast("long") divided in DOUBLE — a 60-bit
        # numerator exceeds double's 53-bit exact range, so
        # top-of-range keys could land in bucket n_buckets (an extra
        # out-of-range bucket). ((key >> 30) · n) >> 30 is
        # floor(key·n/2⁶⁰) up to a ≤2⁻³⁰-relative boundary shift:
        # every op exact on longs, monotone non-decreasing in the key
        # (equal keys share a bucket), range exactly [0, n) for
        # 60-bit keys, no overflow for n < 2³¹.
        return F.shiftright(
            F.shiftright(ord_col, 30) * F.lit(int(n_buckets)), 30
        ).cast("long")
    # xxhash64: full signed-64 range, mapped via double (monotone
    # non-decreasing is sufficient; boundary ties share a bucket).
    b = F.floor((ord_col / F.lit(float(1 << 63)) / 2.0 + 0.5) * n_buckets)
    return F.least(F.greatest(b, F.lit(0)), F.lit(n_buckets - 1)).cast("long")


@register_stage("domain_mix")
def domain_mix(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    token_col: str | None = None,
    text_col: str = "text",
    on: list[str] | str = "doc_id",
    seed: int = 0,
    default_weight: float = 0.0,
    hash_fn: str = "xxhash64",
    num_buckets: int | None = None,
) -> DataFrame:
    """Compose a training mix: per-source TOKEN quotas out of a global
    budget (the "domain weights" step of corpus curation — Pile /
    DoReMi-style source mixing, with hash determinism in place of RNG).

    Source ``s`` gets ``round(weights[s] * token_budget)`` tokens
    (unlisted sources get ``default_weight``); its documents are taken
    in deterministic hash order while the cumulative token count stays
    within quota (a doc that would cross the quota is dropped, as is
    everything after it). Weights are independent shares of the budget
    — they need not sum to 1, so one source can be re-weighed without
    recomputing the rest. Token counts come from ``token_col`` when
    given, else a whitespace token count of ``text_col`` computed in
    the same projection.

    The running sum is the scale hazard: ``Window.partitionBy(source)``
    funnels each source through ONE reducer — a petabyte crawl source
    with a tiny quota would still single-task-sort. Instead, an exact
    distributed prefix sum over monotone hash-range buckets:

    1. bucket = order-preserving slice of the hash key (deterministic,
       no sampling); local running sums window on (source, bucket) —
       a giant source spreads over ``num_buckets`` reducer tasks;
    2. per-(source, bucket) totals (map-side-combined agg over (string,
       long, long) rows) → exclusive bucket offsets via a window over
       that tiny table;
    3. broadcast the offsets back: global cumsum = local + offset.

    Sources with quota 0 are pruned BEFORE the shuffle. NULL token
    counts (NULL text / NULL token_col) count as 0 tokens — the doc
    occupies a slot but no budget.
    """
    on = [on] if isinstance(on, str) else list(on)
    quota = None
    for value, w in weights.items():
        cond = F.col(source_col) == F.lit(value)
        q = F.lit(int(round(w * token_budget)))
        quota = F.when(cond, q) if quota is None else quota.when(cond, q)
    default_q = F.lit(int(round(default_weight * token_budget)))
    quota = default_q if quota is None else quota.otherwise(default_q)

    if token_col is None:
        from meds_transforms_spark.operators.text import _tokens

        n_tok = F.size(_tokens(F.col(text_col))).cast("long")
    else:
        n_tok = F.col(token_col).cast("long")
    spark = df.sparkSession
    n_buckets = int(
        num_buckets or spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    work = (
        df.withColumn("__quota", quota)
        .filter(F.col("__quota") > 0)
        .withColumn("__ntok", F.coalesce(n_tok, F.lit(0)))
        .withColumn("__ord", _h64(hash_fn, F.lit(int(seed)).cast("string"), *[F.col(c) for c in on]))
        .withColumn("__bkt", _order_bucket(F.col("__ord"), hash_fn, n_buckets))
    )
    local_w = (
        W.partitionBy(source_col, "__bkt")
        .orderBy("__ord", *on)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = work.withColumn("__lsum", F.sum("__ntok").over(local_w))

    totals = work.groupBy(source_col, "__bkt").agg(F.sum("__ntok").alias("__tot"))
    off_w = (
        W.partitionBy(source_col)
        .orderBy("__bkt")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = totals.withColumn("__off", F.coalesce(F.sum("__tot").over(off_w), F.lit(0))).drop(
        "__tot"
    )

    return (
        local.join(F.broadcast(offsets), [source_col, "__bkt"])
        .filter((F.col("__lsum") + F.col("__off")) <= F.col("__quota"))
        .select(*df.columns)
    )
