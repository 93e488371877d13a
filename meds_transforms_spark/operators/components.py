"""Iterative connected components on DataFrames — transitive dedup.

The LSH dedup operators default to the 1-hop "collapse to bucket
minimum" approximation (dedup.py). When true transitive closure is
required ("A~B, B~C ⇒ drop C even though A and C share no bucket"),
this module supplies min-label propagation over the similarity graph:

    label(v) ← min(label(v), min over neighbors' labels)

interleaved with pointer jumping (path compression)

    label(v) ← label(label(v))

so convergence is O(log diameter) rounds rather than O(diameter) —
on the sf0.01 document graph this is 5 rounds instead of 19. Each
round is three small shuffles (message groupBy + label join + jump
join).

Iterative-loop discipline: each round ends in an eager
``localCheckpoint`` WITH A STATS RESET (see ``_checkpoint_reset_stats``
— checkpointing alone carries the origin plan's size estimate forward,
and the per-round product of ~6 such leaves compounds it ~6^round until
BigInteger stats arithmetic on the driver dominates wall time),
cutting lineage to a constant ~6-leaf plan.
Un-cut, the plan references labels ~6× and the edge list 2× per
round, i.e. ~6^rounds growth — Catalyst analysis then dominates round
wall time (measured 13 s/round at 100k nodes with cuts every 3
rounds) and with no cuts the plan string alone OOMs the driver by
round ~5. Checkpointed (id, long) label blocks are tiny relative to
the graph and are reclaimed by GC-driven cleanup; the ``propagated``
intermediate (consumed twice by the pointer-jump self-join) is
persisted and unpersisted deterministically within the round. The
edge list is localCheckpoint'd once up front so an expensive upstream
DAG (e.g. the MinHash/LSH bucket pipeline) is neither re-executed nor
re-embedded in the loop plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.functions.iterative import (
    checkpoint_reset_stats as _checkpoint_reset_stats,
)
from meds_transforms_spark.operators.base import register_stage


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    small_graph_threshold: int = 1_000_000,
    stats: dict | None = None,
) -> DataFrame:
    """(id, component) — component = min node id reachable.

    ``edges`` is an undirected edge list of long ids; isolated nodes can
    be absent (callers union them back, or treat absence as singleton).

    ``stats``: optional caller-supplied dict filled with loop telemetry
    (``n_edges``, ``escaped_to_union_find``, ``loop_partitions``,
    ``iterations``, ``converged``) — observability for scale probes;
    does not affect results.

    Graphs at or below ``small_graph_threshold`` edges short-circuit to
    a driver-side union-find: the edge count is already computed for
    shuffle sizing, and below ~10^6 edges the label-propagation loop is
    pure per-round fixed cost (2 joins + checkpoint + 2 driver actions
    per round — measured ~6 s for a 40k-edge dedup graph where
    union-find needs milliseconds). The collect is BOUNDED by the
    threshold; big graphs take the distributed loop unconditionally.
    Both paths produce the identical min-id labeling. Set it to 0 to
    force the loop (tests).
    """
    # Checkpoint (not merely persist) the edge list: every round joins
    # against it, so both its DATA (the caller's LSH/similarity DAG must
    # not re-execute per round) and its PLAN (embedded ×2 into each
    # round's exponentially-compounding loop plan) must be reduced to a
    # materialized leaf. Lazy (round-10): the edge-count action right
    # below materializes the blocks and counts them in ONE job instead
    # of a dedicated checkpoint job plus a count job.
    e = _checkpoint_reset_stats(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")),
        eager=False,
    )
    spark = edges.sparkSession
    # The iterative rounds shuffle only (id, long) pairs — size the
    # shuffle to the graph, not to the session-wide default (a 32- or
    # 200-partition shuffle of a few thousand edges is pure task
    # overhead; at 10^10 edges this scales the round back up).
    n_edges = e.count()
    if stats is not None:
        stats.update(
            n_edges=n_edges,
            escaped_to_union_find=n_edges <= int(small_graph_threshold),
        )
    if n_edges <= int(small_graph_threshold):
        rows = e.collect()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for r0 in rows:
            a, b = r0["src"], r0["dst"]
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN id so the root IS the component label
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        out = [(x, find(x)) for x in parent]
        return spark.createDataFrame(out, "id long, component long")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    loop_parts = max(8, min(int(old_parts), n_edges // 2_000_000 + 1))
    if stats is not None:
        stats["loop_partitions"] = loop_parts
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        nodes = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        # Initial labels are a leaf too — they appear ×4 in round 1's
        # plan. Lazy: the potential-sum action materializes the blocks.
        labels = _checkpoint_reset_stats(
            nodes.withColumn("component", F.col("id")), eager=False
        )
        prev_sum = labels.agg(F.sum("component")).collect()[0][0]

        # Truncate lineage EVERY round. Each round's tree references
        # labels ~6× and the edge list 2× (propagate join + message join
        # + pointer-jump self-join), so un-cut plans grow ~6^rounds:
        # at cut-interval 3 that is already a ~200-leaf tree whose
        # Catalyst analysis dominates round wall time (measured 13 s/
        # round at 100k nodes), and with no cuts the plan string alone
        # OOMs the driver by round ~5. A per-round localCheckpoint keeps
        # every round's plan a constant ~6 leaves; the checkpointed
        # (id, long) blocks are tiny relative to the graph and are
        # GC-cleaned, while the persisted intermediates are released
        # deterministically below.
        for i in range(max_iter):
            lab_src = labels.withColumnRenamed("id", "src").withColumnRenamed(
                "component", "src_comp"
            )
            lab_dst = labels.withColumnRenamed("id", "dst").withColumnRenamed(
                "component", "dst_comp"
            )
            with_labels = e.join(lab_src, "src").join(lab_dst, "dst")
            msgs = (
                with_labels.select(F.col("src").alias("id"), F.col("dst_comp").alias("cand"))
                .unionByName(
                    with_labels.select(
                        F.col("dst").alias("id"), F.col("src_comp").alias("cand")
                    )
                )
                .groupBy("id")
                .agg(F.min("cand").alias("cand"))
            )
            propagated = (
                labels.join(msgs, "id", "left")
                .select(
                    "id",
                    F.least(
                        F.col("component"), F.coalesce("cand", F.col("component"))
                    ).alias("component"),
                )
                .persist()
            )
            # Pointer jump: label(v) ← label(label(v)). Labels are always
            # node ids within v's component, so composing the mapping with
            # itself halves chain lengths — O(diameter) → O(log diameter)
            # total rounds when interleaved with the neighbor-min step.
            jump = propagated.select(
                F.col("id").alias("component"), F.col("component").alias("__jumped")
            )
            new_labels = (
                propagated.join(jump, "component", "left")
                .select(
                    "id",
                    F.least(
                        F.col("component"), F.coalesce("__jumped", F.col("component"))
                    ).alias("component"),
                )
                .transform(lambda d: _checkpoint_reset_stats(d, eager=False))
            )
            # Labels are monotonically non-increasing, so Σ(component) is a
            # strictly decreasing potential — fixpoint ⟺ the sum is stable.
            # One scalar agg per round instead of a self-join diff; it
            # MATERIALIZES the lazily-checkpointed round blocks and
            # computes the sum in one job (round-10: previously the
            # eager checkpoint and the sum were two jobs per round).
            new_sum = new_labels.agg(F.sum("component")).collect()[0][0]
            propagated.unpersist()
            labels = new_labels
            if stats is not None:
                stats["iterations"] = i + 1
            if new_sum == prev_sum:
                if stats is not None:
                    stats["converged"] = True
                break
            prev_sum = new_sum
        # labels is already a self-contained checkpoint leaf — the caller
        # gets (id, component) rows with no lineage back into the loop.
        result = labels
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return result


@register_stage("minhash_lsh_dedup_transitive")
def minhash_lsh_dedup_transitive(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    max_iter: int = 20,
    hash_fn: str = "poly64",
) -> DataFrame:
    """MinHash-LSH dedup with FULL transitive closure: connected
    components over the doc↔bucket-representative star graph; one
    survivor (min id) per component."""
    from meds_transforms_spark.operators.dedup import lsh_band_buckets
    from pyspark.sql import Window as W

    buckets = lsh_band_buckets(
        df, text_col, id_col, num_hashes, bands, shingle_k, hash_fn
    )
    # Star edges doc → bucket-min connect every co-bucketed pair
    # transitively through the representative.
    edges = (
        buckets.withColumn("__rep", F.min(id_col).over(W.partitionBy("__bucket")))
        .filter(F.col(id_col) != F.col("__rep"))
        .select(F.col(id_col).alias("src"), F.col("__rep").alias("dst"))
        .distinct()
    )
    loop_stats: dict = {}
    comp = connected_components(edges, max_iter=max_iter, stats=loop_stats)
    dropped = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    # The union-find escape returns a driver-built frame (Scan
    # ExistingRDD, no size statistics → the planner assumes huge and
    # sort-merge-joins, exchanging the FULL corpus — text included —
    # against a list bounded by small_graph_threshold rows). Broadcast
    # it explicitly; the distributed-loop path keeps the SMJ, since its
    # dropped set is unbounded (can approach corpus size).
    if loop_stats.get("escaped_to_union_find"):
        dropped = F.broadcast(dropped)
    return df.join(dropped, id_col, "left_anti")
