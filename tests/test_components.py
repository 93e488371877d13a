"""Connected components + transitive dedup."""

from __future__ import annotations


def test_connected_components_chain_and_islands(spark):
    from meds_transforms_spark.operators.components import connected_components

    # chain 1-2-3-4 (diameter 3, needs >1 iteration), pair 10-11, and 20-21
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (10, 11), (21, 20)], "src long, dst long"
    )
    comp = {r.id: r.component for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_minhash_transitive_vs_one_hop(spark):
    from meds_transforms_spark.operators.components import (
        minhash_lsh_dedup_transitive,
    )
    from meds_transforms_spark.operators.dedup import minhash_lsh_dedup

    base = "the quick brown fox jumps over the lazy dog near the river bank today "
    rows = [
        (1, base * 4),
        (2, base * 4 + "with a small tail change"),
        (3, base * 4 + "with a small tail change and then some more drift added"),
        (4, "completely unrelated text about query engines and columnar formats "
            "with many different words appearing here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    transitive = {r.doc_id for r in minhash_lsh_dedup_transitive(docs).collect()}
    one_hop = {r.doc_id for r in minhash_lsh_dedup(docs).collect()}
    # Unrelated doc always survives; doc 1 is the component minimum.
    assert 4 in transitive and 1 in transitive
    assert 2 not in transitive
    # Transitive closure can only drop MORE than 1-hop, never fewer.
    assert transitive <= one_hop


def test_connected_components_degenerate_edges(spark):
    """Self-loops, duplicate and reversed duplicates must not distort labels."""
    from meds_transforms_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (1, 2), (3, 3)], "src long, dst long"
    )
    comp = {r.id: r.component for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 3}


def test_connected_components_empty(spark):
    from meds_transforms_spark.operators.components import connected_components

    edges = spark.createDataFrame([], "src long, dst long")
    assert connected_components(edges).count() == 0


def test_components_many_rounds_no_driver_blowup(spark):
    """Chain graph forcing ~12+ propagation rounds. Pre-fix, the
    checkpoint-carried size statistic compounded ~6^round and rounds
    8-11 alone took 1.8/9/49/425 s of driver BigInt arithmetic (on a
    377-edge graph!); post-fix the whole run is seconds. The generous
    bound only fails if the exponential behavior returns."""
    import time

    from meds_transforms_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "src long, dst long"
    )
    t0 = time.time()
    # threshold 0 forces the DISTRIBUTED loop — this test exists to pin
    # the loop's per-round plan hygiene, not the union-find escape
    comp = connected_components(edges, small_graph_threshold=0)
    rows = comp.collect()
    assert time.time() - t0 < 120
    assert len(rows) == 200
    assert {r.component for r in rows} == {0}


def test_components_unionfind_matches_loop(spark):
    """The bounded driver-side union-find escape and the distributed
    label-propagation loop must produce the IDENTICAL min-id labeling
    — random-ish multi-component graph with chains, cycles, self-loops
    and duplicate edges."""
    from meds_transforms_spark.operators.components import connected_components

    pairs = (
        [(i, i + 1) for i in range(0, 40)]          # one long chain
        + [(100 + i, 100 + (i + 1) % 7) for i in range(7)]  # a cycle
        + [(200, 200), (201, 202), (202, 201)]      # self-loop + dup
        + [(300, 305), (305, 301), (301, 309)]
    )
    edges = spark.createDataFrame(pairs, "src long, dst long")
    fast = {r.id: r.component
            for r in connected_components(edges).collect()}
    loop = {r.id: r.component
            for r in connected_components(edges, small_graph_threshold=0).collect()}
    assert fast == loop and len(fast) > 50


def test_components_stats_telemetry(spark):
    """stats= out-param (round-10 observability for the scale probes):
    reports edge count, which path ran, and — on the distributed loop —
    iterations to fixpoint and the loop's shuffle-partition sizing."""
    from meds_transforms_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src long, dst long"
    )
    s_fast: dict = {}
    connected_components(edges, stats=s_fast).collect()
    assert s_fast["n_edges"] == 30 and s_fast["escaped_to_union_find"]
    assert "iterations" not in s_fast

    s_loop: dict = {}
    connected_components(edges, small_graph_threshold=0, stats=s_loop).collect()
    assert s_loop["n_edges"] == 30 and not s_loop["escaped_to_union_find"]
    assert s_loop["converged"] and 1 <= s_loop["iterations"] <= 20
    assert s_loop["loop_partitions"] >= 8
