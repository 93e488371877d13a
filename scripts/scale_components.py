"""Scale spot-check: connected components on a chain-heavy graph.

Generates N nodes in chains of length L (edges i—i+1 within each
L-block), so every component is known analytically (block minimum) and
the graph's diameter is L-1 — the worst case for label propagation and
exactly what the pointer-jumping rounds are for. Verifies the result
exactly, prints wall time, and — the point of the exercise after the
persist/localCheckpoint rework — completes a many-round loop without
plan-string or block-manager blowup.

Usage: python scripts/scale_components.py [n_nodes] [chain_len]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meds_transforms_spark import get_spark
from meds_transforms_spark.operators.components import connected_components


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000

    spark = get_spark("scale_components")
    # Edges i — i+1 except across block boundaries: chains of chain_len.
    edges = (
        spark.range(n_nodes - 1)
        .filter((F.col("id") + 1) % chain_len != 0)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )

    t0 = time.time()
    comp = connected_components(edges, max_iter=40)
    # Exact check without collecting: every node's component must be its
    # block minimum, so the count of mismatches must be zero.
    bad = comp.filter(
        F.col("component") != (F.col("id") - F.col("id") % chain_len)
    ).count()
    n = comp.count()
    wall = time.time() - t0

    assert bad == 0, f"{bad} nodes with wrong component label"
    assert n == n_nodes, f"expected {n_nodes} labeled nodes, got {n}"
    print(
        f"OK: {n_nodes:,} nodes in chains of {chain_len} "
        f"(diameter {chain_len - 1}) → {n_nodes // chain_len:,} components, "
        f"{wall:.1f}s"
    )


if __name__ == "__main__":
    main()
