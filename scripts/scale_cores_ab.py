"""Round-11 core-scaling A/B (VERDICT r10 item 2): the heavy dedup /
curation family at sf1-to-sf10-equivalent corpus size, 32 cores vs 8
cores, fresh Spark app per core count.

The driver's own low-core bench runs at sf0.1, where every query sits
on the 0.3-2 s driver/py4j/job-launch floor and all 41 low/high-core
ratios land at ≈1 — parallelism is unmeasurable there. This script
makes it measurable: REP× replication of the sf0.1 documents table
(scale_sf1_heavy.build_scaled_dir — re-keyed ids, per-replica text
perturbation) pushes the kernel/shuffle work far enough above the
floor that the 8-vs-32 ratio reflects the plans, not the harness.

Usage: python scripts/scale_cores_ab.py [REP=100] [RUNS=2]
Paste the table into SCALING.md.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "docs_minhash_dedup",
    "docs_substring_dedup",
    "docs_winnow_overlap",
    "docs_winnow_contains",
    "docs_dsir_weights",
    "docs_unigram_logprob",
    "docs_ccnet_e2e",
    "docs_curation_e2e",
]


def run_pass(cpus: int, sf_dir: str) -> dict[str, float]:
    """One fresh app at `cpus`: a discarded warm pass (worker pools,
    codegen, page cache) then ONE timed pass over the query list."""
    import __spark_entry__ as E
    from meds_transforms_spark import get_spark

    spark = get_spark(
        f"cores_ab_{cpus}", master=f"local[{cpus}]", shuffle_partitions=32
    )
    qs = E.queries()
    qs["meds_fit_vocab"](spark, sf_dir).count()  # codegen warmup
    out: dict[str, float] = {}
    for i in range(2):  # pass 0 warm (discarded), pass 1 timed
        for name in QUERIES:
            spark.sparkContext.setJobGroup(f"ab{cpus}-{name}-{i}", name)
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            if i:
                out[name] = round(time.time() - t0, 3)
            spark.catalog.clearCache()
    spark.stop()
    return out


def main():
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from scale_sf1_heavy import build_scaled_dir

    from meds_transforms_spark import get_spark

    spark = get_spark("cores_ab_build", master="local[32]")
    sf_dir = build_scaled_dir(spark, rep)
    n = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    print(f"scaled dir {sf_dir}: {n} docs (sf0.1 x {rep})", flush=True)
    spark.stop()
    time.sleep(2)

    # ALTERNATE core counts across fresh apps so host-noise windows hit
    # both arms — the sequential two-arm design put an 85 s burst
    # entirely inside one arm and made medians-of-2 unusable.
    results: dict[int, dict[str, list[float]]] = {
        c: {q: [] for q in QUERIES} for c in (32, 8)
    }
    for i in range(runs):
        for cpus in (32, 8):
            one = run_pass(cpus, sf_dir)
            for q, w in one.items():
                results[cpus][q].append(w)
            print(f"-- pass {i} local[{cpus}]: {one}", flush=True)
            time.sleep(2)

    print("\n| query | 32-core best | 8-core best | ratio (ideal 4.0) |")
    print("|---|---:|---:|---:|")
    for name in QUERIES:
        b32 = min(results[32][name])
        b8 = min(results[8][name])
        print(f"| {name} | {b32:.1f} s | {b8:.1f} s | {b8 / b32:.2f} |")
    print("\nmedians:", {
        c: {q: statistics.median(ws) for q, ws in results[c].items()}
        for c in results
    })
    print("raw:", results)


if __name__ == "__main__":
    main()
