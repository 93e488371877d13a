"""Scale probe for the round-10 §8 assign_stable_ids change: time the
generic (validate=True) path and — where the tree supports it — the
deterministic-bucket path of docs_assign_ids' shape on a synthetic
5M-row md5-hex key stream, fresh process, noop sink, warm passes.

Run the same script in the old worktree and at HEAD, interleaved, to
A/B the removed dup-check pass / sampling job / join-back.

Usage: python scripts/scale_ids_ab.py [n_rows] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from pyspark.sql import functions as F

    from meds_transforms_spark import get_spark
    from meds_transforms_spark.operators.ids import assign_stable_ids

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        "scale_ids_ab", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    sc = spark.sparkContext
    base = spark.range(n_rows).select(
        F.md5(F.col("id").cast("string")).alias("__h"), F.col("id").alias("doc_id")
    )

    def probe(label, build):
        walls, jobs = [], []
        for i in range(runs):
            group = f"ids-{label}-{i}"
            sc.setJobGroup(group, label)
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            try:
                jobs.append(len(sc.statusTracker().getJobIdsForGroup(group)))
            except Exception:
                jobs.append(-1)
            spark.catalog.clearCache()
        ws = sorted(walls)
        print(
            f"IDS_AB {label:10s} n={n_rows} min={ws[0]:7.3f} "
            f"med={ws[len(ws)//2]:7.3f} jobs/run={max(jobs)}  raw={walls}",
            flush=True,
        )

    probe("generic", lambda: assign_stable_ids(base, ["__h", "doc_id"], id_name="sid"))
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    width = (1 << 60) // n_parts + 1
    bucket = (
        F.conv(F.col("__h").substr(1, 15), 16, 10).cast("long") / F.lit(width)
    ).cast("long")
    try:
        probe(
            "bucketed",
            lambda: assign_stable_ids(
                base, ["__h", "doc_id"], id_name="sid", bucket=bucket
            ),
        )
    except TypeError:
        print("IDS_AB bucketed unsupported in this tree", flush=True)


if __name__ == "__main__":
    main()
