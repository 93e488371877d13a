"""sf1.0-equivalent run of the heavy dedup/curation family.

The driver ships testdata at sf{0.001,0.01,0.1} only, so an
sf1.0-EQUIVALENT documents table is synthesized by replicating the
sf0.1 table REP× with re-keyed doc_ids and a per-replica text
perturbation (replica index appended to the text) so near-dup structure
is preserved but exact-dup collapse doesn't trivialize the workload.
Every other table is copied through unchanged; the scaled dir is then a
drop-in ``sf_dir`` for the registered queries.

Measures wall time AND shuffle read/write bytes (from the Spark UI REST
API, summed over the stages each query ran) for:
    docs_minhash_dedup, docs_substring_dedup, docs_dsir_weights,
    docs_curation_e2e
Run: python scripts/scale_sf1_heavy.py [REP] [RUNS]
Paste the table into SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from meds_transforms_spark import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
QUERIES = [
    "docs_minhash_dedup",
    "docs_substring_dedup",
    "docs_dsir_weights",
    "docs_curation_e2e",
]


def build_scaled_dir(spark, rep: int) -> str:
    out = f"/tmp/sfscale_rep{rep}"
    docs_path = os.path.join(out, "documents.parquet")
    if not os.path.exists(docs_path):
        os.makedirs(out, exist_ok=True)
        base = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
        n = base.count()
        reps = spark.range(rep).withColumnRenamed("id", "__rep")
        scaled = (
            base.crossJoin(F.broadcast(reps))
            .select(
                (F.col("doc_id") + F.col("__rep") * F.lit(n * 10)).alias("doc_id"),
                F.when(F.col("__rep") == 0, F.col("text"))
                .otherwise(F.concat(F.col("text"), F.lit(" r"), F.col("__rep")))
                .alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            .repartition(32)
        )
        scaled.write.mode("overwrite").parquet(docs_path)
        for t in os.listdir(SRC):
            if t != "documents.parquet" and t.endswith(".parquet"):
                dst = os.path.join(out, t)
                if not os.path.exists(dst):
                    shutil.copy(os.path.join(SRC, t), dst)
    return out


def _stage_metrics(spark) -> dict[int, tuple[int, int]]:
    """stageId -> (shuffleReadBytes, shuffleWriteBytes) via the UI REST API."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
            stages = json.load(r)
    except Exception:
        return {}
    return {
        s["stageId"]: (
            int(s.get("shuffleReadBytes", 0)),
            int(s.get("shuffleWriteBytes", 0)),
        )
        for s in stages
        if s.get("status") == "COMPLETE"
    }


def main():
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    # the session factory disables the UI; shuffle metrics come from its
    # REST API, so turn it back on for this measurement process
    spark = get_spark("scale_sf1_heavy", extra_conf={"spark.ui.enabled": "true"})
    sf_dir = build_scaled_dir(spark, rep)
    n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    print(f"scaled dir {sf_dir}: {n_docs} docs (sf0.1 x {rep})")

    import __spark_entry__ as E

    qs = E.queries()
    print(f"{'query':<24} {'median_s':>9} {'shuf_read_MB':>13} {'shuf_write_MB':>14}  raw")
    for name in QUERIES:
        times, srd, swr = [], 0, 0
        for i in range(runs):
            before = _stage_metrics(spark)
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
            if i == 0:
                after = _stage_metrics(spark)
                new = {k: v for k, v in after.items() if k not in before}
                srd = sum(v[0] for v in new.values())
                swr = sum(v[1] for v in new.values())
        print(
            f"{name:<24} {statistics.median(times):>9.1f} {srd/1e6:>13.1f} "
            f"{swr/1e6:>14.1f}  {[round(t,1) for t in times]}"
        )


if __name__ == "__main__":
    main()
