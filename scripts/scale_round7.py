"""Round-7 scale evidence: skewed heavy-family runs, an sf100-eq spot
check, and the decontaminate gram-path throughput target.

Three measurements (paste results into SCALING.md):

1. ``skew``  — sf10-eq (REP x sf0.1) documents with a ZIPF-ish domain
   skew: 30% of docs land in one source AND share a ~120-char
   boilerplate prefix (the realistic version of domain skew — it makes
   the group-by key hot AND the gram/fingerprint streams hot). Runs
   docs_minhash_dedup / docs_substring_dedup / docs_domain_mix on the
   uniform and skewed dirs and records wall + per-stage MAX task time
   (straggler check) + shuffle bytes.

2. ``sf100`` — REP=1000 (~5M docs) spot check of the two heaviest
   queries (docs_substring_dedup, docs_curation_e2e), n=1, with
   shuffle-byte accounting — extends the linearity series one more 10x.

3. ``decon`` — ngram_decontaminate throughput at 1M docs (REP=200),
   arrow vs expr gram path — the round-7 ">=2x docs/s" target.

Run: python scripts/scale_round7.py {skew|sf100|decon} [REP] [RUNS]
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
BOILER = (
    "terms of service privacy policy all rights reserved copyright "
    "twenty twenty six contact us subscribe to our newsletter home news "
)  # ~120 chars of realistic boilerplate


def build_docs_dir(spark, rep: int, skew: bool) -> str:
    tag = "skew" if skew else "uni"
    out = f"/tmp/sfr7_{tag}_rep{rep}"
    docs_path = os.path.join(out, "documents.parquet")
    if not os.path.exists(docs_path):
        os.makedirs(out, exist_ok=True)
        base = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
        n = base.count()
        reps = spark.range(rep).withColumnRenamed("id", "__rep")
        scaled = base.crossJoin(F.broadcast(reps)).select(
            (F.col("doc_id") + F.col("__rep") * F.lit(n * 10)).alias("doc_id"),
            F.when(F.col("__rep") == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" r"), F.col("__rep")))
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        if skew:
            # deterministic 30% hot slice: one domain + shared prefix
            hot = F.pmod(F.xxhash64("doc_id"), F.lit(10)) < 3
            scaled = scaled.select(
                "doc_id",
                F.when(hot, F.concat(F.lit(BOILER), F.col("text")))
                .otherwise(F.col("text"))
                .alias("text"),
                "lang",
                F.when(hot, F.lit("src0")).otherwise(F.col("source")).alias("source"),
                "n_chars",
            )
        scaled.repartition(32).write.mode("overwrite").parquet(docs_path)
        for t in os.listdir(SRC):
            if t != "documents.parquet" and t.endswith(".parquet"):
                dst = os.path.join(out, t)
                if not os.path.exists(dst):
                    shutil.copy(os.path.join(SRC, t), dst)
    return out


def _stages(spark) -> dict[int, dict]:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
            return {s["stageId"]: s for s in json.load(r) if s.get("status") == "COMPLETE"}
    except Exception:
        return {}


def _max_task_ms(spark, stage_id: int, attempt: int = 0) -> float:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        url = (
            f"{ui}/api/v1/applications/{app}/stages/{stage_id}/{attempt}/"
            "taskSummary?quantiles=1.0"
        )
        with urllib.request.urlopen(url) as r:
            return float(json.load(r)["executorRunTime"][0])
    except Exception:
        return 0.0


def run_queries(spark, sf_dir: str, names: list[str], runs: int):
    import __spark_entry__ as E

    qs = E.queries()
    rows = []
    for name in names:
        times, srd, swr, maxtask = [], 0, 0, 0.0
        for i in range(runs):
            before = _stages(spark)
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
            if i == 0:
                after = _stages(spark)
                new = [s for k, s in after.items() if k not in before]
                srd = sum(int(s.get("shuffleReadBytes", 0)) for s in new)
                swr = sum(int(s.get("shuffleWriteBytes", 0)) for s in new)
                maxtask = max(
                    (_max_task_ms(spark, s["stageId"], s.get("attemptId", 0)) for s in new),
                    default=0.0,
                )
        rows.append((name, statistics.median(times), srd, swr, maxtask, times))
    return rows


def print_rows(label, rows):
    print(f"--- {label} ---")
    print(f"{'query':<24} {'median_s':>9} {'shufR_MB':>9} {'shufW_MB':>9} {'maxtask_s':>10}  raw")
    for name, med, srd, swr, mt, times in rows:
        print(
            f"{name:<24} {med:>9.1f} {srd/1e6:>9.1f} {swr/1e6:>9.1f} "
            f"{mt/1e3:>10.1f}  {[round(t,1) for t in times]}"
        )


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "skew"
    # 8 MB scan splits: the Arrow gram/signature kernels inherit SCAN
    # partitioning (they run before any exchange), so the default
    # 128 MB split caps a 170 MB scaled dir at ~2 kernel tasks —
    # measured 60 s max-task on docs_minhash_dedup at 500k docs vs
    # ~10 s with proper splits. A real cluster gets parallelism from
    # its file count; local scale runs must size the split instead.
    spark = get_spark(
        f"scale_r7_{mode}",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "1m",
        },
    )
    if mode == "skew":
        rep = int(sys.argv[2]) if len(sys.argv) > 2 else 100
        runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
        names = ["docs_minhash_dedup", "docs_substring_dedup", "docs_domain_mix"]
        for skew in (False, True):
            d = build_docs_dir(spark, rep, skew)
            n = spark.read.parquet(os.path.join(d, "documents.parquet")).count()
            if skew:
                top = (
                    spark.read.parquet(os.path.join(d, "documents.parquet"))
                    .groupBy("source").count().orderBy(F.desc("count")).first()
                )
                print(f"{d}: {n} docs; hottest source {top['source']}={top['count']} "
                      f"({100.0*top['count']/n:.0f}%)")
            else:
                print(f"{d}: {n} docs (uniform)")
            print_rows("skew" if skew else "uniform", run_queries(spark, d, names, runs))
    elif mode == "sf100":
        rep = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
        runs = int(sys.argv[3]) if len(sys.argv) > 3 else 1
        d = build_docs_dir(spark, rep, skew=False)
        n = spark.read.parquet(os.path.join(d, "documents.parquet")).count()
        print(f"{d}: {n} docs (sf0.1 x {rep})")
        print_rows(
            "sf100-eq",
            run_queries(spark, d, ["docs_substring_dedup", "docs_curation_e2e"], runs),
        )
    elif mode == "decon":
        rep = int(sys.argv[2]) if len(sys.argv) > 2 else 200
        runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
        d = build_docs_dir(spark, rep, skew=False)
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        n = docs.count()
        ev = docs.filter(F.col("doc_id") % 997 == 3).select("text")
        from meds_transforms_spark.operators.decontaminate import ngram_decontaminate

        print(f"{d}: {n} docs; eval probes = {ev.count()}")
        # INTERLEAVED passes (bench.py methodology): back-to-back
        # repeats of one impl land inside the same Python-worker /
        # GC burst and mis-attribute session effects to the impl.
        times: dict[str, list[float]] = {"expr": [], "arrow": []}
        for _ in range(runs + 1):
            for impl in ("expr", "arrow"):
                t0 = time.time()
                ngram_decontaminate(docs, ev, n=13, impl=impl).write.format(
                    "noop"
                ).mode("overwrite").save()
                times[impl].append(time.time() - t0)
        for impl in ("expr", "arrow"):
            med = statistics.median(times[impl][1:])  # drop cold pass
            print(f"decontaminate impl={impl:<5} median {med:6.1f}s  "
                  f"{n/med:,.0f} docs/s  raw {[round(t,1) for t in times[impl]]}")
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
