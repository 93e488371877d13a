"""Round-8 scale evidence: the cross-executor kernel-shuffle A/B, the
two missing skew runs, and the 1M-doc durable-index build.

VERDICT r07 items 2, 5 and 6. Four subcommands (paste results into
SCALING.md):

1. ``xboundary`` — the round-7 kernel win (MinHash first exchange
   O(shingles) -> O(docs x bands)) was argued from shuffle BYTES on
   local[32], where a "shuffle" is same-process disk I/O and the wall
   delta is parity. This run replays docs_minhash_dedup-shaped and
   docs_winnow_overlap-shaped pipelines at 500k docs under
   ``local-cluster[2,16,16384]`` — two separate executor JVMs, so every
   shuffle row crosses a real process boundary with full serde — once
   with the poly64 Arrow kernel (the round-8 default) and once with
   the relational xxhash64 path, recording wall, shuffle bytes and
   max task time per variant.

2. ``skew_winnow`` — winnow_overlap under a hot shared fingerprint:
   REP x sf0.1 docs where 30% share a ~120-char boilerplate prefix
   (the same skew generator as scale_round7) — the real stress of the
   fp-bucket pair join that the ``max_df`` guard exists for. Runs
   guard-on (max_df=boilerplate-df) vs guard-off, wall + max-task.

3. ``skew_ccnet`` — ccnet_buckets with one language carrying 80% of
   docs (per-language tercile quantiles: the hot-key stress of the
   grouped-quantile path).

4. ``index1m`` — durable poly64 MinHash index at 1M docs: build +
   save wall, then a 10k-doc probe batch wall (the foreachBatch
   ingest-dedup shape), plus reload param validation.

Run: python scripts/scale_round8.py {xboundary|skew_winnow|skew_ccnet|index1m} [REP] [RUNS]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
# local-cluster executors run their OWN python workers which do NOT
# inherit the driver's sys.path — ship the repo via PYTHONPATH.
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
os.environ.setdefault("PYSPARK_PYTHON", sys.executable)

from pyspark.sql import functions as F  # noqa: E402

from meds_transforms_spark import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
BOILER = (
    "terms of service privacy policy all rights reserved copyright "
    "twenty twenty six contact us subscribe to our newsletter home news "
)


def build_docs_dir(spark, rep: int, skew: bool) -> str:
    """Same generator as scripts/scale_round7.build_docs_dir (shared
    /tmp cache names so prior rounds' dirs are reused)."""
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
            return {
                s["stageId"]: s for s in json.load(r) if s.get("status") == "COMPLETE"
            }
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


def timed(spark, label: str, thunk, runs: int = 3):
    """Median wall + first-run shuffle/serde accounting of ``thunk``."""
    times, srd, swr, maxtask, fetch_ms, ser_ms = [], 0, 0, 0.0, 0, 0
    for i in range(runs):
        before = _stages(spark)
        t0 = time.time()
        thunk()
        times.append(time.time() - t0)
        if i == 0:
            after = _stages(spark)
            new = [s for k, s in after.items() if k not in before]
            srd = sum(int(s.get("shuffleReadBytes", 0)) for s in new)
            swr = sum(int(s.get("shuffleWriteBytes", 0)) for s in new)
            fetch_ms = sum(int(s.get("shuffleFetchWaitTime", 0)) for s in new)
            ser_ms = sum(int(s.get("executorDeserializeTime", 0)) for s in new)
            maxtask = max(
                (
                    _max_task_ms(spark, s["stageId"], s.get("attemptId", 0))
                    for s in new
                ),
                default=0.0,
            )
    med = statistics.median(times)
    print(
        f"{label:<38} median {med:6.1f}s  shufR {srd/1e6:8.1f}MB  "
        f"shufW {swr/1e6:8.1f}MB  maxtask {maxtask/1e3:6.1f}s  "
        f"fetchwait {fetch_ms/1e3:5.1f}s  deser {ser_ms/1e3:5.1f}s  "
        f"raw {[round(t, 1) for t in times]}",
        flush=True,
    )
    return med


def cmd_xboundary(rep: int, runs: int):
    """Kernel-vs-relational across a REAL executor boundary."""
    from meds_transforms_spark.operators.dedup import minhash_lsh_dedup
    from meds_transforms_spark.operators.winnow import winnow_overlap

    # Build the input dir with a throwaway local session first (the
    # local-cluster session would work too, but the dir usually exists).
    pre = get_spark("xb_prep")
    sf = build_docs_dir(pre, rep, skew=False)
    pre.stop()

    spark = get_spark(
        "scale_r8_xboundary",
        master="local-cluster[2,16,16384]",
        shuffle_partitions=int(os.environ.get("XB_SHUFFLE_PARTITIONS", "0")) or None,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            "spark.executorEnv.PYTHONPATH": REPO,
            # the driver does no heavy lifting here — keep its heap
            # small so 2x16 GB executors + ~32 python workers fit the
            # host comfortably (the 8 GB-executor first attempt lost an
            # executor to a SIGTERM mid-sweep).
            "spark.driver.memory": "8g",
        },
    )
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    n = docs.count()
    print(f"=== xboundary: {n} docs, local-cluster[2,16,16384] ===", flush=True)

    # Warm both executors' FULL python worker pools + codegen: a
    # limit() warm-up runs on one partition and warms one worker —
    # the first full pass then pays ~30 python worker cold-starts
    # inside the measured window. One full-data pass per path instead;
    # each variant is fenced so one OOM doesn't kill the sweep (the
    # 5M-doc relational warm pass OOM'd two 16 GB executors in its
    # O(shingles) shuffle — itself a scale datum; the kernel path ran).
    def fenced(label, thunk, n=runs):
        try:
            thunk()  # warm
            timed(spark, label, thunk, runs=n)
        except Exception as e:
            print(f"{label:<38} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)

    fenced(
        "minhash_lsh_dedup[poly64]",
        lambda: minhash_lsh_dedup(docs, hash_fn="poly64")
        .write.format("noop").mode("overwrite").save(),
    )
    fenced(
        "winnow_overlap[poly64]",
        lambda: winnow_overlap(docs, k=10, w=8, hash_fn="poly64", min_shared=4, max_df=50)
        .write.format("noop").mode("overwrite").save(),
    )
    fenced(
        "minhash_lsh_dedup[xxhash64]",
        lambda: minhash_lsh_dedup(docs, hash_fn="xxhash64")
        .write.format("noop").mode("overwrite").save(),
    )
    fenced(
        "winnow_overlap[xxhash64]",
        lambda: winnow_overlap(docs, k=10, w=8, hash_fn="xxhash64", min_shared=4, max_df=50)
        .write.format("noop").mode("overwrite").save(),
    )
    spark.stop()


def cmd_skew_winnow(rep: int, runs: int):
    """winnow_overlap under a hot shared-boilerplate fingerprint."""
    from meds_transforms_spark.operators.winnow import winnow_overlap

    spark = get_spark(
        "scale_r8_skew_winnow",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.showConsoleProgress": "false"},
    )
    uni = build_docs_dir(spark, rep, skew=False)
    skw = build_docs_dir(spark, rep, skew=True)
    for tag, d in (("uniform", uni), ("skew30%boiler", skw)):
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        print(f"=== skew_winnow {tag}: {docs.count()} docs ===", flush=True)
        # guard ON (the shipped default shape): boilerplate fingerprints
        # shared by >max_df docs are dropped before the pair join.
        timed(
            spark,
            f"winnow_overlap[{tag}, max_df=50]",
            lambda dd=docs: winnow_overlap(
                dd, k=10, w=8, min_shared=4, max_df=50
            )
            .write.format("noop")
            .mode("overwrite")
            .save(),
            runs=runs,
        )
        # guard OFF on the skewed dir: measures the blowup the guard
        # prevents (the hot fingerprint pairs up quadratically).
        if tag != "uniform":
            timed(
                spark,
                f"winnow_overlap[{tag}, NO max_df]",
                lambda dd=docs: winnow_overlap(dd, k=10, w=8, min_shared=4)
                .write.format("noop")
                .mode("overwrite")
                .save(),
                runs=max(1, runs - 1),
            )
    spark.stop()


def cmd_skew_ccnet(rep: int, runs: int):
    """ccnet_buckets with one language at ~80% of docs."""
    from meds_transforms_spark.operators.lm import ccnet_buckets

    spark = get_spark(
        "scale_r8_skew_ccnet",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.showConsoleProgress": "false"},
    )
    uni = build_docs_dir(spark, rep, skew=False)
    docs = spark.read.parquet(os.path.join(uni, "documents.parquet"))
    n = docs.count()
    # 80% of docs forced into one hot language, rest keep theirs.
    hot = F.pmod(F.xxhash64("doc_id"), F.lit(10)) < 8
    skewed = docs.withColumn("lang", F.when(hot, F.lit("en")).otherwise(F.col("lang")))
    for tag, d in (("uniform-lang", docs), ("80%-one-lang", skewed)):
        print(f"=== skew_ccnet {tag}: {n} docs ===", flush=True)
        timed(
            spark,
            f"ccnet_buckets[{tag}]",
            lambda dd=d: ccnet_buckets(dd)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            runs=runs,
        )
    spark.stop()


def cmd_index1m(rep: int, runs: int):
    """1M-doc durable MinHash index: build/save wall + probe wall."""
    from meds_transforms_spark.operators.dedup_index import (
        build_minhash_index,
        dedup_against_index,
        load_minhash_index,
        save_minhash_index,
    )

    spark = get_spark(
        "scale_r8_index1m",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.showConsoleProgress": "false"},
    )
    sf = build_docs_dir(spark, rep, skew=False)
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    n = docs.count()
    print(f"=== index1m: {n} docs ===", flush=True)
    path = "/tmp/sfr8_minhash_index"
    shutil.rmtree(path, ignore_errors=True)

    t0 = time.time()
    idx = build_minhash_index(docs)
    save_minhash_index(idx, path)
    print(f"build+save: {time.time()-t0:.1f}s", flush=True)

    idx2, params = load_minhash_index(spark, path)
    print(f"reload params: {params}", flush=True)
    probe = docs.limit(10000).select(
        (F.col("doc_id") + F.lit(10_000_000_000)).alias("doc_id"), "text"
    )
    timed(
        spark,
        "probe 10k batch vs 1M index",
        lambda: dedup_against_index(probe, idx2, index_params=params)
        .write.format("noop")
        .mode("overwrite")
        .save(),
        runs=runs,
    )
    spark.stop()


def cmd_xb1(rep: int, runs: int):
    """ONE xboundary variant in a fresh app (variant name in argv[4]):
    isolates each measurement from executor-death cascades of earlier
    variants — the confound that muddied the batched 5M-doc sweep."""
    from meds_transforms_spark.operators.dedup import minhash_lsh_dedup
    from meds_transforms_spark.operators.winnow import winnow_overlap

    variant = sys.argv[4]
    op, hash_fn = variant.rsplit("_", 1)

    pre = get_spark("xb_prep")
    sf = build_docs_dir(pre, rep, skew=False)
    pre.stop()
    spark = get_spark(
        f"scale_r8_xb1_{variant}",
        master=os.environ.get("XB_MASTER", "local-cluster[2,16,16384]"),
        shuffle_partitions=int(os.environ.get("XB_SHUFFLE_PARTITIONS", "0")) or None,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            "spark.executorEnv.PYTHONPATH": REPO,
            "spark.driver.memory": "8g",
            # ROUND-9 CORRECTION: local-cluster[n,cores,MEM]'s third arg
            # is the WORKER's advertised capacity, not the executor
            # heap — spark.executor.memory (default 1g!) sizes the JVM.
            # Every pre-round-9 "16 GB executor" run in SCALING.md in
            # fact ran -Xmx1024M executors; set the heap explicitly.
            "spark.executor.memory": os.environ.get("XB_EXECUTOR_MEM", "16g"),
        },
    )
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    print(f"=== xb1 {variant}: {docs.count()} docs ===", flush=True)
    if op == "minhash":
        thunk = lambda: minhash_lsh_dedup(docs, hash_fn=hash_fn).write.format(
            "noop"
        ).mode("overwrite").save()
    else:
        thunk = lambda: winnow_overlap(
            docs, k=10, w=8, hash_fn=hash_fn, min_shared=4, max_df=50
        ).write.format("noop").mode("overwrite").save()
    try:
        thunk()  # warm
        timed(spark, f"{variant}", thunk, runs=runs)
    except Exception as e:
        print(f"{variant:<38} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "xboundary"
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else (200 if mode == "index1m" else 100)
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    {
        "xboundary": cmd_xboundary,
        "xb1": cmd_xb1,
        "skew_winnow": cmd_skew_winnow,
        "skew_ccnet": cmd_skew_ccnet,
        "index1m": cmd_index1m,
    }[mode](rep, runs)
