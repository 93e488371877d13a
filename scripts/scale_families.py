"""sfN-equivalent runs for the events / MEDS / embeddings families.

Companion to scale_sf1_heavy.py (which covers the documents-table
family): replicates events.parquet and embeddings.parquet REP x with
re-keyed ids and a per-replica perturbation, then runs the registered
queries unchanged against the scaled dir.

Scaling choices (they decide WHAT the scale-up stresses):
- events: user_id and event_id are re-keyed per replica, timestamps are
  kept — so the scale-up multiplies the NUMBER of per-user groups, not
  group size. That matches the production shape (more users, similar
  history each) and keeps the windows' unit of locality honest. The
  MEDS family reads the same table through events_as_meds, so
  meds_* queries scale with it.
- embeddings: vec_id re-keyed; one dimension gets a tiny per-replica
  offset so cosine structure is preserved but replicas aren't bitwise
  duplicates (semantic-dedup cells don't collapse trivially).

Wall = median of noop-sink materializations; shuffle bytes from the
Spark UI REST API summed over each query's stages (first run).

Run: python scripts/scale_families.py [REP] [RUNS] [query ...]
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
DEFAULT_QUERIES = [
    "events_interval_join",
    "events_sessions",
    "events_funnel",
    "events_anomaly",
    "events_anomaly_bucketed",
    "meds_agg_code_metadata",
    "meds_agg_quantiles_approx",
    "meds_pipeline_e2e",
    "emb_topk_cosine",
    "emb_covariance",
    # NOTE: the registered semantic_dedup queries run FIXED n_cells=64
    # (oracle-replayable); at REP>=10 that is the documented quadratic
    # regime — use emb_semantic_dedup_arrow for the sane assignment
    # cost and read SCALING.md "SemDeDup super-linearity" before
    # interpreting the number.
    "emb_semantic_dedup_arrow",
]


def build_scaled_dir(spark, rep: int) -> str:
    out = f"/tmp/sffam_rep{rep}"
    os.makedirs(out, exist_ok=True)
    reps = spark.range(rep).withColumnRenamed("id", "__rep")

    ev_path = os.path.join(out, "events.parquet")
    if not os.path.exists(ev_path):
        # raw read (nanos as long via session conf) — written back out
        # unchanged in type so the scaled file round-trips identically
        ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
        n_ev = ev.count()
        n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
        (
            ev.crossJoin(F.broadcast(reps))
            .select(
                (F.col("event_id") + F.col("__rep") * F.lit(n_ev * 10)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.col("__rep") * F.lit(n_users * 10)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(ev_path)
        )

    emb_path = os.path.join(out, "embeddings.parquet")
    if not os.path.exists(emb_path):
        emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
        n_emb = emb.count()
        (
            emb.crossJoin(F.broadcast(reps))
            .select(
                (F.col("vec_id") + F.col("__rep") * F.lit(n_emb * 10)).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: F.when(
                        i == 0, x + F.col("__rep").cast("float") * F.lit(1e-4)
                    ).otherwise(x),
                ).alias("embedding"),
                "label",
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(emb_path)
        )

    for t in os.listdir(SRC):
        if t not in ("events.parquet", "embeddings.parquet") and t.endswith(".parquet"):
            dst = os.path.join(out, t)
            if not os.path.exists(dst):
                shutil.copy(os.path.join(SRC, t), dst)
    return out


def _stage_metrics(spark) -> dict[int, tuple[int, int]]:
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
    queries = sys.argv[3:] or DEFAULT_QUERIES
    spark = get_spark("scale_families", extra_conf={"spark.ui.enabled": "true"})
    sf_dir = build_scaled_dir(spark, rep)
    n_ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    n_emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).count()
    print(f"scaled dir {sf_dir}: {n_ev} events, {n_emb} embeddings (sf0.1 x {rep})")

    import __spark_entry__ as E

    qs = E.queries()
    print(f"{'query':<26} {'median_s':>9} {'shuf_read_MB':>13} {'shuf_write_MB':>14}  raw")
    for name in queries:
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
            f"{name:<26} {statistics.median(times):>9.1f} {srd/1e6:>13.1f} "
            f"{swr/1e6:>14.1f}  {[round(t,1) for t in times]}"
        )


if __name__ == "__main__":
    main()
