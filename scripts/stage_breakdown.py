"""Stage-level breakdown of one declared query via the Spark event log.

Runs the query (noop sink) `SPARK_GRAFT_RUNS` times warm in one session
with spark.eventLog enabled, then parses the event log for the LAST run:
per-stage wall (submission->completion), task count, shuffle read/write
bytes, input bytes, and the stage's first RDD name — the empirical side
of guide §1.1 without a live UI.

Usage: python scripts/stage_breakdown.py <query> [<query>...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))


def main():
    import __spark_entry__ as E
    from meds_transforms_spark import get_spark

    evdir = tempfile.mkdtemp(prefix="spark-ev-")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        "stage_breakdown",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    qs = E.queries()
    qs["meds_fit_vocab"](spark, SF_DIR).count()  # codegen warmup
    sc = spark.sparkContext

    if RUNS < 1:
        print(f"SPARK_GRAFT_RUNS={RUNS} must be >= 1", file=sys.stderr)
        sys.exit(2)
    for name in sys.argv[1:]:
        for i in range(RUNS):
            sc.setJobGroup(f"bd-{name}-{i}", name)
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            spark.catalog.clearCache()
        print(f"\n===== {name}: last-pass wall {wall:.3f}s =====")
        marks[name] = (f"bd-{name}-{RUNS-1}", wall)

    app_id = sc.applicationId
    spark.stop()
    time.sleep(1)
    # Spark 4 event-log v2 layout: a directory per app with events_* files.
    candidates = [
        os.path.join(evdir, app_id),
        os.path.join(evdir, app_id + ".inprogress"),
        os.path.join(evdir, f"eventlog_v2_{app_id}"),
    ]
    path = next((p for p in candidates if os.path.exists(p)), None)
    if path is None:
        print(
            f"no event log found for {app_id} under {evdir}; "
            f"contents: {sorted(os.listdir(evdir))}",
            file=sys.stderr,
        )
        sys.exit(1)
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.startswith("events_")
        )
    else:
        files = [path]

    def lines():
        for f in files:
            if f.endswith(".zstd"):
                import io

                import zstandard

                with open(f, "rb") as fh:
                    reader = zstandard.ZstdDecompressor().stream_reader(fh)
                    yield from io.TextIOWrapper(reader, encoding="utf-8")
            else:
                yield from open(f)

    jobs = {}       # jobId -> dict
    stages = {}     # stageId -> dict
    for line in lines():
        ev = json.loads(line)
        t = ev.get("Event")
        if t == "SparkListenerJobStart":
            props = ev.get("Properties") or {}
            jobs[ev["Job ID"]] = {
                "group": props.get("spark.jobGroup.id", ""),
                "desc": (props.get("spark.job.description") or "")[:60],
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                "t0": ev.get("Submission Time", 0),
            }
        elif t == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["t1"] = ev.get("Completion Time", 0)
        elif t == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            acc = {a.get("Name"): a.get("Value") for a in si.get("Accumulables", [])}
            stages[si["Stage ID"]] = {
                "name": si.get("Stage Name", ""),
                "ntasks": si.get("Number of Tasks"),
                "t0": si.get("Submission Time", 0),
                "t1": si.get("Completion Time", 0),
                "shr": acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0)
                + acc.get("internal.metrics.shuffle.read.localBytesRead", 0),
                "shw": acc.get("internal.metrics.shuffle.write.bytesWritten", 0),
                "inp": acc.get("internal.metrics.input.bytesRead", 0),
                "cpu": acc.get("internal.metrics.executorCpuTime", 0),
                "run": acc.get("internal.metrics.executorRunTime", 0),
            }

    for name, (group, wall) in marks.items():
        print(f"\n===== {name} (last pass, wall {wall:.3f}s) =====")
        gj = sorted(
            (j for j in jobs.values() if j["group"] == group), key=lambda j: j["t0"]
        )
        tmin = min(j["t0"] for j in gj) if gj else 0
        for j in gj:
            jw = (j.get("t1", j["t0"]) - j["t0"]) / 1000.0
            print(f"job +{(j['t0']-tmin)/1000.0:7.3f}s  {jw:7.3f}s  {j['desc']}")
            for sid in sorted(j["stages"]):
                s = stages.get(sid)
                if not s:
                    continue
                sw = (s["t1"] - s["t0"]) / 1000.0
                print(
                    f"   stage {sid:4d} {sw:7.3f}s tasks={s['ntasks']:3d} "
                    f"in={s['inp']/1e6:7.1f}MB shr={s['shr']/1e6:7.1f}MB "
                    f"shw={s['shw']/1e6:7.1f}MB cpu={s['cpu']/1e9:6.2f}s "
                    f"run={s['run']/1e3:6.2f}s  {s['name'][:70]}"
                )


marks: dict = {}

if __name__ == "__main__":
    main()
