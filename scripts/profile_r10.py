"""Round-10 optimization profiler: time declared queries (noop sink,
N warm passes after a warmup), or time ad-hoc pipeline stages, in ONE
Spark session so JVM/codegen warmup does not pollute the comparison.

Usage:
  python scripts/profile_r10.py q <name> [<name>...]     # time queries
  python scripts/profile_r10.py plan <name>              # dump plan
  python scripts/profile_r10.py stages <name>            # query-specific stage breakdown
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_RUNS (default 5)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_RUNS", "5"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(spark, label, build, runs=RUNS):
    """Build + materialize `runs` times; prints walls, min/median, and
    the jobs-per-run count (deterministic, noise-free plan metric:
    every driver sync — eager checkpoint, collect, range-sampling
    pass, validation count — is one job)."""
    walls = []
    jobs = []
    sc = spark.sparkContext
    for i in range(runs):
        group = f"prof-{label}-{i}"
        sc.setJobGroup(group, label)
        t0 = time.time()
        noop(build())
        walls.append(round(time.time() - t0, 3))
        try:
            jobs.append(len(sc.statusTracker().getJobIdsForGroup(group)))
        except Exception:
            jobs.append(-1)
        sc.setJobGroup(f"prof-idle-{i}", "idle")
        spark.catalog.clearCache()
    ws = sorted(walls)
    med = ws[len(ws) // 2]
    print(f"{label:42s} min={ws[0]:7.3f} med={med:7.3f} jobs/run={max(jobs):3d}  raw={walls}")
    return ws[0]


def main():
    import __spark_entry__ as E
    from meds_transforms_spark import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("profile_r10", master=f"local[{cpus}]", shuffle_partitions=cpus)
    qs = E.queries()
    # codegen warmup
    qs["meds_fit_vocab"](spark, SF_DIR).count()

    mode, names = sys.argv[1], sys.argv[2:]
    if mode == "q":
        for name in names:
            spark.sparkContext.setJobDescription(f"r10 profile: {name}")
            timeit(spark, name, lambda n=name: qs[n](spark, SF_DIR))
    elif mode == "plan":
        for name in names:
            print(f"===== {name} =====")
            print(qs[name](spark, SF_DIR)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            ))
    else:
        print(f"unknown mode {mode}", file=sys.stderr)
        sys.exit(2)


if __name__ == "__main__":
    main()
