"""Single-node throughput audit: Spark query vs its DuckDB oracle at
sf0.1, per query, median of N interleaved runs.

The project bar is "matches-or-beats the reference's single-node
throughput at the same data scale"; DuckDB running the oracle SQL is the
strongest single-node stand-in we have (the reference itself publishes
no numbers and is Polars-with-per-stage-disk). This script prints a
ratio table (spark_median / duckdb_median) sorted worst-first so perf
work targets the real offenders, plus a JSON line for SCALING.md.

Both engines do full materialization: Spark via the noop sink (count()
alone lets Catalyst prune projection work), DuckDB via fetchall() on the
same SQL the correctness gate runs.

Usage: python scripts/bench_vs_oracle.py [names...]   # default: bench.py headline set
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_BENCH_RUNS (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def median(xs: list[float]) -> float:
    ys = sorted(xs)
    mid = len(ys) // 2
    return ys[mid] if len(ys) % 2 else (ys[mid - 1] + ys[mid]) / 2.0


def main():
    import __spark_entry__ as E
    from bench import BENCH_QUERIES
    from meds_transforms_spark import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("bench_vs_oracle", master=f"local[{cpus}]", shuffle_partitions=cpus)
    con = duckdb.connect()  # default: all cores — same hardware budget as Spark
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = E.queries(), E.oracle_sql()
    names = sys.argv[1:] or [n for n in BENCH_QUERIES if n in oracles]
    missing = [n for n in names if n not in oracles]
    if missing:
        print(f"note: no oracle for {missing} — skipped", file=sys.stderr)
        names = [n for n in names if n in oracles]

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    qs["meds_fit_vocab"](spark, SF_DIR).count()  # warm JVM/codegen
    s_raw: dict[str, list[float]] = {n: [] for n in names}
    d_raw: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs):
        for n in names:
            t0 = time.time()
            qs[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            s_raw[n].append(time.time() - t0)
            t0 = time.time()
            con.execute(oracles[n]).fetchall()
            d_raw[n].append(time.time() - t0)

    rows = []
    for n in names:
        s, d = median(s_raw[n]), median(d_raw[n])
        rows.append((n, s, d, s / d if d > 0 else float("inf")))
    rows.sort(key=lambda r: -r[3])
    print(f"\n{'query':32s} {'spark':>8s} {'duckdb':>8s} {'ratio':>7s}")
    for n, s, d, r in rows:
        flag = "  <-- >2x" if r > 2 else ""
        print(f"{n:32s} {s:8.2f} {d:8.2f} {r:7.2f}{flag}")
    ts, td = sum(r[1] for r in rows), sum(r[2] for r in rows)
    print(f"{'TOTAL':32s} {ts:8.2f} {td:8.2f} {ts / td:7.2f}")
    print(
        json.dumps(
            {
                "metric": "spark_vs_duckdb_ratio",
                "value": round(ts / td, 3),
                "runs_per_query": runs,
                "sf_dir": SF_DIR,
                "n_queries": len(names),
                "over_2x": [n for n, _, _, r in rows if r > 2],
                "queries": {n: {"spark": round(s, 3), "duckdb": round(d, 3), "ratio": round(r, 2)} for n, s, d, r in rows},
            }
        )
    )


if __name__ == "__main__":
    main()
