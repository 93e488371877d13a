"""Single-node throughput: our Spark pipeline vs DuckDB on one big file.

The reference engine (Polars + per-stage disk materialization) cannot
run in this container, so the single-node bar is DuckDB — the oracle
engine, a native vectorized OLAP engine and a strictly HARDER target
than the reference's architecture (which writes every stage's output
to parquet and coordinates subprocess workers; see BASELINE.md).

Both engines run the identical 6-stage MEDS chain (filter_subjects →
aggregate → filter_measurements → occlude_outliers → fit_vocab →
normalization): Spark via ``q_meds_pipeline_e2e`` exactly as benched,
DuckDB via that query's own oracle SQL, over the same generated
events parquet. Both fully materialize (noop sink / CTAS). Data is
hash-derived and deterministic.

Usage: python scripts/scale_pipeline_singlenode.py [n_rows]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

SCRATCH = os.path.join(REPO, ".scratch", "singlenode")
SPAN_S = 30 * 86_400


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_users = max(n_rows // 100, 1)

    import __spark_entry__ as E
    from meds_transforms_spark import get_spark

    spark = get_spark("scale_singlenode")
    path = os.path.join(SCRATCH, "events.parquet")
    shutil.rmtree(SCRATCH, ignore_errors=True)
    (
        spark.range(n_rows)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(
                F.lit(1704067200) + F.pmod(F.xxhash64("id"), F.lit(SPAN_S))
            ).alias("ts"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_users)).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in ("view", "click", "purchase", "signup", "error")]),
                (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(5)) + 1).cast("int"),
            ).alias("event_type"),
            (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1_000_000)) / 10_000.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        .write.mode("overwrite")
        .parquet(path)
    )

    q = E.queries()["meds_pipeline_e2e"]
    # Warm codegen/readers once at a fraction of the size, then time.
    t0 = time.time()
    q(spark, SCRATCH).write.format("noop").mode("overwrite").save()
    t_spark_cold = time.time() - t0
    t0 = time.time()
    q(spark, SCRATCH).write.format("noop").mode("overwrite").save()
    t_spark = time.time() - t0

    import duckdb

    con = duckdb.connect()
    con.execute("PRAGMA threads=%d" % (os.cpu_count() or 4))
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{path}/*.parquet'")
    sql = E.oracle_sql()["meds_pipeline_e2e"]
    t0 = time.time()
    con.execute(f"CREATE TABLE out1 AS {sql}")
    t_duck_cold = time.time() - t0
    t0 = time.time()
    con.execute(f"CREATE TABLE out2 AS {sql}")
    t_duck = time.time() - t0
    n_duck = con.execute("SELECT count(*) FROM out2").fetchone()[0]
    n_spark = q(spark, SCRATCH).count()
    assert n_spark == n_duck, (n_spark, n_duck)

    print(
        f"{n_rows:,} rows -> {n_spark:,} out; "
        f"spark {t_spark:.1f}s (cold {t_spark_cold:.1f}s), "
        f"duckdb {t_duck:.1f}s (cold {t_duck_cold:.1f}s)"
    )
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
