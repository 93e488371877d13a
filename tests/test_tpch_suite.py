"""Plan-shape and contract tests for the TPC-H-style relational suite.

Correctness is gated by the DuckDB oracles (scripts/check_oracles.py);
these tests pin the *physical plans* — the properties that matter at
100 TB — and the driver-contract wiring.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as E

    return E


def test_all_tpch_queries_registered(entry):
    from meds_transforms_spark.plans import tpch

    qs, oracles = entry.queries(), entry.oracle_sql()
    for name in tpch.QUERIES:
        assert name in qs, name
        assert name in oracles, name


def test_q7_broadcasts_all_dims(spark, entry):
    plan = entry.queries()["tpch_q7"](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3  # supplier + nation×2
    assert "CartesianProduct" not in plan


def test_q19_part_filter_pushed_below_join(spark, entry):
    df = entry.queries()["tpch_q19"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The brand IN-list prune must reach the part scan, not sit above the join.
    assert "BroadcastHashJoin" in plan
    assert "Brand#" in plan.split("BroadcastHashJoin")[-1]


def test_q21_counting_rewrite_plan(spark, entry):
    """Q21's double-EXISTS is implemented as chained hash aggregations;
    the only join left is the broadcast against supplier."""
    plan = entry.queries()["tpch_q21"](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q21_matches_literal_exists_formulation(spark, entry):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    sup = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    r = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey").distinct()
    alls = li.select(F.col("l_orderkey").alias("a_ok"), F.col("l_suppkey").alias("a_sk")).distinct()
    r2 = r.select(F.col("l_orderkey").alias("r_ok"), F.col("l_suppkey").alias("r_sk"))
    lone = (
        r.join(alls, (F.col("l_orderkey") == F.col("a_ok")) & (F.col("l_suppkey") != F.col("a_sk")), "left_semi")
        .join(r2, (F.col("l_orderkey") == F.col("r_ok")) & (F.col("l_suppkey") != F.col("r_sk")), "left_anti")
    )
    literal = {
        (r_["s_name"],): r_["numwait"]
        for r_ in lone.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait")).collect()
    }
    rewritten = {
        (r_["s_name"],): r_["numwait"]
        for r_ in entry.queries()["tpch_q21"](spark, SF_DIR).collect()
    }
    assert literal == rewritten


def test_q13_left_outer_preserves_all_customers(spark, entry):
    out = entry.queries()["tpch_q13"](spark, SF_DIR)
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    hist = {r["c_count"]: r["custdist"] for r in out.collect()}
    assert sum(hist.values()) == n_cust


def test_q15_max_revenue_supplier_nonempty(spark, entry):
    rows = entry.queries()["tpch_q15"](spark, SF_DIR).collect()
    assert len(rows) >= 1
    assert all(r["total_revenue"] > 0 for r in rows)
