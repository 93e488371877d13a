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


def test_q21_semi_and_anti_joins(spark, entry):
    plan = entry.queries()["tpch_q21"](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_q13_left_outer_preserves_all_customers(spark, entry):
    out = entry.queries()["tpch_q13"](spark, SF_DIR)
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    hist = {r["c_count"]: r["custdist"] for r in out.collect()}
    assert sum(hist.values()) == n_cust


def test_q15_max_revenue_supplier_nonempty(spark, entry):
    rows = entry.queries()["tpch_q15"](spark, SF_DIR).collect()
    assert len(rows) >= 1
    assert all(r["total_revenue"] > 0 for r in rows)
