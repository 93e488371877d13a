"""Tests for the public plan guard (meds_transforms_spark.plan_guard)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from meds_transforms_spark.plan_guard import UnscalablePlanError, assert_scalable


def test_clean_plan_passes_and_chains(spark):
    df = spark.range(100).groupBy((F.col("id") % 10).alias("k")).count()
    assert assert_scalable(df) is df


def test_cartesian_rejected(spark):
    # both sides must exceed the broadcast threshold, else Spark plans
    # the cross as a BroadcastNestedLoopJoin instead
    a, b = spark.range(5_000_000), spark.range(5_000_000)
    cross = a.crossJoin(b.withColumnRenamed("id", "id2"))
    with pytest.raises(UnscalablePlanError, match="CartesianProduct"):
        assert_scalable(cross)


def test_nested_loop_rejected_unless_allowed(spark):
    a = spark.range(100).toDF("x")
    b = spark.range(5).toDF("y")
    nl = a.join(F.broadcast(b), F.col("x") > F.col("y"))  # non-equi
    with pytest.raises(UnscalablePlanError, match="BroadcastNestedLoopJoin"):
        assert_scalable(nl)
    assert_scalable(nl, allow_nested_loop=True)


def test_global_window_rejected_unless_allowed(spark):
    df = spark.range(100).withColumn("rn", F.row_number().over(W.orderBy("id")))
    with pytest.raises(UnscalablePlanError, match="no PARTITION BY"):
        assert_scalable(df)
    assert_scalable(df, allow_global_window=True)
    # partitioned windows pass the default guard
    ok = spark.range(100).withColumn(
        "rn", F.row_number().over(W.partitionBy(F.col("id") % 10).orderBy("id"))
    )
    assert_scalable(ok)


def test_require_broadcast_joins(spark):
    big = spark.range(10000).toDF("k")
    dim = spark.range(100).toDF("k")
    shuffled = big.join(dim.hint("merge"), "k")
    with pytest.raises(UnscalablePlanError, match="shuffle join"):
        assert_scalable(shuffled, require_broadcast_joins=True)
    assert_scalable(big.join(F.broadcast(dim), "k"), require_broadcast_joins=True)


def test_headline_queries_pass_the_public_guard(spark):
    """The engine's own headline plans satisfy the guard they export."""
    import __spark_entry__ as E

    qs = E.queries()
    for name in ["docs_exact_dedup", "docs_gopher_filter", "events_asof"]:
        assert_scalable(qs[name](spark, "/root/testdata/sf0.001"), name=name)
    # meds_normalization embeds fit_vocabulary_indices' dense-rank over
    # the CODES dimension table — the documented bounded global window
    # (size-asserted in the operator); the guard flags it by design
    assert_scalable(
        qs["meds_normalization"](spark, "/root/testdata/sf0.001"),
        allow_global_window=True,
        name="meds_normalization",
    )
    # dsir's 1-row totals ride a broadcast cross join (the documented
    # lazy alternative to a driver round-trip) — the allowlist case
    assert_scalable(
        qs["docs_dsir_weights"](spark, "/root/testdata/sf0.001"),
        allow_nested_loop=True,
        name="docs_dsir_weights",
    )
