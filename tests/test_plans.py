"""Physical-plan shape assertions — the scale contract.

Correctness tests say the operators compute the right rows; these say
Catalyst produced the plan we designed for 100 TB: broadcast joins for
dimension tables (no fact-table shuffle), predicate pushdown into
parquet scans, and pipeline end-to-end viability.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_measurements_broadcasts(spark, meds_df):
    from meds_transforms_spark.operators.aggregate_code_metadata import (
        aggregate_code_metadata,
    )
    from meds_transforms_spark.operators.filter_measurements import filter_measurements

    meta = aggregate_code_metadata(
        meds_df, aggregations=["code/n_subjects", "code/n_occurrences"]
    )
    out = filter_measurements(meds_df, meta, min_subjects_per_code=2)
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "LeftSemi" in plan, plan


def test_normalization_broadcasts(spark, meds_df):
    from meds_transforms_spark.operators.aggregate_code_metadata import (
        aggregate_code_metadata,
    )
    from meds_transforms_spark.operators.fit_vocabulary_indices import (
        fit_vocabulary_indices,
    )
    from meds_transforms_spark.operators.normalization import normalization

    meta = fit_vocabulary_indices(
        aggregate_code_metadata(
            meds_df,
            aggregations=["values/n_occurrences", "values/sum", "values/sum_sqd"],
        )
    )
    plan = plan_of(normalization(meds_df, meta))
    assert "BroadcastHashJoin" in plan, plan
    # No sort-merge join of the fact table anywhere in this plan.
    assert "SortMergeJoin" not in plan, plan


def test_parquet_filter_pushdown(spark, tmp_path, meds_df):
    path = str(tmp_path / "events")
    meds_df.write.parquet(path)
    df = spark.read.parquet(path).filter(F.col("subject_id") == 1).select("code")
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(subject_id), EqualTo(subject_id,1)" in plan, plan
    # Column pruning: scan should read only the needed columns.
    assert "ReadSchema: struct<subject_id:bigint,code:string>" in plan, plan


def test_aggregate_is_partial_final(spark, meds_df):
    from meds_transforms_spark.operators.aggregate_code_metadata import (
        aggregate_code_metadata,
    )

    plan = plan_of(
        aggregate_code_metadata(meds_df, aggregations=["code/n_occurrences"])
    )
    # Two-phase hash aggregation (map-side partial + final) — the native
    # replacement for the reference's per-shard map / cross-shard reduce.
    assert plan.count("HashAggregate") >= 2, plan


def test_pipeline_checkpoint_resume(spark, meds_df, tmp_path):
    from meds_transforms_spark.plans import Pipeline, PipelineConfig

    cfg = PipelineConfig.from_yaml(
        """
stages:
  - filter_subjects: {min_events_per_subject: 2}
"""
    )
    ckpt = str(tmp_path / "ckpt")
    data1, _ = Pipeline(spark, cfg, checkpoint_dir=ckpt).run(meds_df)
    n1 = data1.count()
    # Resume: second run must read the committed checkpoint, not recompute.
    data2, _ = Pipeline(spark, cfg, checkpoint_dir=ckpt, resume=True).run(
        meds_df.limit(0)  # poisoned input proves the checkpoint was used
    )
    assert data2.count() == n1 > 0
