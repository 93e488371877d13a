"""Golden sweep over the repo's OWN shipped stage_examples/ scenarios,
driven entirely by the exported pytest plugin
(meds_transforms_spark.pytest_plugin) — the exact one-function setup a
downstream package uses. Scenario discovery comes from the
``meds_spark_stage_examples_dirs`` ini setting in pyproject.toml."""

from __future__ import annotations


def test_stage_examples(spark, stage_example, run_stage_example):
    run_stage_example(spark, stage_example)
