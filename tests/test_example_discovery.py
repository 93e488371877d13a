"""Auto-discovered golden sweep over the reference's OWN shipped
example scenarios (read-only at /root/reference — skipped when absent).

This backs the hand-written tests in test_reference_goldens.py with the
generic harness (testing/examples.py): discovery must find every
scenario the hand tests cover, and the generic runner must reproduce
each golden through the stage registry — the same machinery a
third-party package gets via the exported pytest plugin.
"""

from __future__ import annotations

import os

import pytest

from meds_transforms_spark.testing.examples import (
    ExampleScenario,
    discover_stage_examples,
    load_yaml,
    run_example,
)

REF_STAGES = "/root/reference/src/MEDS_transforms/stages"
DEFAULT_IN = os.path.join(REF_STAGES, "normalization/examples/on_raw_static_data/in.yaml")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_STAGES), reason="reference repo not available"
)

_SCENARIOS = discover_stage_examples(REF_STAGES)


def test_discovery_finds_all_reference_scenarios():
    names = {s.full_name for s in _SCENARIOS}
    # The complete shipped set — one entry per out_*.yaml in the
    # reference tree. Discovery finding fewer means the walk regressed;
    # finding more means the reference grew and the sweep picks the new
    # scenario up automatically.
    assert len(names) == 20
    expected_subset = {
        "add_time_derived_measurements/in_example_pipeline",
        "add_time_derived_measurements/on_raw_static_data",
        "aggregate_code_metadata/in_example_pipeline/fit_normalization",
        "aggregate_code_metadata/in_example_pipeline/fit_outlier_detection",
        "aggregate_code_metadata/on_raw_static_data",
        "aggregate_code_metadata/with_not_split_defined_shards",
        "bin_numeric_values",
        "bin_numeric_values/custom_bins_fp",
        "extract_values",
        "filter_measurements/match_revise",
        "filter_measurements/simple",
        "filter_subjects",
        "fit_vocabulary_indices/in_example_pipeline",
        "fit_vocabulary_indices/on_raw_static_data",
        "normalization/in_example_pipeline",
        "normalization/on_raw_static_data",
        "occlude_outliers/in_example_pipeline",
        "occlude_outliers/on_raw_static_data",
        "reorder_measurements",
        "reshard_to_split",
    }
    assert expected_subset <= names


@pytest.fixture(scope="module")
def default_in_yaml():
    return load_yaml(DEFAULT_IN)


@pytest.mark.parametrize(
    "scenario", _SCENARIOS, ids=[s.full_name for s in _SCENARIOS]
)
def test_reference_scenario(spark, scenario: ExampleScenario, default_in_yaml):
    run_example(spark, scenario, default_in_yaml=default_in_yaml)


def test_third_party_stage_examples(spark, tmp_path):
    """A downstream package's stage + examples dir drives the same
    harness: register a stage, lay out <stage>/examples/<scenario>/,
    discover, run."""
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.base import register_stage

    @register_stage("thirdparty_double_values")
    def thirdparty_double_values(df, factor: float = 2.0):
        return df.withColumn(
            "numeric_value",
            (F.col("numeric_value") * F.lit(float(factor))).cast("float"),
        )

    d = tmp_path / "thirdparty_double_values" / "examples" / "simple"
    d.mkdir(parents=True)
    (d / "in.yaml").write_text(
        'data/0.parquet: |-2\n'
        "  subject_id,time,code,numeric_value\n"
        '  1,"01/01/2021, 00:00:00",HR,10.0\n'
        '  2,"01/01/2021, 00:00:00",HR,-4.0\n'
    )
    (d / "cfg.yaml").write_text("factor: 3.0\n")
    (d / "out_data.yaml").write_text(
        'data/0.parquet: |-2\n'
        "  subject_id,time,code,numeric_value\n"
        '  1,"01/01/2021, 00:00:00",HR,30.0\n'
        '  2,"01/01/2021, 00:00:00",HR,-12.0\n'
    )
    found = discover_stage_examples(str(tmp_path))
    assert [s.full_name for s in found] == ["thirdparty_double_values/simple"]
    run_example(spark, found[0])


def test_pytest_plugin_end_to_end(spark, pytester):
    """The exported plugin (meds_transforms_spark.pytest_plugin) gives a
    downstream package a parametrized golden sweep from one test
    function — run here in-process against a synthetic package layout.
    The inner run's SparkSession.getOrCreate() reuses this session."""
    stages = pytester.mkdir("stages")
    d = stages / "plugin_demo_scale" / "examples" / "base"
    d.mkdir(parents=True)
    (d / "in.yaml").write_text(
        'data/0.parquet: |-2\n'
        "  subject_id,time,code,numeric_value\n"
        '  1,"01/01/2021, 00:00:00",HR,2.5\n'
    )
    (d / "out_data.yaml").write_text(
        'data/0.parquet: |-2\n'
        "  subject_id,time,code,numeric_value\n"
        '  1,"01/01/2021, 00:00:00",HR,5.0\n'
    )
    pytester.makeconftest(
        """
        import pytest
        from pyspark.sql import SparkSession, functions as F
        from meds_transforms_spark.operators.base import register_stage

        pytest_plugins = ["meds_transforms_spark.pytest_plugin"]

        @register_stage("plugin_demo_scale")
        def plugin_demo_scale(df, factor: float = 2.0):
            return df.withColumn(
                "numeric_value",
                (F.col("numeric_value") * F.lit(float(factor))).cast("float"),
            )

        @pytest.fixture(scope="session")
        def spark():
            return SparkSession.builder.getOrCreate()
        """
    )
    pytester.makepyfile(
        """
        def test_stage_examples(spark, stage_example, run_stage_example):
            run_stage_example(spark, stage_example)
        """
    )
    result = pytester.runpytest_inprocess(
        "--meds-spark-stage-examples-dir", str(stages), "-p", "no:cacheprovider"
    )
    result.assert_outcomes(passed=1)
