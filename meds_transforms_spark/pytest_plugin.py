"""Pytest plugin: auto-discovered stage-example golden tests for
downstream packages.

The Spark counterpart of the reference's exported plugin
(``src/MEDS_transforms/pytest_plugin.py`` — options :76-99, test
generation :309-336): a package that registers stages with
``operators.base.register_stage`` and ships reference-format
``<stage>/examples/<scenario>/`` directories gets a parametrized golden
sweep with zero harness code.

Usage in the downstream package::

    # conftest.py
    pytest_plugins = ["meds_transforms_spark.pytest_plugin"]

    # pytest.ini / pyproject [tool.pytest.ini_options]
    meds_spark_stage_examples_dirs = src/my_pkg/stages
    meds_spark_default_in_yaml = tests/static_dataset.yaml   # optional

    # any test module (spark: the package's own SparkSession fixture)
    def test_stage_examples(spark, stage_example, run_stage_example):
        run_stage_example(spark, stage_example)

Scenario discovery, config layering, and the per-stage adapter registry
live in :mod:`meds_transforms_spark.testing.examples`; packages with
stages whose I/O shape the generic runner can't express register an
adapter via ``testing.examples.example_adapter``.
"""

from __future__ import annotations

import pytest

from meds_transforms_spark.testing.examples import (
    discover_stage_examples,
    load_yaml,
    run_example,
)

_DIRS_OPT = "--meds-spark-stage-examples-dir"
_DIRS_INI = "meds_spark_stage_examples_dirs"
_DEFAULT_IN_OPT = "--meds-spark-default-in-yaml"
_DEFAULT_IN_INI = "meds_spark_default_in_yaml"


def pytest_addoption(parser):
    group = parser.getgroup("meds_transforms_spark")
    group.addoption(
        _DIRS_OPT,
        action="append",
        default=[],
        help="Stages root to scan for <stage>/examples/<scenario>/ golden dirs "
        "(repeatable; overrides the ini setting).",
    )
    group.addoption(
        _DEFAULT_IN_OPT,
        default=None,
        help="YAML dataset used as input for scenarios that ship only goldens.",
    )
    parser.addini(_DIRS_INI, type="paths", default=[], help="Stages roots to scan.")
    parser.addini(_DEFAULT_IN_INI, default="", help="Fallback input dataset YAML.")


def _examples_dirs(config) -> list[str]:
    cli = config.getoption(_DIRS_OPT)
    if cli:
        return [str(d) for d in cli]
    return [str(d) for d in config.getini(_DIRS_INI)]


def pytest_generate_tests(metafunc):
    if "stage_example" not in metafunc.fixturenames:
        return
    scenarios = []
    for d in _examples_dirs(metafunc.config):
        scenarios.extend(discover_stage_examples(d))
    if scenarios:
        metafunc.parametrize(
            "stage_example", scenarios, ids=[s.full_name for s in scenarios]
        )
    else:
        marks = pytest.mark.skip(reason=f"no stage examples found ({_DIRS_INI} unset?)")
        metafunc.parametrize("stage_example", [pytest.param(None, marks=marks)])


@pytest.fixture
def run_stage_example(request):
    """Callable (spark, example) → runs the scenario and asserts its
    golden, using the configured fallback dataset when the scenario
    ships no in.yaml."""
    fp = request.config.getoption(_DEFAULT_IN_OPT) or (
        str(request.config.getini(_DEFAULT_IN_INI)) or None
    )
    default_in_yaml = load_yaml(fp) if fp else None

    def _run(spark, example):
        run_example(spark, example, default_in_yaml=default_in_yaml)

    return _run
