"""Reference-style compute-fn DI shapes (compute_modes/compute_fn.py
:25-317 parity): functors, unbound fns, *dfs reducers, and
code_metadata auto-loading all run unmodified through the registry and
the YAML pipeline."""

from __future__ import annotations

from typing import Callable

import pytest
from pyspark.sql import functions as F

from meds_transforms_spark.compute_modes import (
    ComputeFnType,
    DotDict,
    bind_compute_fn,
)
from meds_transforms_spark.operators.base import register_stage


def test_compute_fn_type_classification():
    def direct(df):
        return df

    def direct_dfs(*dfs):
        return dfs[0]

    def unbound(df, cfg, stage_cfg):
        return df

    def functor(stage_cfg) -> Callable:
        return lambda df: df

    def functor_unannotated(cfg):
        return lambda df: df

    def not_ours(df, factor):
        return df

    def invalid(df, cfg) -> Callable:
        return lambda df: df

    assert ComputeFnType.from_fn(direct) is ComputeFnType.DIRECT
    assert ComputeFnType.from_fn(direct_dfs) is ComputeFnType.DIRECT
    assert ComputeFnType.from_fn(unbound) is ComputeFnType.UNBOUND
    assert ComputeFnType.from_fn(functor) is ComputeFnType.FUNCTOR
    assert ComputeFnType.from_fn(functor_unannotated) is ComputeFnType.FUNCTOR
    assert ComputeFnType.from_fn(not_ours) is None
    assert ComputeFnType.from_fn(invalid) is None


def test_bind_unbound_and_functor(spark):
    df = spark.createDataFrame([(1,)], "a long")

    def unbound(df, cfg, stage_cfg):
        return df.withColumn("v", F.lit(cfg.global_val + stage_cfg.local_val))

    bound = bind_compute_fn({"global_val": 10}, {"local_val": 5}, unbound)
    assert bound(df).collect()[0].v == 15

    def functor(stage_cfg) -> Callable:
        return lambda d: d.withColumn("v", F.lit(stage_cfg.factor * 2))

    bound = bind_compute_fn({}, {"factor": 21}, functor)
    assert bound(df).collect()[0].v == 42

    assert bind_compute_fn({}, {}, None)(df) is df  # identity


def test_bind_code_metadata_autoload(spark, tmp_path):
    """A code_metadata parameter with no frame in hand auto-loads
    stage_cfg.metadata_input_dir/codes.parquet as a Spark scan
    (compute_fn.py:301-305)."""
    meta_dir = tmp_path / "metadata"
    spark.createDataFrame(
        [("HR", "heart rate")], "code string, description string"
    ).write.parquet(str(meta_dir / "codes.parquet"))

    def enrich(df, code_metadata):
        return df.join(F.broadcast(code_metadata), "code", "left")

    bound = bind_compute_fn(
        {}, {"metadata_input_dir": str(meta_dir)}, enrich, spark=spark
    )
    df = spark.createDataFrame([(1, "HR")], "subject_id long, code string")
    assert bound(df).collect()[0].description == "heart rate"

    with pytest.raises(ValueError, match="metadata_input_dir"):
        bind_compute_fn({}, {}, enrich, spark=spark)(df)


def test_reference_style_stages_in_pipeline(spark, meds_df):
    """The headline contract: a third-party package registering
    reference-shaped stages (functor + unbound + *dfs) runs them from a
    YAML pipeline with per-stage config, unmodified."""
    from meds_transforms_spark.plans import Pipeline, PipelineConfig

    @register_stage("ref_style_tag_rows")
    def ref_style_tag_rows(df, stage_cfg):
        return df.withColumn("tag", F.lit(stage_cfg.tag))

    @register_stage("ref_style_scale")
    def ref_style_scale(stage_cfg) -> Callable:
        f = float(stage_cfg.factor)
        return lambda df: df.withColumn(
            "numeric_value", (F.col("numeric_value") * f).cast("float")
        )

    @register_stage("ref_style_passthrough")
    def ref_style_passthrough(*dfs):
        assert len(dfs) == 1  # Spark frame == the all-shard union
        return dfs[0]

    cfg = PipelineConfig.from_yaml(
        """
stages:
  - ref_style_tag_rows: {tag: cohortA}
  - ref_style_scale: {factor: 2.0}
  - ref_style_passthrough: {}
"""
    )
    out, _ = Pipeline(spark, cfg).run(meds_df)
    rows = out.filter(F.col("code") == "HEIGHT").collect()
    assert {r.tag for r in rows} == {"cohortA"}
    assert sorted(round(r.numeric_value, 1) for r in rows) == [320.8, 350.6]


def test_dotdict_nested_attribute_access():
    d = DotDict({"a": {"b": {"c": 3}}, "x": 1})
    assert d.a.b.c == 3 and d.x == 1
    with pytest.raises(AttributeError):
        _ = d.missing


def test_functor_detection_with_stringified_annotations():
    """Regression: under `from __future__ import annotations` every
    return annotation is a STRING, and only the bare 'Callable[...]'
    spelling was recognized — 'collections.abc.Callable'/'typing.
    Callable' functors silently registered as kwargs-mode stages."""
    from meds_transforms_spark.compute_modes import ComputeFnType

    ns = {}
    exec(
        "from __future__ import annotations\n"
        "import collections.abc\n"
        "import typing\n"
        "def f1(cfg) -> collections.abc.Callable: ...\n"
        "def f2(stage_cfg) -> typing.Callable: ...\n"
        "def f3(cfg) -> Callable: ...\n",
        ns,
    )
    assert ComputeFnType.from_fn(ns["f1"]) is ComputeFnType.FUNCTOR
    assert ComputeFnType.from_fn(ns["f2"]) is ComputeFnType.FUNCTOR
    assert ComputeFnType.from_fn(ns["f3"]) is ComputeFnType.FUNCTOR
