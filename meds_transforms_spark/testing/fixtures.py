"""Golden-fixture test harness — the reference's example format on Spark.

The reference validates every stage with static golden scenarios: a
directory holding ``in.yaml`` (input tables as CSV strings keyed by
relative path), ``cfg.yaml`` (stage config), and ``out_data.yaml`` /
``out_metadata.yaml`` (expected outputs) — see
src/MEDS_transforms/stages/examples.py (``is_example_dir``, tolerances at
:856-873) and stages/filter_measurements/examples/simple/.

This harness keeps that exact format so scenarios written for the
reference's semantics validate this engine: CSV strings → DataFrames,
run the registered stage, compare with rel_tol=1e-3 / abs_tol=1e-5
(data row-order-sensitive after canonical sort; metadata order-free).
"""

from __future__ import annotations

import io
import math
import os
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from meds_transforms_spark.schema import MEDS_DATA_SCHEMA

REL_TOL = 1e-3
ABS_TOL = 1e-5

#: Timestamp format used in reference fixture CSVs ("12/28/1980, 00:00:00").
FIXTURE_TIME_FORMAT = "%m/%d/%Y, %H:%M:%S"

_CANONICAL_DTYPES = {
    "subject_id": "int64",
    "numeric_value": "float32",
}


def _parse_csv(text: str) -> pd.DataFrame:
    pdf = pd.read_csv(io.StringIO(text.strip()), skipinitialspace=True)
    for col, dt in _CANONICAL_DTYPES.items():
        if col in pdf.columns:
            pdf[col] = pdf[col].astype(dt)
    if "time" in pdf.columns:
        pdf["time"] = pd.to_datetime(
            pdf["time"], format=FIXTURE_TIME_FORMAT, errors="coerce"
        )
    return _normalize_object_cols(pdf)


def concat_shards(parts: list[pd.DataFrame]) -> pd.DataFrame:
    """``pd.concat`` with dtypes pinned EXPLICITLY before the concat,
    so the result does not depend on pandas' empty/all-NA dtype
    inference (a FutureWarning today, a behavior change on the next
    pandas major): for every column, the dtype of the first shard
    holding real values wins, and empty or all-NA shard columns are
    cast to it up front. Semantically identical to the legacy concat
    (which excluded all-NA entries from dtype determination) on every
    fixture in the suite — now by construction instead of by
    deprecation grace."""
    parts = [p for p in parts if len(p.columns)]
    if not parts:
        return pd.DataFrame()
    pinned: dict[str, object] = {}
    for p in parts:
        for col in p.columns:
            if col not in pinned and not p[col].isna().all():
                pinned[col] = p[col].dtype
    fixed = []
    for p in parts:
        out = p
        for col, dt in pinned.items():
            if col in p.columns and p[col].dtype != dt and p[col].isna().all():
                if out is p:
                    out = p.copy()
                try:
                    out[col] = out[col].astype(dt)
                except (TypeError, ValueError):
                    # non-nullable target (e.g. int64) can't hold the
                    # NAs — float64 is what the legacy concat produced
                    # for that mix
                    out[col] = out[col].astype("float64")
        fixed.append(out)
    return pd.concat(fixed, ignore_index=True)


def _normalize_object_cols(pdf: pd.DataFrame) -> pd.DataFrame:
    """Object-column normalization, shared by _parse_csv and the
    post-concat pass (an all-null shard reverts boolean columns to
    object): boolean-ish columns (e.g. numeric_value/is_inlier) become
    nullable pandas boolean → Spark BooleanType, and NaN in object
    columns becomes None, not the string \"nan\", when crossing into
    Spark."""
    for col in pdf.columns:
        if pdf[col].dtype == object:
            nonnull = pdf[col].dropna()
            if len(nonnull) and set(nonnull.unique()) <= {True, False, "True", "False"}:
                pdf[col] = pdf[col].map(
                    {True: True, False: False, "True": True, "False": False}
                ).astype("boolean")
            else:
                pdf[col] = pdf[col].where(pd.notnull(pdf[col]), None)
    return pdf


def frame_from_pandas(spark: SparkSession, pdf: pd.DataFrame, use_meds_schema: bool = True) -> DataFrame:
    pdf = _normalize_object_cols(pdf.copy())
    if use_meds_schema and set(c.name for c in MEDS_DATA_SCHEMA.fields[:4]) <= set(pdf.columns):
        from pyspark.sql import types as T

        fields = [f for f in MEDS_DATA_SCHEMA.fields if f.name in pdf.columns]
        known = [f.name for f in fields]
        extra = [c for c in pdf.columns if c not in known]
        for c in extra:
            if pdf[c].dtype == "boolean":
                fields.append(T.StructField(c, T.BooleanType(), True))
            elif str(pdf[c].dtype).startswith("float"):
                fields.append(T.StructField(c, T.DoubleType(), True))
            elif str(pdf[c].dtype).startswith("int"):
                fields.append(T.StructField(c, T.LongType(), True))
            else:
                fields.append(T.StructField(c, T.StringType(), True))
        schema = T.StructType(fields)
        out = pdf[[f.name for f in fields]].copy()
        for c in out.columns:
            if str(out[c].dtype) == "boolean":
                # pd.NA is rejected by Spark's row verifier — use
                # object with Python None/bool, schema keeps BooleanType.
                out[c] = out[c].astype(object).where(out[c].notna(), None)
        return spark.createDataFrame(out, schema=schema)
    return spark.createDataFrame(pdf)


def load_fixture_frame(spark: SparkSession, csv_text: str, use_meds_schema: bool = True) -> DataFrame:
    return frame_from_pandas(spark, _parse_csv(csv_text), use_meds_schema)


def assert_frames_match(
    got: DataFrame,
    expected: pd.DataFrame,
    check_row_order: bool = False,
    rel_tol: float = REL_TOL,
    abs_tol: float = ABS_TOL,
) -> None:
    g = got.toPandas()
    e = expected.copy()
    assert sorted(g.columns) == sorted(e.columns), (
        f"column mismatch: {sorted(g.columns)} vs {sorted(e.columns)}"
    )
    g = g.reindex(sorted(g.columns), axis=1)
    e = e.reindex(sorted(e.columns), axis=1)
    if not check_row_order:
        g = g.sort_values(list(g.columns)).reset_index(drop=True)
        e = e.sort_values(list(e.columns)).reset_index(drop=True)
    else:
        g, e = g.reset_index(drop=True), e.reset_index(drop=True)
    assert len(g) == len(e), f"row count {len(g)} vs {len(e)}"
    for col in g.columns:
        for i, (a, b) in enumerate(zip(g[col], e[col])):
            a_na, b_na = pd.isna(a), pd.isna(b)
            if a_na and b_na:
                continue
            assert not (a_na or b_na), f"{col}[{i}]: {a!r} vs {b!r}"
            if isinstance(a, float) or isinstance(b, float):
                assert math.isclose(float(a), float(b), rel_tol=rel_tol, abs_tol=abs_tol), (
                    f"{col}[{i}]: {a!r} vs {b!r}"
                )
            else:
                assert str(a) == str(b), f"{col}[{i}]: {a!r} vs {b!r}"


@dataclass
class StageExample:
    """One golden scenario: inputs + config + expected output."""

    stage: str
    in_tables: dict[str, str]  # relative path → CSV string
    cfg: dict = field(default_factory=dict)
    out_data: str | None = None  # CSV string
    out_metadata: str | None = None

    @classmethod
    def from_dir(cls, stage: str, path: str) -> "StageExample":
        import yaml

        def _load(name):
            p = os.path.join(path, name)
            if not os.path.exists(p):
                return None
            with open(p) as f:
                return yaml.safe_load(f)

        in_yaml = _load("in.yaml") or {}
        out_data = _load("out_data.yaml")
        out_metadata = _load("out_metadata.yaml")
        if isinstance(out_data, dict):
            out_data = next(iter(out_data.values()))
        if isinstance(out_metadata, dict):
            out_metadata = next(iter(out_metadata.values()))
        return cls(
            stage=stage,
            in_tables=in_yaml,
            cfg=_load("cfg.yaml") or {},
            out_data=out_data,
            out_metadata=out_metadata,
        )

    def run(self, spark: SparkSession) -> None:
        """Materialize inputs, run the stage, compare goldens."""
        from meds_transforms_spark.operators.base import get_stage

        data_frames = [
            load_fixture_frame(spark, csv)
            for rel, csv in self.in_tables.items()
            if rel.startswith("data/")
        ]
        meta_csv = next(
            (csv for rel, csv in self.in_tables.items() if "codes" in rel), None
        )
        assert data_frames, "fixture has no data/ inputs"
        df = data_frames[0]
        for extra in data_frames[1:]:
            df = df.unionByName(extra, allowMissingColumns=True)

        cfg = dict(self.cfg)
        stage = get_stage(self.stage)
        import inspect

        params = list(inspect.signature(stage.fn).parameters)
        if "code_metadata" in params[1:] and meta_csv is not None:
            cfg["code_metadata"] = load_fixture_frame(spark, meta_csv, use_meds_schema=False)
        out = stage(df, **cfg)

        if self.out_data is not None:
            assert_frames_match(out, _parse_csv(self.out_data), check_row_order=False)
        if self.out_metadata is not None:
            assert_frames_match(out, _parse_csv(self.out_metadata), check_row_order=False)
