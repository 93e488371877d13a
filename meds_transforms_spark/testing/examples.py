"""Stage-example auto-discovery + generic golden runner.

Re-expresses the reference's example machinery on Spark:

- example-directory format and discovery walk —
  ``src/MEDS_transforms/stages/examples.py`` (``is_example_dir``
  :876-880, ``StageExample.from_dir`` :883-923) and the recursive
  ``test_cases`` walk in ``stages/base.py:722-746``;
- comparison tolerances (rel 1e-3 / abs 1e-5, row-order-free) —
  ``examples.py:873``;
- stage default-config layering (stage_dir/config.yaml merged under the
  example's cfg.yaml) — ``stages/base.py:681-696``.

A scenario directory holds ``in.yaml`` (tables as CSV strings or row
lists keyed by dataset-relative path), optional ``cfg.yaml``, and
``out_data.yaml`` / ``out_metadata.yaml`` goldens. Discovery walks a
stages root (``<stage_name>/examples/**``); running dispatches through
the stage registry with a small per-stage adapter layer for stages
whose I/O shape differs from "data in, data out" (metadata reducers,
rank-over-codes, bin derivation, order-sensitive output, split
resharding). Third-party packages register extra adapters with
:func:`example_adapter` and drive everything from the exported pytest
plugin (``meds_transforms_spark.pytest_plugin``).
"""

from __future__ import annotations

import inspect
import os
from dataclasses import dataclass
from functools import cached_property

import pandas as pd

from meds_transforms_spark.testing.fixtures import (
    _parse_csv,
    assert_frames_match,
    concat_shards,
    frame_from_pandas,
    load_fixture_frame,
)

OUT_FILES = ("out_data.yaml", "out_metadata.yaml")
CODES_KEY = "metadata/codes.parquet"
SPLITS_KEY = "metadata/subject_splits.parquet"


def load_yaml(path: str):
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


from meds_transforms_spark.utils import resolve_pkg_path  # noqa: F401  (re-export)


def is_example_dir(path: str) -> bool:
    """A directory is a scenario iff it ships a golden (examples.py:876-880)."""
    return any(os.path.isfile(os.path.join(path, f)) for f in OUT_FILES)


def iter_example_dirs(examples_root: str):
    """Yield every scenario dir under ``examples_root``, including
    scenarios nested inside other scenarios (e.g. the reference's
    ``bin_numeric_values/examples`` is itself a scenario AND contains
    ``custom_bins_fp/``)."""
    stack = [examples_root]
    while stack:
        d = stack.pop()
        if not os.path.isdir(d):
            continue
        if is_example_dir(d):
            yield d
        stack.extend(
            sorted(
                os.path.join(d, sub)
                for sub in os.listdir(d)
                if os.path.isdir(os.path.join(d, sub))
            )
        )


@dataclass(frozen=True)
class ExampleScenario:
    """One discovered golden scenario (lazy-loading handle)."""

    stage_name: str
    scenario_name: str  # "" == the examples dir itself (reference ".")
    example_dir: str
    stage_dir: str | None = None

    @property
    def full_name(self) -> str:
        return (
            f"{self.stage_name}/{self.scenario_name}"
            if self.scenario_name
            else self.stage_name
        )

    def _maybe_yaml(self, name: str):
        p = os.path.join(self.example_dir, name)
        return load_yaml(p) if os.path.isfile(p) else None

    @cached_property
    def in_yaml(self) -> dict | None:
        return self._maybe_yaml("in.yaml")

    @cached_property
    def cfg(self) -> dict:
        return self._maybe_yaml("cfg.yaml") or {}

    @cached_property
    def default_cfg(self) -> dict:
        """Stage-level config.yaml defaults (stages/base.py:688-696)."""
        if not self.stage_dir:
            return {}
        p = os.path.join(self.stage_dir, "config.yaml")
        return load_yaml(p) or {} if os.path.isfile(p) else {}

    @cached_property
    def out_data_yaml(self) -> dict | None:
        return self._maybe_yaml("out_data.yaml")

    @cached_property
    def out_metadata_yaml(self) -> dict | None:
        return self._maybe_yaml("out_metadata.yaml")


def discover_stage_examples(
    stages_root: str, stage_names: tuple[str, ...] | None = None
) -> list[ExampleScenario]:
    """Walk ``<stages_root>/<stage>/examples/**`` for every stage dir."""
    found: list[ExampleScenario] = []
    if not os.path.isdir(stages_root):
        return found
    for stage_name in sorted(os.listdir(stages_root)):
        if stage_names is not None and stage_name not in stage_names:
            continue
        stage_dir = os.path.join(stages_root, stage_name)
        examples_root = os.path.join(stage_dir, "examples")
        if not os.path.isdir(examples_root):
            continue
        for d in iter_example_dirs(examples_root):
            rel = os.path.relpath(d, examples_root)
            found.append(
                ExampleScenario(
                    stage_name=stage_name,
                    scenario_name="" if rel == "." else rel,
                    example_dir=d,
                    stage_dir=stage_dir,
                )
            )
    return sorted(found, key=lambda e: e.full_name)


# ----------------------------------------------------------------------
# Input / expected-output materialization
# ----------------------------------------------------------------------

def data_frame(spark, in_yaml: dict, prefix: str = "data/"):
    """Union the CSV shards under ``prefix`` into one DataFrame.

    Concatenated in pandas first: an all-null shard would otherwise lose
    a column's dtype and break the cross-shard union. Each shard is a
    CSV string or a YAML row list — the same dual format codes_frame
    dispatches on."""
    parts = [
        _parse_csv(v) if isinstance(v, str) else _flatten_quantile_rows(v)
        for key, v in in_yaml.items()
        if key.startswith(prefix)
    ]
    if not parts:
        return None
    return frame_from_pandas(spark, concat_shards(parts))


def codes_frame(spark, in_yaml: dict):
    """codes.parquet input — either a CSV string or a YAML row list
    (the reference ships both; examples.py read_metadata_only)."""
    raw = in_yaml.get(CODES_KEY)
    if raw is None:
        return None
    if isinstance(raw, str):
        return load_fixture_frame(spark, raw, use_meds_schema=False)
    return frame_from_pandas(spark, _flatten_quantile_rows(raw), use_meds_schema=False)


def expected_pdf(out_yaml: dict, prefix: str = "data/") -> pd.DataFrame:
    parts = []
    for key, val in out_yaml.items():
        if not key.startswith(prefix):
            continue
        parts.append(_parse_csv(val) if isinstance(val, str) else _flatten_quantile_rows(val))
    return concat_shards(parts)


def _flatten_quantile_rows(rows: list[dict]) -> pd.DataFrame:
    """YAML row lists carry ``values/quantiles`` as a nested dict; the
    comparison plane is flat columns (one per quantile field)."""
    pdf = pd.DataFrame(rows)
    if "values/quantiles" in pdf.columns:
        qcols = sorted(
            {k for r in rows for k in (r.get("values/quantiles") or {})}
        )
        for qc in qcols:
            pdf[qc] = [(r.get("values/quantiles") or {}).get(qc) for r in rows]
        pdf = pdf.drop(columns=["values/quantiles"])
    return pdf


def _flatten_quantile_frame(df):
    from pyspark.sql import functions as F

    if "values/quantiles" not in df.columns:
        return df
    qcols = [f.name for f in df.schema["values/quantiles"].dataType.fields]
    return df.select(
        *[c for c in df.columns if c != "values/quantiles"],
        *[F.col("`values/quantiles`").getField(qc).alias(qc) for qc in qcols],
    )


# description / parent_codes: list-vs-string representation differs
# between YAML goldens and CSV fixtures — passthrough columns, not
# computed statistics; excluded from metadata comparison.
METADATA_PASSTHROUGH = ("description", "parent_codes")


def check_data(got_df, expected: pd.DataFrame, drop_cols=()) -> None:
    e = expected.drop(columns=[c for c in drop_cols if c in expected.columns])
    g = got_df.drop(*[c for c in drop_cols if c in got_df.columns])
    assert_frames_match(g, e, check_row_order=False)


def check_metadata(got_df, ex: ExampleScenario) -> None:
    out_yaml = ex.out_metadata_yaml
    assert out_yaml is not None, f"{ex.full_name}: no out_metadata.yaml"
    expected = expected_pdf(out_yaml, prefix="metadata/")
    got = _flatten_quantile_frame(got_df)
    check_data(got, expected, drop_cols=METADATA_PASSTHROUGH)


# ----------------------------------------------------------------------
# Generic runner + per-stage adapters
# ----------------------------------------------------------------------

_ADAPTERS: dict[str, object] = {}


def example_adapter(stage_name: str):
    """Register a custom runner for stages whose example I/O shape the
    generic data-stage flow can't express. Third-party packages use this
    alongside ``operators.base.register_stage``."""

    def deco(fn):
        _ADAPTERS[stage_name] = fn
        return fn

    return deco


def _deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def effective_cfg(ex: ExampleScenario) -> dict:
    """Example cfg layered over the stage's default config.yaml, with
    null-valued defaults dropped (reference renders unset options as
    explicit nulls)."""
    merged = _deep_merge(ex.default_cfg, ex.cfg)
    return {k: v for k, v in merged.items() if v is not None}


def _filter_kwargs(fn, cfg: dict) -> dict:
    """Restrict cfg to fn's signature (unless it takes **kwargs), and
    translate the reference's ``do_<x>`` flags to bare ``<x>`` params."""
    sig = inspect.signature(fn)
    if any(p.kind is p.VAR_KEYWORD for p in sig.parameters.values()):
        return cfg
    out = {}
    for k, v in cfg.items():
        if k in sig.parameters:
            out[k] = v
        elif k.startswith("do_") and k[3:] in sig.parameters:
            out[k[3:]] = v
    return out


def _resolve_input(ex: ExampleScenario, default_in_yaml: dict | None) -> dict:
    in_yaml = ex.in_yaml if ex.in_yaml is not None else default_in_yaml
    if in_yaml is None:
        raise ValueError(
            f"{ex.full_name}: scenario ships no in.yaml and no default "
            "input dataset was provided"
        )
    return in_yaml


def run_example(spark, ex: ExampleScenario, default_in_yaml: dict | None = None):
    """Materialize → run → assert one scenario. ``default_in_yaml`` is
    the canonical input dataset for scenarios that ship only goldens
    (the reference falls back to its static sample data the same way,
    examples.py StageExample.in_data)."""
    adapter = _ADAPTERS.get(ex.stage_name, _run_data_stage)
    adapter(spark, ex, default_in_yaml)


def _run_data_stage(spark, ex: ExampleScenario, default_in_yaml: dict | None):
    """Generic flow: data (+ codes) in, data out, optional match-revise."""
    from meds_transforms_spark.operators.base import get_stage

    in_yaml = _resolve_input(ex, default_in_yaml)
    data = data_frame(spark, in_yaml)
    assert data is not None, f"{ex.full_name}: no data/ inputs"
    stage = get_stage(ex.stage_name)
    cfg = effective_cfg(ex)
    mr = cfg.pop("_match_revise", None)
    mode = cfg.pop("_match_revise_mode", "match_and_revise")

    params = list(inspect.signature(stage.fn).parameters)
    # Reference-style compute fns take (df, cfg/stage_cfg) — their
    # scenario config keys are BOUND INTO stage_cfg by Stage.__call__,
    # never named in the signature, so filtering against the signature
    # would strip every key and run the stage with defaults.
    if stage.compute_mode != "reference":
        cfg = _filter_kwargs(stage.fn, cfg)
    if "code_metadata" in params[1:]:
        meta = codes_frame(spark, in_yaml)
        if meta is not None:
            cfg["code_metadata"] = meta

    if mr:
        from meds_transforms_spark.operators.match_revise import match_revise

        out = match_revise(
            data, lambda d, **c: stage(d, **{**cfg, **c}), mr, mode=mode
        )
    else:
        out = stage(data, **cfg)

    assert ex.out_data_yaml is not None, f"{ex.full_name}: expected out_data.yaml"
    check_data(out, expected_pdf(ex.out_data_yaml))


@example_adapter("add_time_derived_measurements")
def _run_add_time_derived(spark, ex, default_in_yaml):
    """Sub-configs are nested per-sub-stage dicts; filter each to its
    sub-operator's signature (the reference's DOB_regex default has no
    Spark counterpart — DOB_code carries the semantics here)."""
    from meds_transforms_spark.operators.add_time_derived import (
        _SUBSTAGES,
        add_time_derived_measurements,
    )

    in_yaml = _resolve_input(ex, default_in_yaml)
    cfg = {}
    for name, sub in effective_cfg(ex).items():
        fn = _SUBSTAGES.get(name)
        if fn is None:
            continue
        sub = {k: v for k, v in (sub or {}).items() if v is not None}
        cfg[name] = _filter_kwargs(fn, sub)
    out = add_time_derived_measurements(data_frame(spark, in_yaml), **cfg)
    check_data(out, expected_pdf(ex.out_data_yaml))


@example_adapter("aggregate_code_metadata")
def _run_aggregate_code_metadata(spark, ex, default_in_yaml):
    """Metadata reducer: train-only input (shard-name prefix when the
    fixture ships split shards — the reference's partition-pruning path,
    mapreduce/stage.py:463-489 — else a subject_splits semi-join), then
    join_and_replace into the incoming codes table."""
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.aggregate_code_metadata import (
        aggregate_code_metadata,
        join_and_replace,
    )

    in_yaml = _resolve_input(ex, default_in_yaml)
    cfg = effective_cfg(ex)
    if any(k.startswith("data/train/") for k in in_yaml):
        data = data_frame(spark, in_yaml, prefix="data/train/")
    else:
        data = data_frame(spark, in_yaml)
        if SPLITS_KEY in in_yaml:
            splits = load_fixture_frame(
                spark, in_yaml[SPLITS_KEY], use_meds_schema=False
            )
            train_ids = splits.filter(F.col("split") == "train").select("subject_id")
            data = data.join(F.broadcast(train_ids), "subject_id", "left_semi")
    out = aggregate_code_metadata(
        data,
        aggregations=cfg["aggregations"],
        do_summarize_over_all_codes=cfg.get("do_summarize_over_all_codes", False),
    )
    # Enrich into the incoming codes table only when the scenario ships
    # its own inputs; with the fallback dataset the golden covers the
    # computed statistics alone.
    if ex.in_yaml is not None:
        incoming = codes_frame(spark, in_yaml)
        if incoming is not None:
            out = join_and_replace(out, incoming, ["code"])
    check_metadata(out, ex)


@example_adapter("fit_vocabulary_indices")
def _run_fit_vocabulary_indices(spark, ex, default_in_yaml):
    """Rank-over-codes: input is the codes table. Scenarios without an
    in.yaml define their input implicitly as the golden minus the one
    computed column (the stage is a pure column-append)."""
    from meds_transforms_spark.operators.fit_vocabulary_indices import (
        fit_vocabulary_indices,
    )

    if ex.in_yaml is not None:
        codes = codes_frame(spark, ex.in_yaml)
    else:
        golden = expected_pdf(ex.out_metadata_yaml, prefix="metadata/")
        codes = frame_from_pandas(
            spark, golden.drop(columns=["code/vocab_index"]).copy()
        )
    check_metadata(fit_vocabulary_indices(codes), ex)


@example_adapter("bin_numeric_values")
def _run_bin_numeric_values(spark, ex, default_in_yaml):
    """Bins derive from the metadata quantile structs, overridden by an
    optional custom-bins file (cfg ``custom_bins_filepath``, a pkg://
    URI resolved against the scenario dir)."""
    from meds_transforms_spark.operators.bin_numeric_values import bin_numeric_values

    in_yaml = _resolve_input(ex, default_in_yaml)
    cfg = effective_cfg(ex)
    rows = in_yaml.get(CODES_KEY) or []
    if isinstance(rows, str):
        # CSV-string codes (the other half of codes_frame's dual-format
        # contract): flat values/quantile/<q> columns → nested dict rows
        pdf = _parse_csv(rows)
        qcols = [c for c in pdf.columns if c.startswith("values/quantile/")]
        rows = [
            {
                "code": r.get("code"),
                "values/quantiles": {
                    c: r[c] for c in qcols if pd.notna(r.get(c))
                },
            }
            for r in pdf.to_dict("records")
        ]
    bins = {
        r["code"]: sorted(r["values/quantiles"].values())
        for r in rows
        if r.get("code") is not None and r.get("values/quantiles")
    }
    fp = cfg.get("custom_bins_filepath")
    if fp:
        custom = load_yaml(resolve_pkg_path(fp, (ex.example_dir,)))
        for code, eps in (custom or {}).items():
            bins[code] = sorted(float(v) for v in eps.values())
    bins.update(cfg.get("custom_bins") or {})
    out = bin_numeric_values(
        data_frame(spark, in_yaml),
        custom_bins=bins,
        code_with_bin_name=cfg["code_with_bin_name"],
        drop_numeric_value=cfg.get("do_drop_numeric_value", False),
    )
    check_data(out, expected_pdf(ex.out_data_yaml))


@example_adapter("reorder_measurements")
def _run_reorder_measurements(spark, ex, default_in_yaml):
    """Row ORDER is the stage's whole point: compare per-subject ordered
    code sequences, not the row multiset."""
    from meds_transforms_spark.operators.reorder_measurements import (
        reorder_measurements,
    )

    in_yaml = _resolve_input(ex, default_in_yaml)
    cfg = effective_cfg(ex)
    out = reorder_measurements(
        data_frame(spark, in_yaml),
        ordered_code_patterns=cfg["ordered_code_patterns"],
    )
    got = out.toPandas()
    exp = expected_pdf(ex.out_data_yaml)
    got_seq = {s: list(g["code"]) for s, g in got.groupby("subject_id", sort=True)}
    exp_seq = {s: list(g["code"]) for s, g in exp.groupby("subject_id", sort=True)}
    assert got_seq == exp_seq, f"{ex.full_name}: order mismatch"


@example_adapter("reshard_to_split")
def _run_reshard_to_split(spark, ex, default_in_yaml):
    """Shard FILES are a reference-ism; the Spark equivalent is the
    split partition column. Per split, the row multiset must match the
    union of that split's golden shards."""
    from meds_transforms_spark.operators.reshard_to_split import reshard_to_split

    in_yaml = _resolve_input(ex, default_in_yaml)
    splits = load_fixture_frame(spark, in_yaml[SPLITS_KEY], use_meds_schema=False)
    out = reshard_to_split(data_frame(spark, in_yaml), subject_splits=splits)
    out_yaml = ex.out_data_yaml
    split_names = sorted(
        {k.split("/")[1] for k in out_yaml if k.startswith("data/") and k.count("/") >= 2}
    )
    assert split_names, f"{ex.full_name}: golden has no split shards"
    for split in split_names:
        exp = expected_pdf(out_yaml, prefix=f"data/{split}/")
        got = out.filter(out["split"] == split).drop("split")
        check_data(got, exp)
