"""Match-Revise meta-operator — conditional per-partition stage dispatch.

Reference semantics (src/MEDS_transforms/compute_modes/match_revise.py:
28-48, 117-320): given an ordered list of (matcher, config) pairs, run
the *same* stage over each matched slice with per-slice config, then
recombine. Two modes:

- ``match_and_revise`` (first-match consumes): slice i sees rows matching
  matcher i AND no earlier matcher; residual rows (matching nothing) pass
  through untouched.
- ``multi_match_and_revise``: every matcher sees the full input's
  matching rows (a row can enter several slices); residual = rows
  matching no matcher.

Spark plan: pure DataFrame composition — one ``filter`` per branch over
the same scan, each branch transformed, recombined with ``unionByName``.
Catalyst shares the scan across branches; no shuffle is introduced by
the meta-operator itself. The recombine is followed by the canonical
(subject, time, __order) sort only at materialization boundaries.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.functions.matcher import matcher_to_expr
from meds_transforms_spark.operators.base import register_stage


def match_revise(
    df: DataFrame,
    stage_fn: Callable[..., DataFrame],
    revisions: Sequence[dict],
    mode: str = "match_and_revise",
) -> DataFrame:
    """Apply ``stage_fn`` per matched slice and recombine.

    ``revisions``: list of dicts each holding ``_matcher`` (matcher DSL
    config) plus the per-slice stage kwargs.
    """
    if mode not in ("match_and_revise", "multi_match_and_revise"):
        raise ValueError(f"Unknown match-revise mode {mode!r}")

    preds = []
    branches: list[DataFrame] = []
    for rev in revisions:
        cfg = dict(rev)
        matcher_cfg = cfg.pop("_matcher")
        pred, _ = matcher_to_expr(matcher_cfg)
        if mode == "match_and_revise":
            # First-match-consumes: exclude rows claimed by earlier matchers.
            eff = pred
            for earlier in preds:
                eff = eff & ~earlier
        else:
            eff = pred
        preds.append(pred)
        branches.append(stage_fn(df.filter(eff), **cfg))

    residual_pred = F.lit(True)
    for p in preds:
        residual_pred = residual_pred & ~p
    residual = df.filter(residual_pred)

    out = residual
    for b in branches:
        out = out.unionByName(b, allowMissingColumns=True)
    return out


@register_stage("match_revise")
def match_revise_stage(df: DataFrame, stage: str, revisions: Sequence[dict], mode: str = "match_and_revise", **common_cfg) -> DataFrame:
    """Registry-dispatched form: look up ``stage`` by name and match-revise it."""
    from meds_transforms_spark.operators.base import get_stage

    st = get_stage(stage)
    fn = lambda d, **cfg: st(d, **{**common_cfg, **cfg})  # noqa: E731
    return match_revise(df, fn, revisions, mode=mode)
