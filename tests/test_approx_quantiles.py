"""grouped_approx_quantiles: rank-error-bound contract.

The sketch path has no DuckDB oracle (compression decisions are
engine-internal), so its correctness gate is this property: every
returned quantile is an ACTUAL group value whose rank is within the
Greenwald-Khanna guarantee (n/accuracy) of the target rank.
"""

import pytest

from meds_transforms_spark.operators.quantiles import (
    grouped_approx_quantiles,
    grouped_exact_quantiles,
)
from meds_transforms_spark.sources.testdata import events_as_meds

QS = [0.1, 0.25, 0.5, 0.75, 0.9]


def _rank_bounds(values, x):
    """(min_rank, max_rank) of value x in the sorted list (1-based,
    ties span a range)."""
    lo = sum(1 for v in values if v < x) + 1
    hi = sum(1 for v in values if v <= x)
    return lo, hi


@pytest.mark.parametrize("accuracy", [50, 10_000])
def test_approx_quantiles_within_rank_error(spark, accuracy):
    meds = events_as_meds(spark, "/root/testdata/sf0.01")
    rows = meds.filter("numeric_value is not null").select(
        "code", "numeric_value"
    ).collect()
    by_code = {}
    for r in rows:
        by_code.setdefault(r.code, []).append(float(r.numeric_value))
    out = grouped_approx_quantiles(meds, QS, accuracy=accuracy).collect()
    assert {r.code for r in out} == set(by_code)
    for r in out:
        vals = sorted(by_code[r.code])
        n = len(vals)
        tol = max(1.0, n / accuracy)  # GK guarantee, >= 1 for ties/rounding
        for q in QS:
            x = float(r[f"q{q}"])
            assert x in by_code[r.code] or any(
                abs(v - x) < 1e-6 for v in vals
            ), f"q{q} of {r.code} is not a group value"
            lo, hi = _rank_bounds(vals, x)
            target = q * (n - 1) + 1
            err = 0.0 if lo <= target <= hi else min(abs(lo - target), abs(hi - target))
            assert err <= tol, (
                f"{r.code} q{q}: rank err {err} > {tol} (n={n}, accuracy={accuracy})"
            )


def test_approx_tracks_exact_at_high_accuracy(spark):
    """With accuracy far above group size the sketch keeps everything —
    each quantile lands within one rank of the exact nearest-rank
    value (definitional half-rank offsets allowed, nothing more)."""
    meds = events_as_meds(spark, "/root/testdata/sf0.01")
    e = {r.code: r for r in grouped_exact_quantiles(meds, QS).collect()}
    a = {r.code: r for r in grouped_approx_quantiles(meds, QS, accuracy=1_000_000).collect()}
    rows = meds.filter("numeric_value is not null").select("code", "numeric_value").collect()
    by_code = {}
    for r in rows:
        by_code.setdefault(r.code, []).append(float(r.numeric_value))
    for code, er in e.items():
        vals = sorted(by_code[code])
        for q in QS:
            ei = vals.index(float(er[f"q{q}"]))
            ai = vals.index(float(a[code][f"q{q}"]))
            assert abs(ei - ai) <= 1, f"{code} q{q}: exact idx {ei} vs approx {ai}"


def test_quantile_stages_registered(spark):
    """Both grouped-quantile paths are YAML-pipeline stages: resolvable
    by name, metadata-kind, and runnable through the registry fn."""
    from meds_transforms_spark.operators.base import get_stage

    meds = events_as_meds(spark, "/root/testdata/sf0.001")
    for name in ("grouped_exact_quantiles", "grouped_approx_quantiles"):
        st = get_stage(name)
        assert st.is_metadata and st.kind == "mapreduce"
        out = st.fn(meds, quantiles=[0.5])
        assert out.columns == ["code", "q0.5"]
        assert out.count() > 0


def test_certificate_green_on_live_sketch(spark):
    """approx_quantiles_certificate: every (code, q) row certifies the
    live GK sketch within tolerance, and exact_value matches the
    grouped_exact_quantiles value."""
    from meds_transforms_spark.operators.quantiles import (
        approx_quantiles_certificate,
    )

    meds = events_as_meds(spark, "/root/testdata/sf0.01")
    out = approx_quantiles_certificate(meds, [0.25, 0.5, 0.75], accuracy=10_000)
    rows = out.collect()
    assert len(rows) == 3 * out.select("code").distinct().count()
    assert all(r.within_tol for r in rows)
    e = {r.code: r for r in grouped_exact_quantiles(meds, [0.25, 0.5, 0.75]).collect()}
    for r in rows:
        assert float(r.exact_value) == float(e[r.code][f"q{r.q}"])


def test_certificate_flags_out_of_bound_candidates(spark):
    """The certificate must be able to FAIL: candidate 'quantiles' far
    from the true rank (group max for q=0.25) flip within_tol to
    False — proving the driver check is a real gate, not a tautology."""
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.quantiles import (
        approx_quantiles_certificate,
    )

    meds = events_as_meds(spark, "/root/testdata/sf0.001")
    bad = meds.filter("numeric_value is not null").groupBy("code").agg(
        F.max("numeric_value").alias("q0.25")
    )
    out = approx_quantiles_certificate(
        meds, [0.25], accuracy=10_000, candidates=bad
    ).collect()
    assert out and all(not r.within_tol for r in out)
