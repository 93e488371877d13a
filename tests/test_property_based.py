"""Property-based tests (hypothesis) — randomized oracle checks the
reference's test suite lacks (SURVEY §5: 'no property-based tests')."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st


@st.composite
def grouped_values(draw):
    n_groups = draw(st.integers(1, 3))
    out = []
    for g in range(n_groups):
        vals = draw(
            st.lists(
                st.floats(-1e4, 1e4, allow_nan=False, allow_infinity=False),
                min_size=1,
                max_size=40,
            )
        )
        out.append((f"G{g}", vals))
    return out


@settings(max_examples=12, deadline=None)
@given(groups=grouped_values(), q=st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9]))
def test_distributed_quantiles_match_numpy_nearest_rank(spark, groups, q):
    from meds_transforms_spark.operators.quantiles import grouped_exact_quantiles
    from meds_transforms_spark.schema import MEDS_DATA_SCHEMA

    rows = [
        (0, None, code, float(np.float32(v)), None)  # float32 round-trip like MEDS
        for code, vals in groups
        for v in vals
    ]
    df = spark.createDataFrame(rows, MEDS_DATA_SCHEMA)
    got = {
        r["code"]: r[f"q{q}"] for r in grouped_exact_quantiles(df, [q]).collect()
    }
    for code, vals in groups:
        arr = np.sort(np.array(vals, dtype=np.float32))
        # nearest-rank: index round(q*(n-1)), round-half-up like F.round
        idx = int(math.floor(q * (len(arr) - 1) + 0.5))
        assert got[code] == pytest.approx(float(arr[idx]), rel=1e-6), (
            code,
            arr.tolist(),
        )


@settings(max_examples=10, deadline=None)
@given(
    values=st.lists(
        st.floats(-1e3, 1e3, allow_nan=False, allow_infinity=False),
        min_size=2,
        max_size=50,
    ),
    cutoff=st.sampled_from([0.5, 1.0, 2.0]),
)
def test_occlude_outliers_matches_numpy(spark, values, cutoff):
    from meds_transforms_spark.operators.aggregate_code_metadata import (
        aggregate_code_metadata,
    )
    from meds_transforms_spark.operators.occlude_outliers import occlude_outliers
    from meds_transforms_spark.schema import MEDS_DATA_SCHEMA

    rows = [(i, None, "X", float(v), None) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, MEDS_DATA_SCHEMA)
    meta = aggregate_code_metadata(
        df, aggregations=["values/n_occurrences", "values/sum", "values/sum_sqd"]
    )
    out = occlude_outliers(df, meta, stddev_cutoff=cutoff)
    got = {r.subject_id: r["numeric_value/is_inlier"] for r in out.collect()}

    arr = np.array(values, dtype=np.float32).astype(np.float64)
    mean = arr.sum() / len(arr)
    var = max((arr * arr).sum() / len(arr) - mean * mean, 0.0)
    std = math.sqrt(var)
    for i, v in enumerate(arr):
        expected = bool(abs(v - mean) <= cutoff * std)
        # float32 storage + association order can flip exact-boundary
        # cases; only assert when comfortably away from the boundary.
        margin = abs(abs(v - mean) - cutoff * std)
        if margin > 1e-3 * max(std, 1.0):
            assert got[i] == expected, (i, v, mean, std)


@settings(max_examples=15, deadline=None)
@given(
    text=st.text(
        alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs")),
        max_size=200,
    )
)
def test_token_count_matches_python_split(spark, text):
    from meds_transforms_spark.operators.text import token_count

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = token_count(df).collect()[0].n_tokens
    # Java/RE2 \s is ASCII-only (unlike Python's Unicode-aware split) —
    # the operator's contract is ASCII whitespace, matching the DuckDB
    # oracle. Model that explicitly here.
    import re

    expected = len([t for t in re.split(r"\s+", text, flags=re.ASCII) if t])
    assert got == expected
