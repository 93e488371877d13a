"""The oracle-gate replica's compare() must REPORT defects, never die
on them — a crash mid-sweep masks every query after it."""

from __future__ import annotations

import importlib.util
import os

import numpy as np
import pandas as pd

_SPEC = importlib.util.spec_from_file_location(
    "check_oracles",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "check_oracles.py"),
)
co = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(co)


def test_nullable_int_null_pattern_reports_fail_not_crash():
    """Regression: NA == value yields pd.NA and np.asarray(bool) raised
    ValueError, killing the whole gate on the exact defect class it
    exists to report."""
    s = pd.DataFrame({"x": pd.array([1, None, 3], dtype="Int64")})
    o = pd.DataFrame({"x": pd.array([1, 2, 3], dtype="Int64")})
    problems = co.compare("t", s, o)
    assert problems and "mismatch" in problems[0]


def test_nan_vs_value_mismatch_is_diagnosed():
    """Regression: NaN-vs-value diffs vanished from nanmax, printing
    'max abs diff 0.0' for a real mismatch."""
    s = pd.DataFrame({"y": [1.0, np.nan, 3.0]})
    o = pd.DataFrame({"y": [1.0, 2.0, 3.0]})
    problems = co.compare("t", s, o)
    assert problems and "NaN-pattern" in problems[0]


def test_identical_frames_pass():
    df = pd.DataFrame({"x": pd.array([1, None], dtype="Int64"), "y": [0.5, np.nan]})
    assert co.compare("t", df.copy(), df.copy()) == []
