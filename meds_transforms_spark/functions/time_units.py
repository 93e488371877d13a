"""Time-unit normalization constants.

Mirrors the reference's unit table
(src/MEDS_transforms/stages/add_time_derived_measurements/utils.py:10-74):
month = 30.436875 days, year = 365.2422 days (tropical year).
"""

from __future__ import annotations

SECONDS_PER: dict[str, float] = {
    "us": 1e-6,
    "microsecond": 1e-6,
    "microseconds": 1e-6,
    "ms": 1e-3,
    "millisecond": 1e-3,
    "milliseconds": 1e-3,
    "s": 1.0,
    "sec": 1.0,
    "second": 1.0,
    "seconds": 1.0,
    "m": 60.0,
    "min": 60.0,
    "minute": 60.0,
    "minutes": 60.0,
    "h": 3600.0,
    "hr": 3600.0,
    "hour": 3600.0,
    "hours": 3600.0,
    "d": 86400.0,
    "day": 86400.0,
    "days": 86400.0,
    "w": 7 * 86400.0,
    "week": 7 * 86400.0,
    "weeks": 7 * 86400.0,
    "mo": 30.436875 * 86400.0,
    "month": 30.436875 * 86400.0,
    "months": 30.436875 * 86400.0,
    "y": 365.2422 * 86400.0,
    "yr": 365.2422 * 86400.0,
    "year": 365.2422 * 86400.0,
    "years": 365.2422 * 86400.0,
}


_CANONICAL: dict[float, str] = {
    1e-6: "microseconds",
    1e-3: "milliseconds",
    1.0: "seconds",
    60.0: "minutes",
    3600.0: "hours",
    86400.0: "days",
    7 * 86400.0: "weeks",
    30.436875 * 86400.0: "months",
    365.2422 * 86400.0: "years",
}


def normalize_time_unit(unit: str) -> float:
    """Seconds per one ``unit``; raises on unknown units."""
    try:
        return SECONDS_PER[unit]
    except KeyError:
        raise ValueError(
            f"Unknown time unit {unit!r}; expected one of {sorted(SECONDS_PER)}"
        ) from None


def canonical_time_unit(unit: str) -> str:
    """Canonical plural name for ``unit`` ("y" → "years"), matching the
    reference's normalize_time_unit first tuple element (utils.py:21-74)."""
    return _CANONICAL[normalize_time_unit(unit)]
