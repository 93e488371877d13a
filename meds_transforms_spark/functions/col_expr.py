"""Column-expression DSL → Spark Column.

Re-expresses the reference's structured column expression language
(src/MEDS_transforms/parser.py:153-355 ``ColExprType.to_pl_expr``,
:358-469 ``parse_col_expr``, :472-567 coalescing / conditional forms).

Expression forms:

- ``"colname"`` (bare string that names a column) → column reference
- ``{"col": name}`` → explicit column reference
- ``{"literal": v}`` → literal
- ``{"str": "ADM//{col_a}//{col_b}"}`` → f-string interpolation over
  columns (null if any interpolated column is null, matching
  ``pl.format`` semantics)
- ``{"extract": {"from": col, "regex": r, "group": i}}`` → regex capture
- ``[expr, expr, ...]`` → coalesce over sub-expressions
- ``{"matcher": m, "then": expr}`` (inside a list) → conditional branch

All forms compile to built-in Catalyst expressions (``F.col``,
``F.lit``, ``F.concat`` with null propagation, ``F.regexp_extract``,
``F.coalesce``, ``F.when``) — JVM-side, codegen-friendly.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from meds_transforms_spark.functions.matcher import is_matcher, matcher_to_expr

_FSTRING_FIELD = re.compile(r"\{([^{}]+)\}")


def _interp_str(template: str) -> tuple[Column, set[str]]:
    """Interpolate ``{col}`` fields; whole result null if any field null.

    Matches Polars ``pl.format`` (parser.py:351-353): output is null when
    any referenced column is null. ``F.concat`` already propagates null —
    exactly the semantics needed.
    """
    parts: list[Column] = []
    cols: set[str] = set()
    pos = 0
    for m in _FSTRING_FIELD.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        name = m.group(1)
        cols.add(name)
        parts.append(F.col(name).cast("string"))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit(""), cols
    return F.concat(*parts), cols


def parse_col_expr(cfg: Any) -> tuple[Column, set[str]]:
    """Compile a column-expression config to ``(Column, referenced_cols)``."""
    # Coalescing list form (parser.py:472-567): first non-null wins;
    # conditional entries become when(matcher, expr).
    if isinstance(cfg, (list, tuple)):
        branches: list[Column] = []
        cols: set[str] = set()
        for item in cfg:
            if isinstance(item, dict) and "matcher" in item and "then" in item:
                pred, pcols = matcher_to_expr(item["matcher"])
                val, vcols = parse_col_expr(item["then"])
                branches.append(F.when(pred, val))
                cols |= pcols | vcols
            else:
                e, c = parse_col_expr(item)
                branches.append(e)
                cols |= c
        return F.coalesce(*branches), cols

    if isinstance(cfg, str):
        # Bare string: a column name, unless it contains {field} refs →
        # treat as an interpolation template (parser.py:358-400).
        if _FSTRING_FIELD.search(cfg):
            return _interp_str(cfg)
        return F.col(cfg), {cfg}

    if isinstance(cfg, dict):
        if "col" in cfg:
            name = cfg["col"]
            return F.col(name), {name}
        if "str" in cfg:
            return _interp_str(cfg["str"])
        if "literal" in cfg:
            return F.lit(cfg["literal"]), set()
        if "extract" in cfg:
            spec = cfg["extract"]
            src, scols = parse_col_expr(spec.get("from", spec.get("col")))
            group = int(spec.get("group", 1))
            extracted = F.regexp_extract(src, spec["regex"], group)
            # regexp_extract returns "" on no-match; the reference's
            # str.extract returns null — normalize to null.
            return F.when(extracted != "", extracted), scols
        if is_matcher(cfg):
            # A matcher used as a boolean-valued expression.
            return matcher_to_expr(cfg)
        raise ValueError(f"Unrecognized column expression: {cfg!r}")

    # Any other scalar → literal.
    return F.lit(cfg), set()
