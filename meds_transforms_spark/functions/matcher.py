"""Matcher DSL → Spark Column predicate.

Semantics re-expressed from the reference's config-driven matcher
(src/MEDS_transforms/parser.py:85-147 ``matcher_to_expr``; validation
:36-82). A matcher is a dict mapping column name → criterion; all terms
are conjoined (AND). Criteria:

- scalar value          → equality (``col == lit(v)``)
- ``{"regex": r}``      → regex containment (``rlike`` — unanchored, like
  Polars ``str.contains``)
- ``{"present": bool}`` → is-null / is-not-null check
- ``{"any": [v, ...]}`` → membership (isin)

Everything compiles to JVM-side Catalyst expressions — no Python UDFs —
so matchers stay inside whole-stage codegen and push down to parquet
scans where possible.

>>> from meds_transforms_spark.functions.matcher import matcher_to_expr
>>> expr, cols = matcher_to_expr({"code": {"regex": "^LAB//.*"}, "time": {"present": True}})
>>> sorted(cols)
['code', 'time']
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

STR_VALUE_KEYS = frozenset({"regex", "present", "any"})


def is_matcher(cfg: Any) -> bool:
    """True if ``cfg`` is a structurally valid matcher config."""
    if not isinstance(cfg, dict) or not cfg:
        return False
    for v in cfg.values():
        if isinstance(v, dict):
            if not set(v.keys()) <= STR_VALUE_KEYS:
                return False
            if "regex" in v and not isinstance(v["regex"], str):
                return False
            if "present" in v and not isinstance(v["present"], bool):
                return False
            if "any" in v and not isinstance(v["any"], (list, tuple)):
                return False
    return True


def _term_to_expr(col: str, criterion: Any) -> Column:
    c = F.col(col)
    if isinstance(criterion, dict):
        terms = []
        if "regex" in criterion:
            terms.append(c.rlike(criterion["regex"]))
        if "present" in criterion:
            terms.append(c.isNotNull() if criterion["present"] else c.isNull())
        if "any" in criterion:
            terms.append(c.isin(list(criterion["any"])))
        if not terms:
            raise ValueError(f"Empty matcher criterion for column {col!r}")
        out = terms[0]
        for t in terms[1:]:
            out = out & t
        return out
    if criterion is None:
        return c.isNull()
    return c == F.lit(criterion)


def matcher_to_expr(cfg: dict) -> tuple[Column, set[str]]:
    """Compile a matcher config into a single AND-ed Column predicate.

    Returns ``(predicate, referenced_columns)`` — the column set lets
    callers validate availability before execution, mirroring the
    reference's two-value return.
    """
    if not is_matcher(cfg):
        raise ValueError(f"Invalid matcher configuration: {cfg!r}")
    exprs = [_term_to_expr(col, crit) for col, crit in cfg.items()]
    out = exprs[0]
    for e in exprs[1:]:
        out = out & e
    return out, set(cfg.keys())
