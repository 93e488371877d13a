"""Public plan-shape guard: fail fast on plans that won't scale.

``assert_scalable(df)`` inspects the physical plan Catalyst actually
chose and raises before a single task runs if it contains a shape that
is invisible at test scale and fatal at 100 TB:

- ``CartesianProduct`` — the all-pairs join nobody ordered;
- ``BroadcastNestedLoopJoin`` — fine when one side is provably tiny
  (a scalar aggregate, a broadcast query set), catastrophic when
  Catalyst fell off the hash-join path because a join condition wasn't
  an equality; opt in per call when intentional;
- a ``Window`` with no partition spec — every row through ONE reducer
  (Spark itself only warns, at runtime, from the executor);
- ``SortMergeJoin``/``ShuffledHashJoin`` when the caller asserts a join
  should have broadcast (``require_broadcast_joins=True``).

This is the library form of the repo's own CI guard
(tests/test_plan_guards.py) — pipelines embedding this engine can put
``assert_scalable`` next to their query definitions and catch plan
regressions (a lost broadcast hint, a join key type mismatch that
silently turns equi-join into BNLJ) in CI rather than in a 3 a.m.
cluster stall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class UnscalablePlanError(AssertionError):
    """The physical plan contains a shape that will not survive scale."""


def plan_string(df: DataFrame) -> str:
    """The executed (physical) plan as text, without running a job."""
    return df._jdf.queryExecution().executedPlan().toString()


def assert_scalable(
    df: DataFrame,
    allow_nested_loop: bool = False,
    allow_global_window: bool = False,
    require_broadcast_joins: bool = False,
    name: str = "query",
) -> DataFrame:
    """Validate ``df``'s physical plan; returns ``df`` for chaining.

    Raises :class:`UnscalablePlanError` naming the offending operator
    and the guard to relax if the shape is intentional (each relaxation
    documents WHY it is safe at the call site — the allowlist pattern
    tests/test_plan_guards.py uses).
    """
    plan = plan_string(df)
    problems = []
    if "CartesianProduct" in plan:
        problems.append(
            "CartesianProduct: an all-pairs join — at N rows this is N² "
            "work; no relaxation flag exists because it is never right "
            "at scale (restructure the join or pre-bucket candidates)"
        )
    if not allow_nested_loop and "BroadcastNestedLoopJoin" in plan:
        problems.append(
            "BroadcastNestedLoopJoin: Catalyst fell off the hash-join "
            "path (non-equi or type-mismatched join condition?); pass "
            "allow_nested_loop=True only if the broadcast side is "
            "provably tiny (scalar aggregate, bounded query set)"
        )
    if not allow_global_window and _has_global_window(plan):
        problems.append(
            "Window with no PARTITION BY: every row flows through one "
            "reducer; repartition-and-merge (two-phase prefix, see "
            "operators/packing.py) or pass allow_global_window=True for "
            "provably-bounded frames"
        )
    if require_broadcast_joins and (
        "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    ):
        problems.append(
            "shuffle join where a broadcast was required: the dimension "
            "side exceeded spark.sql.autoBroadcastJoinThreshold or lost "
            "its hint (checkpointing resets size estimates — see "
            "functions/iterative.py)"
        )
    if problems:
        raise UnscalablePlanError(
            f"{name}: unscalable plan shape(s):\n- " + "\n- ".join(problems)
        )
    return df


def _has_global_window(plan: str) -> bool:
    # WindowExec prints top-level bracket groups "[exprs], [partition],
    # [order]" — but partition and order are each OMITTED when empty
    # (verified on Spark 4.1). So: 3 groups = partitioned+ordered;
    # 2 groups = partitioned-unordered (second group is plain columns)
    # OR global-ordered (second group is an order spec with ASC/DESC);
    # 1 group = fully global.
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: *")
        # WindowInPandas too: a GLOBAL pandas-UDF window is the same
        # one-reducer funnel, plus Arrow serialization on the one task.
        # (WindowGroupLimit stays excluded — neither prefix matches.)
        if s.startswith("Window ") or s.startswith("WindowInPandas "):
            groups = _bracket_groups(s)
            if len(groups) <= 1:
                return True
            if len(groups) == 2 and (" ASC" in groups[1] or " DESC" in groups[1]):
                return True
    return False


def _bracket_groups(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        if ch == "]":
            depth -= 1
            if depth == 0:
                out.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return out
