"""funnel_steps — ordered event-sequence matching."""

from __future__ import annotations

import datetime as dt

import pytest


def ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture()
def events(spark):
    rows = [
        # user 1: full funnel in order
        (1, ts(0), "view"), (1, ts(5), "click"), (1, ts(9), "purchase"),
        # user 2: click BEFORE the first view — step 2 must use the later click
        (2, ts(0), "click"), (2, ts(2), "view"), (2, ts(7), "click"),
        # user 3: stalls after view (purchase without click doesn't count)
        (3, ts(1), "view"), (3, ts(4), "purchase"),
        # user 4: never enters the funnel
        (4, ts(3), "error"),
        # user 5: same-timestamp events — strict ordering, click at view's
        # instant does NOT complete step 2
        (5, ts(2), "view"), (5, ts(2), "click"),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


@pytest.mark.parametrize("strategy", ["agg_join", "window"])
def test_funnel_stages_and_greedy_earliest_match(events, strategy):
    from meds_transforms_spark.operators.funnel import funnel_steps

    out = {
        r.user_id: r
        for r in funnel_steps(
            events, ["view", "click", "purchase"], strategy=strategy
        ).collect()
    }
    assert out[1].funnel_stage == 3
    assert (out[1].step_1, out[1].step_2, out[1].step_3) == (ts(0), ts(5), ts(9))
    # user 2: pre-view click ignored; funnel reaches stage 2 via ts(7)
    assert out[2].funnel_stage == 2 and out[2].step_2 == ts(7)
    assert out[2].step_3 is None
    assert out[3].funnel_stage == 1 and out[3].step_2 is None
    assert out[4].funnel_stage == 0 and out[4].step_1 is None
    assert out[5].funnel_stage == 1  # strict '>' at equal timestamps


def test_funnel_within_horizon(events):
    from meds_transforms_spark.operators.funnel import funnel_steps

    # 6-minute horizon from step 1: user 1's purchase at +9min now stalls,
    # click at +5 still lands.
    for strategy in ("agg_join", "window"):
        out = {
            r.user_id: r
            for r in funnel_steps(
                events, ["view", "click", "purchase"], within=360, strategy=strategy
            ).collect()
        }
        assert out[1].funnel_stage == 2
        # user 2's second click is +5min after its view at ts(2) — inside.
        assert out[2].funnel_stage == 2


def test_funnel_plan_shapes(events):
    from meds_transforms_spark.operators.funnel import funnel_steps

    # window strategy: the three dependent step windows + final groupBy
    # all ride ONE hash exchange on the entity key.
    plan = (
        funnel_steps(events, ["view", "click", "purchase"], strategy="window")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1

    # agg_join strategy: the per-entity step table joins back as a
    # BROADCAST (no full-data shuffle join), no window/sort of events.
    plan = (
        funnel_steps(events, ["view", "click", "purchase"], strategy="agg_join")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan

    with pytest.raises(ValueError, match="non-empty"):
        funnel_steps(events, [])
    with pytest.raises(ValueError, match="strategy"):
        funnel_steps(events, ["view"], strategy="nope")
