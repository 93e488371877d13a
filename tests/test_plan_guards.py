"""Plan-shape guards: no unplanned nested-loop joins in headline queries.

A CartesianProduct anywhere, or a BroadcastNestedLoopJoin outside the
explicit allowlist, means Catalyst fell off the hash-join path — the
exact failure mode that is invisible at sf0.001 and fatal at 100 TB.

Allowlisted BNLJ sites (verified intentional; all have a tiny broadcast
side, which is the optimal physical plan for them):
- emb_topk_cosine: the query-vector side (~dozens of rows) is broadcast
  against the corpus — map-side scoring by design (similarity.py).
- tpch_q11 / tpch_q22: single-row scalar aggregates crossed into the
  main table — Spark's standard execution of scalar-subquery HAVING.
A full-inventory sweep (all 69 driver queries) found BNLJ only in these
plus docs_semantic_search / emb_ivf_topk (same broadcast-query-side
pattern); none show CartesianProduct.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

#: headline queries whose plans build without executing driver-side jobs
GUARDED = [
    "meds_agg_code_metadata",
    "meds_filter_subjects",
    "meds_normalization",
    "meds_timeline_deltas",
    "meds_pipeline_e2e",
    "tpch_q1",
    "tpch_q2",
    "tpch_q3",
    "tpch_q5",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q11",
    "tpch_q18",
    "tpch_q21",
    "tpch_q22",
    "events_hourly",
    "events_asof",
    "events_interval_join",
    "events_sessions",
    "events_funnel",
    "docs_token_stats",
    "docs_repetition",
    "docs_pii_scrub",
    "docs_boilerplate",
    "docs_exact_dedup",
    "docs_substring_dedup",
    "docs_domain_mix",
    "docs_incremental_dedup",
    "docs_quality_classifier",
    "events_retention",
    "docs_decontaminate",
    "docs_minhash_dedup",
    "emb_topk_cosine",
    "docs_unigram_logprob",
    "emb_covariance",
    "docs_winnow_overlap",
    "docs_winnow_contains",
    "docs_bigram_ppl",
    "docs_ccnet_buckets",
    "docs_shuffle_shards",
    # round-6 additions
    "emb_semantic_dedup_arrow",
    "events_anomaly_bucketed",
    "meds_agg_quantiles_approx",
    "docs_ccnet_e2e",
]

# docs_unigram_logprob / emb_covariance: scalar totals (1-row aggs)
# cross-joined in as broadcasts — the lazy alternative to a driver
# round-trip; build side is literally one row.
BNLJ_OK = {
    "emb_topk_cosine",
    "tpch_q11",
    "tpch_q22",
    "docs_unigram_logprob",
    "emb_covariance",
    # bigram LM rides its 1-row (N, V) scalar totals in as a broadcast
    # cross join, same shape as unigram
    "docs_bigram_ppl",
    "docs_ccnet_buckets",
}


@pytest.mark.parametrize("name", GUARDED)
def test_no_unplanned_nested_loops(spark, name):
    import __spark_entry__ as E

    df = E.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_filter_subjects_distinct_count_is_not_collect_set(spark):
    """Skew guard: the distinct-event count must use the streaming
    dense_rank form, never a windowed collect_set. WindowExec evaluates
    an aggregate's OUTPUT per row, and collect_set's eval copies the
    accumulated set into a fresh array each time — O(n^2) element
    copies in the hot subject's single task. Measured
    (scripts/measure_filter_subjects_skew.py): 0.17s with no hot
    subject -> 29s at one subject with 100k events -> >1h/run at 1M,
    vs flat 0.2-2s for dense_rank across 0..5M. One exchange either
    way; also assert no join crept in (the groupBy+semi-join fallback
    costs two more shuffles and is not the default)."""
    from meds_transforms_spark.operators.filter_subjects import filter_subjects
    from meds_transforms_spark.sources.testdata import events_as_meds

    df = filter_subjects(
        events_as_meds(spark, SF_DIR), min_events_per_subject=2,
        min_measurements_per_subject=2,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "collect_set" not in plan
    assert "dense_rank" in plan
    assert "Join" not in plan
    # one exchange total: both window frames and the rank share the
    # subject_id partitioning
    assert plan.count("Exchange") <= 1, plan
