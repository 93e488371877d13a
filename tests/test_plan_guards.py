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
