"""domain_mix unit tests — exact quota semantics + prefix-sum plan."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")


def _python_reference(rows, weights, budget, default_weight, order):
    """Pure-python mix: per source, hash-order prefix while cumsum <= quota."""
    kept = set()
    by_src = {}
    for doc_id, src, ntok in rows:
        by_src.setdefault(src, []).append((doc_id, ntok))
    for src, docs in by_src.items():
        quota = round(weights.get(src, default_weight) * budget)
        docs = sorted(docs, key=lambda d: order[d[0]])
        c = 0
        for doc_id, ntok in docs:
            c += ntok or 0
            if c <= quota:
                kept.add(doc_id)
            else:
                break
    return kept


def test_domain_mix_matches_python_reference(spark):
    from meds_transforms_spark.operators.dedup import _h64
    from meds_transforms_spark.operators.sampling import domain_mix

    rows = [(i, f"s{i % 3}", 10 + (i * 7) % 50) for i in range(60)]
    df = _docs(spark, rows)
    # recover the engine's hash order so the reference sorts identically
    order = {
        r.doc_id: r.h
        for r in df.select(
            "doc_id", _h64("xxhash64", F.lit("0"), F.col("doc_id")).alias("h")
        ).collect()
    }
    weights = {"s0": 0.5, "s1": 0.25}
    out = domain_mix(
        df, weights, token_budget=400, token_col="n_tokens", default_weight=0.1
    )
    got = {r.doc_id for r in out.collect()}
    assert got == _python_reference(rows, weights, 400, 0.1, order)
    assert out.columns == df.columns  # helpers dropped


def test_domain_mix_zero_weight_sources_pruned(spark):
    from meds_transforms_spark.operators.sampling import domain_mix

    df = _docs(spark, [(1, "a", 5), (2, "b", 5)])
    out = domain_mix(df, {"a": 1.0}, token_budget=100, token_col="n_tokens")
    assert {r.doc_id for r in out.collect()} == {1}


def test_domain_mix_partition_invariant(spark):
    from meds_transforms_spark.operators.sampling import domain_mix

    rows = [(i, "only", 10) for i in range(100)]
    df = _docs(spark, rows)
    kept1 = {r.doc_id for r in domain_mix(df.repartition(1), {"only": 1.0}, 250, token_col="n_tokens").collect()}
    kept17 = {r.doc_id for r in domain_mix(df.repartition(17), {"only": 1.0}, 250, token_col="n_tokens").collect()}
    kept_b3 = {
        r.doc_id
        for r in domain_mix(
            df, {"only": 1.0}, 250, token_col="n_tokens", num_buckets=3
        ).collect()
    }
    assert kept1 == kept17 == kept_b3
    assert len(kept1) == 25  # 250 tokens / 10 per doc


def test_domain_mix_text_token_counting_and_nulls(spark):
    from meds_transforms_spark.operators.sampling import domain_mix

    df = spark.createDataFrame(
        [(1, "a", "one two three"), (2, "a", None), (3, "a", "  four   five  ")],
        "doc_id long, source string, text string",
    )
    # budget 5 tokens: doc counts are 3, 0 (null), 2 — all fit exactly
    out = domain_mix(df, {"a": 1.0}, token_budget=5)
    assert {r.doc_id for r in out.collect()} == {1, 2, 3}
    # budget 4: whichever docs the hash order admits, total tokens <= 4
    out4 = domain_mix(df, {"a": 1.0}, token_budget=4).collect()
    tok = {1: 3, 2: 0, 3: 2}
    assert sum(tok[r.doc_id] for r in out4) <= 4


def test_domain_mix_md5_mode_runs(spark):
    from meds_transforms_spark.operators.sampling import domain_mix

    df = _docs(spark, [(i, "a", 10) for i in range(20)])
    out = domain_mix(
        df, {"a": 1.0}, token_budget=55, token_col="n_tokens", hash_fn="md5_60"
    )
    assert out.count() == 5
