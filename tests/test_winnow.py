"""Tests for winnowing fingerprints (operators/winnow)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_substring_guarantee(spark):
    """Winnowing's core property: documents sharing a substring of
    length >= w + k - 1 share at least one fingerprint."""
    from meds_transforms_spark.operators.winnow import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"  # 43 chars
    docs = _docs(
        spark,
        [
            (1, f"prefix one {shared} suffix alpha"),
            (2, f"totally different opening {shared} and closing words"),
            (3, "no overlap here at all just unrelated content entirely"),
        ],
    )
    fps = winnow_fingerprints(docs, k=5, w=4)
    sets = {
        r.doc_id: set(x.fp for x in fps.filter(F.col("doc_id") == r.doc_id).collect())
        for r in docs.select("doc_id").collect()
    }
    assert sets[1] & sets[2]  # guaranteed shared fingerprint
    # density: ~2/(w+1) of grams survive, far below 1 per gram
    n_grams = len(f"prefix one {shared} suffix alpha") - 4
    assert len(sets[1]) < n_grams


def test_pure_function_of_text(spark):
    from meds_transforms_spark.operators.winnow import winnow_fingerprints

    docs = _docs(spark, [(i, f"some repeated body text number {i % 3}") for i in range(30)])
    a = sorted((r.doc_id, r.fp) for r in winnow_fingerprints(docs, k=4, w=3).collect())
    b = sorted(
        (r.doc_id, r.fp)
        for r in winnow_fingerprints(docs.repartition(7), k=4, w=3).collect()
    )
    assert a == b
    # identical (mod whitespace/case) texts get identical fingerprint sets
    c = _docs(spark, [(1, "Hello   World  Foo"), (2, "hello world foo")])
    fps = winnow_fingerprints(c, k=4, w=3).collect()
    s1 = {r.fp for r in fps if r.doc_id == 1}
    s2 = {r.fp for r in fps if r.doc_id == 2}
    assert s1 == s2


def test_short_and_null_docs(spark):
    from meds_transforms_spark.operators.winnow import winnow_fingerprints

    docs = _docs(spark, [(1, "ab"), (2, None), (3, "abcdefg")])
    out = winnow_fingerprints(docs, k=5, w=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.fp)
    assert len(by_doc.get(1, [])) == 1  # shorter than k: one whole-text gram
    assert 2 not in by_doc              # null text: no rows
    assert len(by_doc[3]) == 1          # 3 grams < w: single min


def test_overlap_pairs_and_max_df(spark):
    from meds_transforms_spark.operators.winnow import winnow_overlap

    # 0 and 1 share a long passage; 2 is unrelated; 3..12 all carry the
    # same boilerplate header, which max_df suppresses.
    passage = "copied paragraph that is plenty long enough to fingerprint"
    boiler = "standard legal disclaimer header used everywhere"
    rows = [
        (0, f"{passage} plus doc zero extras"),
        (1, f"doc one intro {passage}"),
        (2, "completely independent text with nothing shared at all"),
    ] + [(3 + i, f"{boiler} unique tail {i}") for i in range(10)]
    out = winnow_overlap(
        _docs(spark, rows), k=5, w=4, min_shared=1, max_df=5
    ).collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    assert (0, 1) in pairs
    assert not any(a == 2 or b == 2 for a, b in pairs)
    # boilerplate-only pairs were suppressed by max_df (10 docs > 5)
    boiler_ids = set(range(3, 13))
    assert not any(a in boiler_ids and b in boiler_ids for a, b in pairs)


def test_plan_is_scalable(spark):
    from meds_transforms_spark.operators.winnow import winnow_overlap
    from meds_transforms_spark.plan_guard import assert_scalable

    docs = _docs(spark, [(i, f"text body {i}") for i in range(10)])
    assert_scalable(winnow_overlap(docs), name="winnow_overlap")


def test_contains_finds_planted_eval_passage(spark):
    from meds_transforms_spark.operators.winnow import winnow_contains

    passage = "this exact evaluation passage must be detected in training data"
    train = _docs(
        spark,
        [
            (0, f"training document zero embeds {passage} inside its body"),
            # no substring of length >= w+k-1 shared with any probe
            # (the first draft said "a training document", and the
            # passage ends "in training data" — the guarantee FIRED,
            # correctly, on the shared " training " run)
            (1, "an unrelated clean record about completely other topics"),
            (2, f"{passage} leading another contaminated training doc"),
        ],
    )
    evals = spark.createDataFrame(
        [(100, f"eval question: {passage}"), (101, "clean eval item nothing shared")],
        "eval_id long, prompt string",
    )
    # min_shared=2: at k=5 a single chance gram (e.g. "ation" inside
    # both "evaluation" and "contamination") is a legitimate 1-fp hit;
    # two shared fingerprints separates the planted passage cleanly
    out = winnow_contains(
        train, evals, k=5, w=4, min_shared=2,
        probe_text_col="prompt", probe_id_col="eval_id",
    ).collect()
    hits = {(r.doc_id, r.probe_id) for r in out}
    assert (0, 100) in hits and (2, 100) in hits
    assert not any(p == 101 for _, p in hits)
    assert not any(d == 1 for d, _ in hits)


def test_contains_probe_broadcast_plan(spark):
    from meds_transforms_spark.operators.winnow import winnow_contains
    from meds_transforms_spark.plan_guard import assert_scalable, plan_string

    train = _docs(spark, [(i, f"train text {i}") for i in range(10)])
    evals = _docs(spark, [(100, "probe text")])
    out = winnow_contains(train, evals)
    assert_scalable(out, name="winnow_contains")
    assert "BroadcastHashJoin" in plan_string(out)  # probe side broadcast


def test_winnow_overlap_packed_matches_unpacked(spark):
    """The packed 64-bit pair key must produce the identical pair set
    as the two-column aggregate."""
    from meds_transforms_spark.operators.winnow import winnow_overlap

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kw = dict(k=10, w=8, min_shared=2, max_df=100)
    packed = {
        (r.id_a, r.id_b, r.n_shared)
        for r in winnow_overlap(docs, packed_ids=True, **kw).collect()
    }
    unpacked = {
        (r.id_a, r.id_b, r.n_shared)
        for r in winnow_overlap(docs, packed_ids=False, **kw).collect()
    }
    assert packed == unpacked and packed


def test_winnow_overlap_packed_rejects_out_of_range_ids(spark):
    """Explicit packed_ids=True with ids >= 2^31 would silently merge
    different pairs under the packed key — the in-plan guard must
    raise instead."""
    import pytest

    from meds_transforms_spark.operators.winnow import winnow_overlap

    docs = spark.createDataFrame(
        [(1 << 32, "abcdefghij" * 8), ((1 << 32) + 1, "abcdefghij" * 8)],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="packed_ids"):
        winnow_overlap(docs, k=10, w=4, min_shared=1, packed_ids=True).collect()


def test_winnow_overlap_auto_handles_any_id_space(spark):
    """Default (auto) mode must WORK — not raise — for id spaces the
    packed key can't represent: 64-bit hash-derived longs, strings,
    and negative int32 ids (round-6 advisory)."""
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.winnow import winnow_overlap

    text = "abcdefghij" * 8
    big = spark.createDataFrame(
        [(1 << 32, text), ((1 << 40) + 7, text)], "doc_id long, text string"
    )
    got = winnow_overlap(big, k=10, w=4, min_shared=1).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(1 << 32, (1 << 40) + 7)}

    strs = spark.createDataFrame(
        [("sha:aa", text), ("sha:bb", text)], "doc_id string, text string"
    )
    got_s = winnow_overlap(strs, k=10, w=4, min_shared=1).collect()
    assert {(r.id_a, r.id_b) for r in got_s} == {("sha:aa", "sha:bb")}

    # Negative int ids: auto picks the masked-bijection packed path —
    # values must round-trip exactly and match the two-column aggregate.
    neg = spark.createDataFrame(
        [(-5, text), (-2, text), (3, text)], "doc_id int, text string"
    )
    kw = dict(k=10, w=4, min_shared=1)
    auto = {(r.id_a, r.id_b, r.n_shared) for r in winnow_overlap(neg, **kw).collect()}
    two = {
        (r.id_a, r.id_b, r.n_shared)
        for r in winnow_overlap(neg, packed_ids=False, **kw).collect()
    }
    assert auto == two
    assert {(a, b) for a, b, _ in auto} == {(-5, -2), (-5, 3), (-2, 3)}


def test_winnow_overlap_packed_true_rejects_string_ids(spark):
    import pytest

    from meds_transforms_spark.operators.winnow import winnow_overlap

    docs = spark.createDataFrame(
        [("a", "abcdefghij" * 8)], "doc_id string, text string"
    )
    with pytest.raises(ValueError, match="integer id column"):
        winnow_overlap(docs, packed_ids=True)


def test_winnow_fingerprints_wide_window_slice_path(spark):
    """w>16 falls back to the array_min(slice) form — same fingerprints
    as the least-chain on an overlapping-window comparison corpus."""
    from meds_transforms_spark.operators.winnow import winnow_fingerprints

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog " * 3)],
        "doc_id long, text string",
    )
    # identical windows computed through both code paths: w=16 (chain)
    # vs w=17/slice can't be compared directly, so check the invariant
    # instead — every fingerprint is the min of SOME w-window, i.e.
    # the fp set of w=18 is a subset of the w=9 set's candidate hashes
    wide = {r.fp for r in winnow_fingerprints(docs, k=5, w=18).collect()}
    narrow = {r.fp for r in winnow_fingerprints(docs, k=5, w=9).collect()}
    assert wide and wide <= narrow


def test_winnow_overlap_packed_int32_ids(spark):
    """Regression: Spark's shiftleft follows Java shift-masking, so
    shiftleft(int32_col, 32) was a no-op and the packed key degenerated
    to id_a|id_b, merging unrelated pairs. int ids must widen to long
    before packing and still match the unpacked aggregate."""
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.winnow import winnow_overlap

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").withColumn(
        "doc_id", F.col("doc_id").cast("int")
    )
    kw = dict(k=10, w=8, min_shared=2, max_df=100)
    p_df = winnow_overlap(docs, packed_ids=True, **kw)
    u_df = winnow_overlap(docs, packed_ids=False, **kw)
    # the flag is a drop-in: same schema (input id dtype) both modes
    assert p_df.dtypes == u_df.dtypes == [
        ("id_a", "int"), ("id_b", "int"), ("n_shared", "bigint"),
    ]
    packed = {(r.id_a, r.id_b, r.n_shared) for r in p_df.collect()}
    unpacked = {(r.id_a, r.id_b, r.n_shared) for r in u_df.collect()}
    assert packed == unpacked and packed


def test_overlap_plan_reuses_one_exchange(spark):
    """Round-9 restructure: the window-form max_df guard leaves the
    fingerprint stream hash-partitioned AND sorted by fp, so the pair
    self-join's two branches collapse into ONE exchange of ONE kernel
    pass (ReusedExchange) — no localCheckpoint pinning the raw stream.
    Guards the 5M-doc memory fix (SCALING.md round-9)."""
    from meds_transforms_spark.operators.winnow import winnow_overlap

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = winnow_overlap(docs, k=10, w=8, min_shared=2, max_df=100,
                         hash_fn="poly64")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan prints Final AND Initial sections — judge the
    # final (executed) one only
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("MapInArrow") == 1, final
    assert "ReusedExchange" in final, final


def test_overlap_no_max_df_broadcast_runs_kernel_twice(spark):
    """Documented acceptance (ADVICE r09): without a max_df guard there
    is no pre-join exchange, so a broadcast-SMALL fingerprint stream
    lets AQE pick a BroadcastHashJoin whose build side re-runs the
    kernel — 2× MapInArrow, cheap by construction (the stream fit in a
    broadcast). At scale the stream exceeds the broadcast threshold and
    the SMJ's identical per-branch exchanges collapse to ReusedExchange
    (single kernel pass), same as the max_df path pinned above."""
    from meds_transforms_spark.operators.winnow import winnow_overlap

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = winnow_overlap(docs, k=10, w=8, min_shared=2, max_df=None,
                         hash_fn="poly64")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    if "BroadcastHashJoin" in final:
        # the accepted (cheap) double-pass shape
        assert final.count("MapInArrow") == 2, final
    else:
        # stream too big to broadcast: the reuse shape must hold
        assert final.count("MapInArrow") == 1, final
        assert "ReusedExchange" in final, final
