"""Property-based tests (hypothesis) — randomized oracle checks the
reference's test suite lacks (SURVEY §5: 'no property-based tests')."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st


@st.composite
def grouped_values(draw):
    n_groups = draw(st.integers(1, 3))
    out = []
    for g in range(n_groups):
        vals = draw(
            st.lists(
                st.floats(-1e4, 1e4, allow_nan=False, allow_infinity=False),
                min_size=1,
                max_size=40,
            )
        )
        out.append((f"G{g}", vals))
    return out


@settings(max_examples=12, deadline=None)
@given(groups=grouped_values(), q=st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9]))
def test_distributed_quantiles_match_numpy_nearest_rank(spark, groups, q):
    from meds_transforms_spark.operators.quantiles import grouped_exact_quantiles
    from meds_transforms_spark.schema import MEDS_DATA_SCHEMA

    rows = [
        (0, None, code, float(np.float32(v)), None)  # float32 round-trip like MEDS
        for code, vals in groups
        for v in vals
    ]
    df = spark.createDataFrame(rows, MEDS_DATA_SCHEMA)
    got = {
        r["code"]: r[f"q{q}"] for r in grouped_exact_quantiles(df, [q]).collect()
    }
    for code, vals in groups:
        arr = np.sort(np.array(vals, dtype=np.float32))
        # nearest-rank: index round(q*(n-1)), round-half-up like F.round
        idx = int(math.floor(q * (len(arr) - 1) + 0.5))
        assert got[code] == pytest.approx(float(arr[idx]), rel=1e-6), (
            code,
            arr.tolist(),
        )


@settings(max_examples=10, deadline=None)
@given(
    values=st.lists(
        st.floats(-1e3, 1e3, allow_nan=False, allow_infinity=False),
        min_size=2,
        max_size=50,
    ),
    cutoff=st.sampled_from([0.5, 1.0, 2.0]),
)
def test_occlude_outliers_matches_numpy(spark, values, cutoff):
    from meds_transforms_spark.operators.aggregate_code_metadata import (
        aggregate_code_metadata,
    )
    from meds_transforms_spark.operators.occlude_outliers import occlude_outliers
    from meds_transforms_spark.schema import MEDS_DATA_SCHEMA

    rows = [(i, None, "X", float(v), None) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, MEDS_DATA_SCHEMA)
    meta = aggregate_code_metadata(
        df, aggregations=["values/n_occurrences", "values/sum", "values/sum_sqd"]
    )
    out = occlude_outliers(df, meta, stddev_cutoff=cutoff)
    got = {r.subject_id: r["numeric_value/is_inlier"] for r in out.collect()}

    arr = np.array(values, dtype=np.float32).astype(np.float64)
    mean = arr.sum() / len(arr)
    var = max((arr * arr).sum() / len(arr) - mean * mean, 0.0)
    std = math.sqrt(var)
    for i, v in enumerate(arr):
        expected = bool(abs(v - mean) <= cutoff * std)
        # float32 storage + association order can flip exact-boundary
        # cases; only assert when comfortably away from the boundary.
        margin = abs(abs(v - mean) - cutoff * std)
        if margin > 1e-3 * max(std, 1.0):
            assert got[i] == expected, (i, v, mean, std)


@settings(max_examples=15, deadline=None)
@given(
    text=st.text(
        alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs")),
        max_size=200,
    )
)
def test_token_count_matches_python_split(spark, text):
    from meds_transforms_spark.operators.text import token_count

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = token_count(df).collect()[0].n_tokens
    # Java/RE2 \s is ASCII-only (unlike Python's Unicode-aware split) —
    # the operator's contract is ASCII whitespace, matching the DuckDB
    # oracle. Model that explicitly here.
    import re

    expected = len([t for t in re.split(r"\s+", text, flags=re.ASCII) if t])
    assert got == expected


@st.composite
def asof_tables(draw):
    """Random left/right event tables over a few keys with second-level
    timestamps (duplicates allowed on the left; right deduped per
    (key, time) as the operator contract requires)."""
    keys = draw(st.lists(st.integers(0, 3), min_size=1, max_size=4, unique=True))
    left, right = [], []
    for k in keys:
        lt = draw(st.lists(st.integers(0, 120), min_size=0, max_size=12))
        rt = draw(
            st.lists(st.integers(0, 120), min_size=0, max_size=10, unique=True)
        )
        left += [(k, t) for t in lt]
        right += [(k, t, float(k * 1000 + t)) for t in rt]
    return left, right


@settings(max_examples=20, deadline=None)
@given(tables=asof_tables(), direction=st.sampled_from(["backward", "forward"]),
       strict=st.booleans())
def test_asof_join_matches_naive(spark, tables, direction, strict):
    import datetime as dt

    from meds_transforms_spark.operators.asof import asof_join

    left_rows, right_rows = tables
    base = dt.datetime(2024, 1, 1)

    def ts(s):
        return base + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(k, ts(t), i) for i, (k, t) in enumerate(left_rows)] or [(99, ts(0), 0)],
        "k long, time timestamp, row_id long",
    )
    right = spark.createDataFrame(
        [(k, ts(t), v) for (k, t, v) in right_rows] or [(98, ts(0), 0.0)],
        "k long, time timestamp, v double",
    )
    out = {
        r["row_id"]: r["v"]
        for r in asof_join(
            left, right, on="k", direction=direction, strict=strict
        ).collect()
    }

    rmap: dict[int, list[tuple[int, float]]] = {}
    for k, t, v in (right_rows or [(98, 0, 0.0)]):
        rmap.setdefault(k, []).append((t, v))
    for i, (k, t) in enumerate(left_rows or [(99, 0)]):
        if direction == "backward":
            cand = [(rt, v) for rt, v in rmap.get(k, []) if (rt < t if strict else rt <= t)]
            expect = max(cand)[1] if cand else None
        else:
            cand = [(rt, v) for rt, v in rmap.get(k, []) if (rt > t if strict else rt >= t)]
            expect = min(cand)[1] if cand else None
        assert out[i] == expect, (i, k, t, direction, strict, cand, out[i])


@settings(max_examples=15, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab c")),  # tiny alphabet → dense repeats
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_repetition_stats_match_python_reference(spark, texts):
    from meds_transforms_spark.operators.text import repetition_stats

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    for i, t in enumerate(texts):
        ws = [w for w in t.lower().split() if w]
        bg = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        top = max((ws.count(w) for w in set(ws)), default=0)
        r = got[i]
        assert r.n_words == len(ws)
        assert r.n_distinct_words == len(set(ws))
        assert r.dup_word_fraction == round((len(ws) - len(set(ws))) / max(len(ws), 1), 6)
        assert r.dup_bigram_fraction == round((len(bg) - len(set(bg))) / max(len(bg), 1), 6)
        assert r.top_word_fraction == round(top / max(len(ws), 1), 6)


@st.composite
def funnel_events(draw):
    n_users = draw(st.integers(1, 4))
    rows = []
    for u in range(n_users):
        n_ev = draw(st.integers(0, 12))
        for _ in range(n_ev):
            minute = draw(st.integers(0, 30))
            ev = draw(st.sampled_from(["view", "click", "purchase", "error"]))
            rows.append((u, minute, ev))
    return rows


@pytest.mark.parametrize("strategy", ["agg_join", "window"])
@settings(max_examples=15, deadline=None)
@given(rows=funnel_events())
def test_funnel_matches_python_reference(spark, strategy, rows):
    import datetime as dt

    from meds_transforms_spark.operators.funnel import funnel_steps

    steps = ["view", "click", "purchase"]
    data = [
        (u, dt.datetime(2024, 1, 1, 0, m), ev) for u, m, ev in rows
    ]
    if not data:
        return
    df = spark.createDataFrame(data, "user_id long, ts timestamp, event_type string")
    got = {r.user_id: r for r in funnel_steps(df, steps, strategy=strategy).collect()}

    # Pure-python earliest-match reference.
    by_user: dict[int, list] = {}
    for u, t, ev in data:
        by_user.setdefault(u, []).append((t, ev))
    for u, evs in by_user.items():
        prev = None
        expect = []
        for s in steps:
            cands = [
                t for t, ev in evs if ev == s and (prev is None or t > prev)
            ]
            cur = min(cands) if cands else None
            if prev is None and cur is None:
                pass  # stage 0: all subsequent steps null too
            expect.append(cur)
            if cur is None:
                expect.extend([None] * (len(steps) - len(expect)))
                break
            prev = cur
        r = got[u]
        assert [r.step_1, r.step_2, r.step_3] == expect, (u, sorted(evs))
        assert r.funnel_stage == sum(e is not None for e in expect)


@settings(max_examples=15, deadline=None)
@given(
    lengths=st.lists(st.integers(1, 500), min_size=1, max_size=60),
    budget=st.sampled_from([64, 256, 1024]),
)
def test_packing_matches_python_cumsum(spark, lengths, budget):
    from meds_transforms_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        list(enumerate(lengths)), "doc_id long, n_tokens long"
    )
    out = pack_sequences(df, budget=budget, order="id", num_partitions=3).collect()
    got = {r.doc_id: (r.pack_id, r.pack_pos, r.pack_offset) for r in out}

    cum = 0
    expect = {}
    pack_counts: dict[int, int] = {}
    pack_start: dict[int, int] = {}
    for i, t in enumerate(lengths):  # order="id" == doc_id order
        start = cum
        cum += t
        pid = (cum - 1) // budget
        pack_counts[pid] = pack_counts.get(pid, 0) + 1
        pack_start.setdefault(pid, start)
        expect[i] = (pid, pack_counts[pid], start - pack_start[pid])
    assert got == expect


@st.composite
def small_corpus(draw):
    """A few short docs over a tiny alphabet — duplication is likely."""
    n = draw(st.integers(2, 6))
    docs = []
    for i in range(n):
        words = draw(
            st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=12)
        )
        docs.append((i, " ".join(words)))
    return docs


def _span_stats_python(docs, k, stride, min_df):
    """Pure-python duplicated_span_stats (normalized text, positional
    k-grams at stride, DF over distinct docs)."""
    import re

    norm = {i: re.sub(r"\s+", " ", t.lower().strip()) for i, t in docs}
    pos = {
        i: list(range(0, max(len(t) - k + 1, 0), stride)) for i, t in norm.items()
    }
    df_docs = {}
    for i, t in norm.items():
        for g in {t[p : p + k] for p in pos[i]}:
            df_docs[g] = df_docs.get(g, 0) + 1
    out = {}
    for i, t in norm.items():
        total = len(pos[i])
        dup = sum(1 for p in pos[i] if df_docs[t[p : p + k]] >= min_df)
        out[i] = (total, dup)
    return out


@settings(max_examples=15, deadline=None)
@given(docs=small_corpus(), k=st.sampled_from([3, 5, 8]), stride=st.sampled_from([1, 2, 4]))
def test_duplicated_span_stats_matches_python(spark, docs, k, stride):
    from meds_transforms_spark.operators.substring import duplicated_span_stats

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_positions, r.n_dup_positions)
        for r in duplicated_span_stats(df, k=k, stride=stride).collect()
    }
    assert got == _span_stats_python(docs, k, stride, 2)


# ---------------------------------------------------------------- round 3


@st.composite
def winnow_corpus(draw):
    """Random doc pairs with a planted shared substring of length
    >= w + k - 1 (k=4, w=3 -> 6 chars guarantee threshold)."""
    alpha = "abcdef "
    shared = draw(st.text(alphabet="xyz", min_size=6, max_size=20))
    pre_a = draw(st.text(alphabet=alpha, min_size=0, max_size=30))
    suf_a = draw(st.text(alphabet=alpha, min_size=0, max_size=30))
    pre_b = draw(st.text(alphabet=alpha, min_size=0, max_size=30))
    suf_b = draw(st.text(alphabet=alpha, min_size=0, max_size=30))
    return (pre_a + shared + suf_a, pre_b + shared + suf_b)


@settings(max_examples=15, deadline=None)
@given(pair=winnow_corpus())
def test_winnowing_shared_substring_guarantee(spark, pair):
    """Schleimer et al.'s theorem, fuzzed: any shared substring of
    length >= w + k - 1 guarantees a shared fingerprint. (The shared
    run uses a disjoint alphabet so normalization cannot shorten it.)"""
    from meds_transforms_spark.operators.winnow import winnow_fingerprints

    a, b = pair
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    fps = winnow_fingerprints(df, k=4, w=3).collect()
    s1 = {r.fp for r in fps if r.doc_id == 1}
    s2 = {r.fp for r in fps if r.doc_id == 2}
    assert s1 & s2


@settings(max_examples=10, deadline=None)
@given(
    n=st.integers(1, 300),
    n_shards=st.integers(1, 16),
    seed=st.integers(0, 5),
)
def test_shuffle_shards_invariants(spark, n, n_shards, seed):
    """Exact balance (+/-1), dense per-shard positions, determinism."""
    from meds_transforms_spark.operators.ids import shuffle_shards

    import pyspark.sql.functions as F

    df = spark.range(n).select(F.col("id").alias("doc_id"))
    rows = shuffle_shards(df, n_shards=n_shards, seed=seed, num_partitions=3).collect()
    assert len(rows) == n
    sizes: dict[int, list[int]] = {}
    for r in rows:
        sizes.setdefault(r.shard_id, []).append(r.pos_in_shard)
    counts = [len(v) for v in sizes.values()]
    assert max(counts) - min(counts) <= 1
    for poss in sizes.values():
        assert sorted(poss) == list(range(len(poss)))


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=25), min_size=1, max_size=12
    )
)
def test_bigram_logprob_matches_python_reference(spark, texts):
    """Self-fit interpolated bigram scores vs a from-scratch python
    implementation of the same formula."""
    from collections import Counter

    from meds_transforms_spark.operators.lm import bigram_logprob

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.avg_bigram_logprob for r in bigram_logprob(df).collect()}

    docs_toks = {i: [w for w in t.lower().split() if w] for i, t in rows}
    lm = Counter()
    for toks in docs_toks.values():
        lm.update(zip(toks, toks[1:]))
    if not lm:
        assert all(v is None for v in got.values())
        return
    c1 = Counter()
    c2 = Counter()
    for (w1, w2), c in lm.items():
        c1[w1] += c
        c2[w2] += c
    N = float(sum(lm.values()))
    V = float(len({w2 for _, w2 in lm}))
    lam, alpha = 0.7, 0.1
    for i, toks in docs_toks.items():
        bgs = list(zip(toks, toks[1:]))
        if not bgs:
            assert got[i] is None
            continue
        tot = 0.0
        for bg in bgs:
            p = lam * (lm[bg] / c1[bg[0]]) + (1.0 - lam) * (
                (c2[bg[1]] + alpha) / (N + alpha * V)
            )
            tot += math.log(p)
        assert got[i] == pytest.approx(tot / len(bgs), rel=1e-9, abs=1e-9)


@st.composite
def snapshot_pair(draw):
    ids = draw(st.lists(st.integers(0, 30), min_size=1, max_size=25, unique=True))
    texts = {
        i: draw(st.one_of(st.none(), st.text(alphabet="ab ", min_size=0, max_size=12)))
        for i in ids
    }
    keep_old = {i for i in ids if draw(st.booleans())}
    keep_new = {i for i in ids if draw(st.booleans())}
    changed = {i for i in keep_new if draw(st.booleans())}

    def mutate(t):
        # a 'changed' doc may also transition NULL<->non-NULL
        return " X" if t is None else t + " X"

    old = [(i, texts[i], f"g{i % 2}") for i in keep_old]
    new = [
        (i, mutate(texts[i]) if i in changed else texts[i], f"g{i % 2}")
        for i in keep_new
    ]
    return old, new


@settings(max_examples=12, deadline=None)
@given(pair=snapshot_pair())
def test_corpus_diff_matches_python_reference(spark, pair):
    from meds_transforms_spark.operators.diff import corpus_diff

    old, new = pair
    o = spark.createDataFrame(old, "doc_id long, text string, source string") if old else \
        spark.createDataFrame([], "doc_id long, text string, source string")
    n = spark.createDataFrame(new, "doc_id long, text string, source string") if new else \
        spark.createDataFrame([], "doc_id long, text string, source string")
    got = {r.group: r for r in corpus_diff(o, n).collect()}

    import re

    def norm(t):
        # NULL text stays NULL: distinct from every non-NULL text,
        # equal to itself (mirrors the engine's null-safe comparison)
        return None if t is None else re.sub(r"\s+", " ", t.strip().lower())

    def tlen(t):
        return 0 if t is None else len(t)

    om = {i: (t, g) for i, t, g in old}
    nm = {i: (t, g) for i, t, g in new}
    exp: dict[str, dict[str, int]] = {}

    def bump(g, key, amt=1):
        d = exp.setdefault(
            g,
            dict(n_added=0, n_removed=0, n_changed=0, n_unchanged=0,
                 chars_added=0, chars_removed=0),
        )
        d[key] += amt

    for i in set(om) | set(nm):
        if i not in om:
            t, g = nm[i]
            bump(g, "n_added"); bump(g, "chars_added", tlen(t))
        elif i not in nm:
            t, g = om[i]
            bump(g, "n_removed"); bump(g, "chars_removed", tlen(t))
        else:
            to, _go = om[i]
            tn, gn = nm[i]  # group of record: where the doc lives NOW
            if norm(to) != norm(tn):
                bump(gn, "n_changed")
                bump(gn, "chars_added", tlen(tn)); bump(gn, "chars_removed", tlen(to))
            else:
                bump(gn, "n_unchanged")

    assert set(got) == set(exp)
    for g, d in exp.items():
        for k, v in d.items():
            assert getattr(got[g], k) == v, (g, k)


@st.composite
def event_stream(draw):
    """Random (user, epoch-seconds, value) events with clustered and
    boundary-adjacent timestamps."""
    n = draw(st.integers(1, 60))
    rows = []
    for i in range(n):
        user = draw(st.sampled_from(["u1", "u2"]))
        # timestamps cluster near bucket boundaries to stress context
        base = draw(st.integers(0, 5)) * 86_400
        off = draw(st.integers(-4000, 90_000))
        val = draw(st.floats(-100, 100, allow_nan=False, allow_infinity=False))
        rows.append((i, user, max(base + off, 0), float(val)))
    return rows


@settings(max_examples=10, deadline=None)
@given(
    rows=event_stream(),
    window_s=st.sampled_from([3600, 21600]),
    bucket_s=st.sampled_from([21600, 86400]),
)
def test_bucketized_trailing_window_is_exact(spark, rows, window_s, bucket_s):
    """Property: the (keys, time-bucket) decomposition with forward
    context duplication reproduces the keys-only trailing window on
    ARBITRARY event streams — including events exactly on bucket
    boundaries and multiple events at one timestamp."""
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.rolling import rolling_time_stats

    df = spark.createDataFrame(
        rows, "event_id long, user string, sec long, value double"
    ).withColumn("ts", F.timestamp_seconds("sec"))
    kw = dict(keys="user", time_col="ts", value_col="value",
              window_seconds=window_s, prefix="w")
    cols = ["event_id", "w_n", "w_sum"]
    plain = rolling_time_stats(df, **kw).select(cols).orderBy("event_id").collect()
    bucketed = (
        rolling_time_stats(df, bucket_seconds=bucket_s, **kw)
        .select(cols).orderBy("event_id").collect()
    )
    assert [tuple(r) for r in plain] == [tuple(r) for r in bucketed]
