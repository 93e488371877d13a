"""Unit tests for gopher_quality_filter and dsir_weights."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs back home "
    "to be with all of that good company it would have kept with joy "
    "because every word here is ordinary prose of sensible length today"
)


def test_gopher_passes_ordinary_prose(spark):
    from meds_transforms_spark.operators.text import gopher_quality_filter

    out = gopher_quality_filter(
        _docs(spark, [(1, "a", GOOD)]), min_words=30
    ).collect()[0]
    assert out.gopher_pass
    assert all(
        out[r]
        for r in (
            "rule_word_count",
            "rule_mean_word_len",
            "rule_symbol_ratio",
            "rule_bullet_lines",
            "rule_ellipsis_lines",
            "rule_alpha_words",
            "rule_stopwords",
        )
    )


def test_gopher_individual_rules(spark):
    from meds_transforms_spark.operators.text import gopher_quality_filter

    rows = [
        (1, "a", "too short"),                                   # word count
        (2, "a", " ".join(["ab"] * 60)),                          # mean word len < 3
        (3, "a", " ".join(["the#"] * 30 + ["of..."] * 30)),       # symbol ratio
        (4, "a", "\n".join(["- item one of the list"] * 10)),     # bullet lines
        (5, "a", "\n".join(["the thing trails off..."] * 10)),    # ellipsis lines
        (6, "a", " ".join(["1234"] * 50 + ["the", "of"] * 5)),    # alpha words
        (7, "a", " ".join(["zebra", "yonder", "quartz"] * 20)),   # stopwords
        (8, "a", None),                                           # null fails closed
    ]
    out = {
        r.doc_id: r
        for r in gopher_quality_filter(
            _docs(spark, rows), min_words=8, min_mean_word_len=3.0
        ).collect()
    }
    assert not out[1].rule_word_count
    assert not out[2].rule_mean_word_len
    assert not out[3].rule_symbol_ratio
    assert not out[4].rule_bullet_lines
    assert not out[5].rule_ellipsis_lines
    assert not out[6].rule_alpha_words
    assert not out[7].rule_stopwords
    assert not any(out[i].gopher_pass for i in out)
    # the null doc fails every rule, not just one
    assert not any(
        out[8][r] for r in out[8].asDict() if r.startswith("rule_")
    )


def test_dsir_weights_prefer_target_vocabulary(spark):
    from meds_transforms_spark.operators.dsir import dsir_weights

    # Target docs use vocabulary A; pool docs vocabulary B. A held-out
    # pool doc written in vocabulary A must outweigh every true pool doc.
    rows = (
        [(i, "tgt", "alpha beta gamma delta alpha beta") for i in range(10)]
        + [(100 + i, "raw", "omega sigma tau rho omega sigma") for i in range(10)]
        + [(999, "raw", "alpha beta gamma delta beta gamma")]
    )
    out = dsir_weights(_docs(spark, rows), "source = 'tgt'")
    w = {r.doc_id: r.dsir_logweight for r in out.collect()}
    assert w[999] > max(w[100 + i] for i in range(10))
    # target-vocab docs score above pool-vocab docs on average
    assert (sum(w[i] for i in range(10)) / 10) > (
        sum(w[100 + i] for i in range(10)) / 10
    )


def test_dsir_matches_pure_python_model(spark):
    """Replay the full hashed-bigram fit+score in plain python (md5_60
    hashing so both sides agree) and require exact bucket/count parity."""
    import hashlib

    from meds_transforms_spark.operators.dsir import dsir_weights

    rows = [
        (1, "tgt", "a b a c"),
        (2, "tgt", "b c d"),
        (3, "raw", "x y z x"),
        (4, "raw", "a x b y"),
        (5, "raw", ""),
    ]
    B = 64

    def h(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % B

    def feats(text):
        toks = [t for t in text.lower().split() if t]
        return [h(f) for f in toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]]

    raw, tgt = {}, {}
    is_tgt = {1: True, 2: True, 3: False, 4: False, 5: False}
    for did, src, text in rows:
        for b in feats(text):
            raw[b] = raw.get(b, 0) + 1
            if is_tgt[did]:
                tgt[b] = tgt.get(b, 0) + 1
    traw, ttgt = sum(raw.values()), sum(tgt.values())
    expected = {}
    for did, src, text in rows:
        s = 0.0
        for b in feats(text):
            s += math.log((tgt.get(b, 0) + 1) / (ttgt + B)) - math.log(
                (raw.get(b, 0) + 1) / (traw + B)
            )
        expected[did] = s
    out = dsir_weights(
        _docs(spark, rows), "source = 'tgt'", n_buckets=B, hash_fn="md5_60"
    )
    got = {r.doc_id: r.dsir_logweight for r in out.collect()}
    for did in expected:
        assert abs(got[did] - expected[did]) < 1e-9, did


def test_dsir_no_token_doc_gets_zero(spark):
    from meds_transforms_spark.operators.dsir import dsir_weights

    rows = [(1, "tgt", "a b"), (2, "raw", "   "), (3, "raw", None)]
    out = dsir_weights(_docs(spark, rows), "source = 'tgt'")
    w = {r.doc_id: r.dsir_logweight for r in out.collect()}
    assert w[2] == 0.0 and w[3] == 0.0


def test_semantic_dedup_drops_scaled_copies(spark):
    """Scaled copies (cosine exactly 1.0) share the original's cell and
    must collapse onto the smaller id; dissimilar vectors survive."""
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.dedup import semantic_dedup

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .limit(100)
    )
    aug = emb.select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("emb", lambda x: x * 2.0).alias("emb"),
    )
    out = semantic_dedup(
        emb.unionByName(aug), vec_col="emb", id_col="vec_id",
        n_cells=8, threshold=0.95, exact=True,
    )
    ids = {r.vec_id for r in out.collect()}
    assert all(i < 1000 for i in ids)          # every copy dropped
    assert len(ids) == 100                      # no original dropped (random vecs)


def test_semantic_dedup_kmeans_refined_cells(spark):
    """iters>0 path: refined centroids still produce a full partition of
    the corpus and the same duplicate-collapse semantics."""
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.dedup import semantic_dedup

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .limit(60)
    )
    dup = emb.select((F.col("vec_id") + 500).alias("vec_id"), "emb")  # identical copies
    out = semantic_dedup(
        emb.unionByName(dup), vec_col="emb", id_col="vec_id",
        n_cells=4, iters=2, threshold=0.99, exact=False,
    )
    ids = {r.vec_id for r in out.collect()}
    assert all(i < 500 for i in ids) and len(ids) == 60


def test_dsir_fit_serve_matches_fused(spark):
    """fit_dsir_model + dsir_score over the SAME corpus must reproduce
    the fused dsir_weights exactly (every bucket present in the model)."""
    from meds_transforms_spark.operators.dsir import (
        dsir_score,
        dsir_weights,
        fit_dsir_model,
    )

    rows = [
        (1, "tgt", "a b a c d e"),
        (2, "tgt", "b c d"),
        (3, "raw", "x y z x w q"),
        (4, "raw", "a x b y"),
    ]
    df = _docs(spark, rows)
    model = fit_dsir_model(df, "source = 'tgt'", n_buckets=64, hash_fn="md5_60")
    served = dsir_score(df, model, n_buckets=64, hash_fn="md5_60")
    fused = dsir_weights(df, "source = 'tgt'", n_buckets=64, hash_fn="md5_60")
    s = {r.doc_id: r.dsir_logweight for r in served.collect()}
    f = {r.doc_id: r.dsir_logweight for r in fused.collect()}
    for did in f:
        assert abs(s[did] - f[did]) < 1e-9, did


def test_dsir_score_unseen_bucket_fallback(spark):
    """Serving vocabulary the model never saw uses the unseen smoothing
    mass (log(1/(tot_tgt+B)) - log(1/(tot_raw+B))), not silence."""
    import math

    from meds_transforms_spark.operators.dsir import dsir_score, fit_dsir_model

    fit_df = _docs(spark, [(1, "tgt", "a b"), (2, "raw", "c d")])
    model = fit_dsir_model(fit_df, "source = 'tgt'", n_buckets=64, hash_fn="md5_60")
    new = _docs(spark, [(9, "raw", "zz_unseen_token")])
    out = dsir_score(new, model, n_buckets=64, hash_fn="md5_60").collect()[0]
    m = model.limit(1).collect()[0]
    expected = m.unseen_tgt_logp - m.unseen_raw_logp
    assert math.isclose(out.dsir_logweight, expected, rel_tol=1e-9)


def test_dsir_projection_matches_relational_serving(spark):
    from meds_transforms_spark.operators.dsir import (
        dsir_score,
        dsir_score_projection,
        fit_dsir_model,
    )

    rows = [
        (1, "tgt", "a b a c"),
        (2, "raw", "x y a"),
        (3, "raw", "zz unseen vocab"),
        (4, "raw", None),
    ]
    df = _docs(spark, rows)
    model = fit_dsir_model(df, "source = 'tgt'", n_buckets=64, hash_fn="md5_60")
    rel = {r.doc_id: r.dsir_logweight
           for r in dsir_score(df, model, n_buckets=64, hash_fn="md5_60").collect()}
    proj = {r.doc_id: r.dsir_logweight
            for r in dsir_score_projection(df, model, n_buckets=64, hash_fn="md5_60").collect()}
    for did in rel:
        assert abs(rel[did] - proj[did]) < 1e-9, (did, rel[did], proj[did])


def test_dsir_serve_bucket_mismatch_raises(spark):
    import pytest

    from meds_transforms_spark.operators.dsir import (
        dsir_score,
        dsir_score_projection,
        fit_dsir_model,
    )

    df = _docs(spark, [(1, "tgt", "a b"), (2, "raw", "c d")])
    model = fit_dsir_model(df, "source = 'tgt'", n_buckets=64)
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_score(df, model, n_buckets=128).collect()
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_score_projection(df, model, n_buckets=32).collect()


def test_null_text_never_deduplicates(spark):
    """xxhash64(NULL) is a constant: without explicit guards every
    null-text row would collapse into one survivor in exact_dedup and
    the degenerate empty-signature bucket in minhash_lsh_dedup."""
    from meds_transforms_spark.operators.dedup import exact_dedup, minhash_lsh_dedup

    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, None), (4, None), (5, "other")],
        "doc_id long, text string",
    )
    assert sorted(r.doc_id for r in exact_dedup(df).collect()) == [1, 3, 4, 5]
    assert sorted(r.doc_id for r in minhash_lsh_dedup(df).collect()) == [1, 3, 4, 5]

    from meds_transforms_spark.operators.dedup import simhash_dedup

    assert sorted(r.doc_id for r in simhash_dedup(df).collect()) == [1, 3, 4, 5]


def test_corpus_report_null_text_not_counted_as_dups(spark):
    from meds_transforms_spark.operators.text import corpus_report

    df = spark.createDataFrame(
        [(1, "s", "dup"), (2, "s", "dup"), (3, "s", None), (4, "s", None)],
        "doc_id long, source string, text string",
    )
    row = corpus_report(df).collect()[0]
    assert row.n_docs == 4
    assert row.n_exact_dups == 1          # only the real text dup


def test_embedding_cosine_dedup_empty_input(spark):
    from meds_transforms_spark.operators.dedup import embedding_cosine_dedup

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert embedding_cosine_dedup(empty).count() == 0


def test_semantic_dedup_arrow_assignment_matches_hof(spark):
    """assign="arrow" (BLAS matmul per Arrow batch) must produce the
    identical survivor set as the interpreted HOF assignment on data
    without last-ulp argmax ties — plus the same augmentation-collapse
    behavior."""
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.dedup import semantic_dedup

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .limit(100)
    )
    aug = emb.select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("emb", lambda x: x * 1.01).alias("emb"),
    )
    both = emb.unionByName(aug)
    kw = dict(vec_col="emb", id_col="vec_id", n_cells=8, threshold=0.95, exact=True)
    hof = {r.vec_id for r in semantic_dedup(both, assign="hof", **kw).collect()}
    arrow = {r.vec_id for r in semantic_dedup(both, assign="arrow", **kw).collect()}
    assert arrow == hof
    assert all(i < 1000 for i in arrow) and len(arrow) == 100


def test_semantic_dedup_rejects_unknown_assign(spark):
    import pytest
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.dedup import semantic_dedup

    emb = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, emb array<double>")
    with pytest.raises(ValueError, match="assign"):
        semantic_dedup(emb, vec_col="emb", id_col="vec_id", assign="nope")


def test_assign_cells_arrow_empty_centroids(spark):
    """No centroids (empty corpus seed) → empty assignment frame with
    the contract schema, not a crash."""
    from meds_transforms_spark.operators.ivf import assign_cells_arrow, ivf_centroids

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    vecs = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    out = assign_cells_arrow(vecs, ivf_centroids(empty, 4))
    assert out.count() == 0
    assert set(out.columns) == {"vec_id", "embedding", "__cell"}


def test_kmeans_refine_arrow_matches_hof(spark):
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.ivf import kmeans_refine

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .limit(120)
    )
    h = kmeans_refine(emb, n_cells=6, iters=2, assign="hof").orderBy("__cell").collect()
    a = kmeans_refine(emb, n_cells=6, iters=2, assign="arrow").orderBy("__cell").collect()
    assert len(h) == len(a) == 6
    for rh, ra in zip(h, a):
        assert rh["__cell"] == ra["__cell"]
        assert rh["__cvec"] == pytest.approx(ra["__cvec"], rel=1e-12, abs=1e-12)


def test_build_ivf_index_arrow_matches_hof(spark):
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.ivf import build_ivf_index

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .limit(150)
    )
    h = {r.vec_id: r["__cell"] for r in build_ivf_index(emb, n_cells=8).collect()}
    a = {r.vec_id: r["__cell"] for r in build_ivf_index(emb, n_cells=8, assign="arrow").collect()}
    assert h == a


def test_assign_cells_arrow_preserves_string_ids(spark):
    """Regression: the arrow path used to cast ids to long, silently
    NULLing string ids and turning semantic_dedup(assign="arrow") into
    a no-op. Ids must pass through with their original dtype."""
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.dedup import semantic_dedup
    from meds_transforms_spark.operators.ivf import assign_cells_arrow, ivf_centroids

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(
            F.concat(F.lit("doc-"), F.format_string("%04d", "vec_id")).alias("vec_id"),
            F.col("embedding").cast("array<double>").alias("emb"),
        )
        .limit(100)
    )
    assigned = assign_cells_arrow(
        emb, ivf_centroids(emb, 8, "vec_id", "emb"), "vec_id", "emb"
    )
    assert dict(assigned.dtypes)["vec_id"] == "string"
    assert assigned.filter("vec_id is null").count() == 0

    aug = emb.select(
        F.concat(F.lit("z"), "vec_id").alias("vec_id"),
        F.transform("emb", lambda x: x * 1.01).alias("emb"),
    )
    both = emb.unionByName(aug)
    kw = dict(vec_col="emb", id_col="vec_id", n_cells=8, threshold=0.95, exact=True)
    hof = {r.vec_id for r in semantic_dedup(both, assign="hof", **kw).collect()}
    arrow = {r.vec_id for r in semantic_dedup(both, assign="arrow", **kw).collect()}
    assert arrow == hof
    assert len(arrow) == 100 and all(not i.startswith("z") for i in arrow)


def test_assign_cells_arrow_null_embeddings(spark):
    """Regression: pyarrow flatten() drops NULL list entries, which
    crashed the reshape (and would shift neighbours). NULL embeddings
    must assign to the lowest cell — the HOF path's outcome."""
    from meds_transforms_spark.operators.ivf import (
        _nearest_cells,
        assign_cells_arrow,
        ivf_centroids,
        l2_norm,
    )
    from pyspark.sql import functions as F

    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, None),
            (3, [0.0, 1.0]),
            (4, None),
            (5, [0.9, 0.1]),
            (6, []),  # empty: can't seed a cell, can't matmul
            (7, [1.0, 2.0, 3.0]),  # wrong dim: HOF dot is NULL
        ],
        "vec_id long, embedding array<double>",
    )
    cents = ivf_centroids(vecs, 2)
    # empty/NULL vectors must not seed centroids
    assert {r.vec_id for r in vecs.join(cents, vecs.embedding == cents["__cvec"]).collect()} <= {1, 3}
    arrow = {
        r.vec_id: r["__cell"] for r in assign_cells_arrow(vecs, cents).collect()
    }
    hof_df = _nearest_cells(
        vecs.withColumn("__vnorm", l2_norm(F.col("embedding"))),
        cents,
        "vec_id",
        "embedding",
        n_probe=1,
    )
    hof = {r.vec_id: r["__cell"] for r in hof_df.collect()}
    assert arrow == hof
    low = min(r["__cell"] for r in cents.collect())
    assert arrow[2] == arrow[4] == arrow[6] == arrow[7] == low


def test_assign_cells_arrow_rejects_wide_cell_ids(spark):
    """A caller-supplied centroid frame with __cell ids past int32
    must fail loudly — astype(int32) would silently wrap them."""
    import pytest

    from meds_transforms_spark.operators.ivf import assign_cells_arrow

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [(2**31, [1.0, 0.0], 1.0)], "__cell long, __cvec array<double>, __cnorm double"
    )
    with pytest.raises(ValueError, match="int32"):
        assign_cells_arrow(vecs, cents)


def test_semantic_dedup_forwards_assign_to_refine(spark):
    """iters>0 must run the refinement rounds with the requested assign
    engine (regression: arrow mode silently fell back to HOF inside
    kmeans_refine) — and the arrow survivor set still matches hof."""
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators import ivf
    from meds_transforms_spark.operators.dedup import semantic_dedup

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .limit(80)
    )
    kw = dict(vec_col="emb", id_col="vec_id", n_cells=4, iters=2, threshold=0.95, exact=True)
    hof = {r.vec_id for r in semantic_dedup(emb, assign="hof", **kw).collect()}

    calls = []
    real = ivf.assign_cells_arrow

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    ivf.assign_cells_arrow = counting
    try:
        import meds_transforms_spark.operators.dedup  # noqa: F401  (uses ivf attr at call time)
        arrow = {r.vec_id for r in semantic_dedup(emb, assign="arrow", **kw).collect()}
    finally:
        ivf.assign_cells_arrow = real
    # one call per refinement round + the final assignment
    assert len(calls) >= 3
    assert arrow == hof


def test_ngram_jaccard_null_and_empty_docs_never_pair(spark):
    """Regression: the short-doc gram fallback emitted one degenerate
    '' gram for NULL/whitespace-only docs, reporting every such pair as
    jaccard=1.0 duplicates."""
    from meds_transforms_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [
            (1, None),
            (2, None),
            (3, "   "),
            (4, ""),
            (5, "the quick brown fox jumps over the lazy dog"),
            (6, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            docs, n=3, threshold=0.5, use_lsh_candidates=False
        ).collect()
    }
    assert pairs == {(5, 6)}


def test_fingerprint_null_text_is_null(spark):
    """Regression: xxhash64 of all-NULL input returns the seed (42),
    stamping every NULL doc with one shared 'content' key."""
    from meds_transforms_spark.operators.text import fingerprint

    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "doc_id long, text string"
    )
    got = {r.doc_id: r.fingerprint for r in fingerprint(docs).collect()}
    assert got[1] is None and got[2] is None and got[3] is not None


def test_ccnet_buckets_null_lang_unbucketed(spark):
    """Regression: docs whose lang has no cuts row (NULL lang never
    equi-joins) fell through to 'tail' instead of NULL."""
    from meds_transforms_spark.operators.lm import ccnet_buckets, fit_bigram_lm

    docs = spark.createDataFrame(
        [
            (i, "en" if i < 8 else None, "the quick brown fox jumps over the lazy dog " * 3)
            for i in range(10)
        ],
        "doc_id long, lang string, text string",
    )
    lm = fit_bigram_lm(docs)
    out = {r.doc_id: r.ppl_bucket for r in ccnet_buckets(docs, lm).collect()}
    assert out[8] is None and out[9] is None
    assert all(out[i] in ("head", "middle", "tail") for i in range(8))


def test_corpus_report_keeps_null_source_group(spark):
    """Regression: the report's equi-join on the group key dropped the
    NULL-source group entirely."""
    from meds_transforms_spark.operators.text import corpus_report

    docs = spark.createDataFrame(
        [(1, "a", "x y z"), (2, None, "p q r"), (3, None, "s t u")],
        "doc_id long, source string, text string",
    )
    rows = {r.source: r.n_docs for r in corpus_report(docs).collect()}
    assert rows == {"a": 1, None: 2}


def test_bigram_projection_rejects_degenerate_params(spark):
    """Regression: lam=1.0/alpha=0.0 crashed with a bare math domain
    error at build time, and an empty lm silently scored every doc as
    'perfect prose' (floor 0.0)."""
    import pytest

    from meds_transforms_spark.operators.lm import bigram_logprob_projection

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    lm = spark.createDataFrame([("a", "b", 3)], "w1 string, w2 string, n long")
    empty = spark.createDataFrame([], "w1 string, w2 string, n long")
    with pytest.raises(ValueError, match="lam"):
        bigram_logprob_projection(docs, lm, lam=1.0)
    with pytest.raises(ValueError, match="alpha"):
        bigram_logprob_projection(docs, lm, alpha=0.0)
    with pytest.raises(ValueError, match="empty lm"):
        bigram_logprob_projection(docs, empty)


def test_dsir_weights_poly64_kernel(spark):
    """The Arrow feature-bucket kernel path: weights exist for every
    doc, target-domain docs score higher on average (the DSIR
    contract), and token-less docs get exactly 0.0. Bitwise
    correctness is the driver oracle's job (docs_dsir_weights replays
    the full poly64 fit+score in DuckDB)."""
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.dsir import dsir_weights

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs = docs.unionByName(
        spark.createDataFrame([(999999, None, "xx", "srcX", 0)], docs.schema)
    )
    out = dsir_weights(
        docs, "source IN ('src0','src1','src2')", hash_fn="poly64", round_to=6
    )
    rows = out.select("doc_id", "source", "dsir_logweight").collect()
    assert len(rows) == docs.count()
    assert all(r.dsir_logweight is not None for r in rows)
    null_doc = [r for r in rows if r.doc_id == 999999][0]
    assert null_doc.dsir_logweight == 0.0
    tgt = [r.dsir_logweight for r in rows if r.source in ("src0", "src1", "src2")]
    rest = [r.dsir_logweight for r in rows if r.source not in ("src0", "src1", "src2")]
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)
