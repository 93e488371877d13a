"""Deduplication operators for large-scale training-data pipelines.

Five dedup families, all expressed shuffle-minimally:

- ``exact_dedup``          hash-groupBy on a (normalized) content key
- ``minhash_lsh_dedup``    shingle → minhash → band → bucket-join
- ``simhash_dedup``        64-bit simhash signatures + band buckets
- ``ngram_jaccard_pairs``  n-gram Jaccard similarity over candidate pairs
- ``embedding_cosine_dedup`` near-dup by embedding cosine within LSH buckets

Scale notes (the whole point):
- Signatures (minhash/simhash) are computed with built-in array HOFs +
  ``xxhash64`` — JVM-side, no Python, one linear pass.
- Candidate generation never does an all-pairs cross join: LSH bands
  hash into buckets and only same-bucket pairs are compared — the
  classic MinHash-LSH bound on comparisons. The bucket join shuffles
  (band, bucket-hash) keys, each tiny.
- Cluster representative = min(doc_id) per group — a single groupBy,
  no iterative connected components in the default path (transitive
  closure via graph iteration is offered separately; at 100 TB the
  1-hop "collapse to bucket minimum" is the standard approximation).

BEHAVIOR CHANGE (round 8): the default ``hash_fn`` for
``lsh_band_buckets`` / ``minhash_lsh_dedup`` / ``dedup_index`` (and
``winnow_*`` in operators/winnow.py) flipped from the JVM-relational
``xxhash64`` path to the Arrow-batched ``poly64`` kernel. Bucket
values — and therefore which duplicate of a pair survives — differ
from pre-round-8 defaults, and the default path now requires Python
workers + pyarrow. Callers who need the old buckets or a JVM-only
plan must pass ``hash_fn="xxhash64"`` explicitly. Persisted
``dedup_index`` sidecars record their hash_fn and refuse silent
mixing, so durable indexes are safe either way.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage


class _DefaultHashFn(str):
    """``str`` subclass marking a ``hash_fn`` value the CALLER DID NOT
    PASS (the signature default). Compares/hashes exactly like the
    plain string, so every routing comparison is unaffected; only
    :func:`_note_default_hash_fn`'s isinstance check sees the
    difference. (An interned-literal identity check would misfire:
    CPython interns ``"poly64"``, so a user's explicit literal would
    be the same object as a plain-str module default.)"""

    __slots__ = ()


POLY64_DEFAULT = _DefaultHashFn("poly64")
_default_hash_fn_warned = False


def _note_default_hash_fn(hash_fn: str) -> None:
    """One-shot per-session behavior-change notice (CHANGELOG, round
    8): entry points taking the DEFAULT ``hash_fn`` now route to the
    Arrow ``poly64`` kernel — different buckets (and thus different
    surviving duplicates) than the pre-round-8 ``xxhash64`` default,
    and the plan requires Python workers + pyarrow. Suppressed when
    any ``hash_fn`` (even ``"poly64"``) is passed explicitly."""
    global _default_hash_fn_warned
    if _default_hash_fn_warned or not isinstance(hash_fn, _DefaultHashFn):
        return
    _default_hash_fn_warned = True
    warnings.warn(
        "meds_transforms_spark dedup/winnow default hash_fn is now the "
        "Arrow-batched 'poly64' kernel (since round 8): bucket values — "
        "and which duplicate of a pair survives — differ from the old "
        "'xxhash64' default, and the default plan requires Python "
        "workers + pyarrow. Pass hash_fn='poly64' to silence this "
        "notice, or hash_fn='xxhash64' for the pre-round-8 JVM-only "
        "behavior. See CHANGELOG.md.",
        stacklevel=3,
    )


def _normalized(col: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def char_shingles(col: Column, k: int = 5) -> Column:
    """Distinct character k-shingles of normalized text, via sequence +
    substring — built-in, no UDF."""
    norm = _normalized(col)
    n = F.greatest(F.length(norm) - F.lit(k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: norm.substr(i, F.lit(k)))
    )


def _h64(hash_fn: str, *cols: Column) -> Column:
    """64-bit-ish hash of the ':'-joined string forms of ``cols``.

    - ``"xxhash64"`` (default): fastest, JVM codegen, multi-arg native.
    - ``"md5_60"``: first 15 hex chars of md5 as a positive 60-bit
      long. ~Same collision behavior at these scales, but md5 exists
      with identical output in every engine — used by the DuckDB
      oracles to verify the FULL MinHash/SimHash pipeline end-to-end
      (xxhash64 has no DuckDB equivalent).
    """
    if hash_fn == "xxhash64":
        return F.xxhash64(*cols)
    if hash_fn == "md5_60":
        joined = (
            cols[0]
            if len(cols) == 1
            else F.concat_ws(":", *[c.cast("string") for c in cols])
        )
        return F.conv(F.substring(F.md5(joined.cast("string")), 1, 15), 16, 10).cast(
            "long"
        )
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def word_tokens(col: Column) -> Column:
    """Non-empty whitespace tokens of normalized text."""
    return F.filter(F.split(_normalized(col), r"\s+"), lambda t: t != "")


def word_ngrams_of(toks: Column, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined) from an already-MATERIALIZED
    token array column.

    Always bind the token array to a real column (one ``select``) before
    calling this: Catalyst does no CSE inside higher-order-function
    lambdas, so passing the tokenization *expression* re-runs the
    regex split once per gram position — measured 6× slower on the
    n=13 decontamination gram stream."""
    cnt = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def word_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined) of normalized text.

    Convenience single-expression form for small frames/tests; in
    operator plans prefer materializing :func:`word_tokens` into a
    column and calling :func:`word_ngrams_of` (see its note)."""
    return word_ngrams_of(word_tokens(col), n)


@register_stage("exact_dedup")
def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Keep one row (min id) per distinct content hash.

    Single window pass: ONE scan, ONE shuffle on the 64-bit content
    hash, deterministic min-id tiebreak. (A groupBy + join-back reads
    the corpus twice and needs either a broadcast of every distinct key
    — unbounded at 100 TB — or a second full shuffle; the window form
    does neither.)
    """
    from pyspark.sql import Window as W

    c = F.col(text_col)
    key = F.xxhash64(_normalized(c) if normalize else c)
    keeper = F.min(id_col).over(W.partitionBy("__key"))
    # NULL text never deduplicates: xxhash64(NULL) is a CONSTANT (the
    # seed), so without the guard every null-text row in the corpus
    # would silently collapse into one survivor
    return (
        df.withColumn("__key", key)
        .withColumn("__keep", c.isNull() | (keeper == F.col(id_col)))
        .filter(F.col("__keep"))
        .drop("__key", "__keep")
    )


def lsh_band_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    hash_fn: str = POLY64_DEFAULT,
    rescue_starved: bool = True,
) -> DataFrame:
    """(id, band-bucket hash) pairs via one-permutation MinHash — the
    relational formulation built for scale.

    Naive MinHash evaluates ``num_hashes`` hash functions per shingle —
    as nested array lambdas that work runs in Spark's *interpreted*
    higher-order-function path, num_hashes× per shingle (measured ~100×
    slower than codegen). Instead:

    1. EXPLODE shingles → one row per (doc, shingle); hash once with
       ``xxhash64`` in a codegen'd projection.
    2. One-permutation hashing (Li et al., NIPS 2012): partition hash
       space by ``h mod num_hashes``; the signature slot i is the min
       hash among shingles with residue i. ONE pass, one hash per
       shingle — a plain groupBy(doc, slot).min with map-side partial
       aggregation.
    3. Band bucket = hash of the band's (slot, min) pairs, sorted —
       an exact band-slice match, same S-curve as classic (b, r) LSH.
       Empty slots (rare for docs with ≫ num_hashes shingles) simply
       shorten the band key deterministically.

    Everything stays in whole-stage codegen; the only shuffles move
    (doc_id, slot/band, long) tuples, never text.

    ``hash_fn="poly64"`` (the DEFAULT since round 8) routes to the
    Arrow-batched kernel (operators/grams.lsh_band_buckets_poly): the
    whole signature is computed per document inside the batch, so the
    only rows that ever shuffle are the (id, band bucket) outputs —
    O(docs × bands), not O(shingles). Also DuckDB-replayable. The
    relational forms (``xxhash64``/``md5_60``) remain as the JVM-only
    path for sessions without Python workers and for the oracle mirror.
    """
    rows_per_band = num_hashes // bands
    if rows_per_band * bands != num_hashes:
        raise ValueError("num_hashes must be divisible by bands")
    _note_default_hash_fn(hash_fn)
    if hash_fn == "poly64":
        from meds_transforms_spark.operators.grams import lsh_band_buckets_poly

        return lsh_band_buckets_poly(
            df, text_col, id_col, num_hashes, bands, shingle_k,
            rescue_starved=rescue_starved,
        )
    # Shingle in codegen, not via array HOFs: explode position ranges,
    # then substring+hash as plain projections. Duplicate shingles are
    # harmless (they can't change a per-slot minimum), so no distinct.
    #
    # Two-level chunked explode: a direct per-position explode makes
    # every generated row carry the FULL document text (O(len²) bytes
    # through the generate output). Splitting into ~64-char chunks with
    # a (k-1)-char overlap first means position rows carry ≤ 68 bytes —
    # measured 1.6× on the sf0.1 bench, and the gap widens with doc
    # length. Chunk boundaries produce the identical shingle stream:
    # chunk c covers global positions [c·CH+1, c·CH+CH], the overlap
    # supplies the cross-boundary shingles, and the last chunk is
    # always ≥ k chars (or the whole text when len < k).
    chunk = 64
    norm = _normalized(F.col(text_col))
    n_chunks = F.greatest(
        F.floor((F.length("__txt") - F.lit(shingle_k)) / F.lit(chunk)).cast("int"),
        F.lit(0),
    )
    exploded = (
        # NULL-text docs get NO bucket rows here (not just in
        # minhash_lsh_dedup's outer guard): a NULL text hashes to one
        # shared degenerate bucket, so an unguarded consumer — the
        # incremental dedup index was one — would treat every NULL doc
        # as a near-duplicate of every other.
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), norm.alias("__txt"))
        .select(
            F.col(id_col),
            F.col("__txt"),
            F.explode(F.sequence(F.lit(0), n_chunks)).alias("__c"),
        )
        .select(
            F.col(id_col),
            F.col("__txt")
            .substr(F.col("__c") * chunk + 1, F.lit(chunk + shingle_k - 1))
            .alias("__chunk"),
            F.col("__c"),
        )
        # empty docs keep their single empty shingle via the c=0 chunk
        .filter((F.length("__chunk") > 0) | (F.col("__c") == 0))
        .select(
            F.col(id_col),
            F.col("__chunk"),
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.length("__chunk") - F.lit(shingle_k - 1), F.lit(1)),
                )
            ).alias("__i"),
        )
        .select(
            F.col(id_col),
            _h64(hash_fn, F.col("__chunk").substr(F.col("__i"), F.lit(shingle_k))).alias("__h"),
        )
    )
    slots = (
        exploded.groupBy(id_col, F.pmod("__h", F.lit(num_hashes)).alias("__slot"))
        .agg(F.min("__h").alias("__mh"))
    )
    # Band fold WITHOUT collect_list: one conditional min per in-band
    # slot position keeps the aggregation in whole-stage-codegen hash
    # agg. The original collect_list(struct) form compiled to
    # ObjectHashAggregateExec, whose 128-group in-memory threshold
    # degrades to sort-based aggregation with per-group object
    # overhead — measured round 8 as a heap-OOM death spiral at a mere
    # 4M (doc, band) groups under 16 GB local-cluster executors.
    # Equivalence: slots within a band are band·r+0..r-1, each present
    # at most once, so ordering by (slot mod r) == ordering by slot,
    # and concat_ws skips the NULLs of absent slots exactly as the
    # sorted collect_list skipped missing entries.
    in_band = [
        F.min(
            F.when(F.pmod("__slot", F.lit(rows_per_band)) == i, F.col("__mh"))
        ).alias(f"__m{i}")
        for i in range(rows_per_band)
    ]
    return (
        slots.withColumn("__band", F.expr(f"__slot div {rows_per_band}"))
        .groupBy(id_col, "__band")
        .agg(*in_band)
        .select(
            F.col(id_col),
            _h64(
                hash_fn,
                F.col("__band"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"__m{i}").cast("string")
                        for i in range(rows_per_band)
                    ],
                ),
            ).alias("__bucket"),
        )
    )


def minhash_signature(col: Column, num_hashes: int = 32, shingle_k: int = 5) -> Column:
    """Classic per-seed MinHash signature as a column expression.

    NOTE: interpreted-HOF cost is O(num_hashes × shingles) per row —
    fine for small frames and tests; the scale path is
    ``lsh_band_buckets`` (relational one-permutation hashing).
    """
    sh = char_shingles(col, k=shingle_k)
    hashed = F.transform(sh, lambda s: F.xxhash64(s))
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda seed: F.coalesce(
            F.array_min(F.transform(hashed, lambda h: F.xxhash64(seed, h))),
            F.lit(0).cast("long"),
        ),
    )


@register_stage("minhash_lsh_dedup")
def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    hash_fn: str = POLY64_DEFAULT,
    rescue_starved: bool = True,
) -> DataFrame:
    """Near-dedup: docs sharing any LSH band bucket collapse to the
    bucket's min id (1-hop representative — the standard at-scale
    approximation of full connected components).

    Representative selection is a window min over the bucket (one
    shuffle of (id, bucket) longs) followed by a per-doc min — no
    join-back against the bucket table."""
    from pyspark.sql import Window as W

    # NULL-text docs produce a shared degenerate (empty-signature)
    # bucket and would all collapse into one — they are not candidates
    # at all; bucket the non-null side and pass nulls through
    with_text = df.filter(F.col(text_col).isNotNull())
    buckets = lsh_band_buckets(
        with_text, text_col, id_col, num_hashes, bands, shingle_k, hash_fn,
        rescue_starved=rescue_starved,
    )
    with_rep = buckets.withColumn(
        "__rep", F.min(id_col).over(W.partitionBy("__bucket"))
    )
    doc_rep = with_rep.groupBy(id_col).agg(F.min("__rep").alias("__rep"))
    survivors = doc_rep.filter(F.col(id_col) == F.col("__rep")).select(id_col)
    return with_text.join(survivors, id_col, "left_semi").unionByName(
        df.filter(F.col(text_col).isNull())
    )


SIMHASH_BITS = 63  # ≤63: Spark 4 ANSI mode errors on LongType overflow


def simhash_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, simhash) via the relational formulation.

    bit b of the signature = sign of Σ_tokens (2·bit_b(hash(token)) − 1).
    Explode tokens, hash once (codegen), then ONE hash-aggregation with
    one ``sum(getbit(h, b)·2−1)`` column per bit — no interpreted
    lambdas, and map-side partial aggregation means the shuffle carries
    one bit-sum row per doc per map partition. Packing is a plain
    projection of shifted sign bits.

    ``hash_fn="md5_60"`` yields a 60-bit signature whose token hashes
    are engine-independent, enabling a full-pipeline DuckDB oracle.
    """
    bits = 60 if hash_fn == "md5_60" else SIMHASH_BITS
    toks = F.filter(F.split(_normalized(F.col(text_col)), r"\s+"), lambda t: t != "")
    # explode_outer: zero-token docs must still receive a signature
    # (all-zero) rather than silently vanishing from the output.
    exploded = df.select(F.col(id_col), F.explode_outer(toks).alias("__t")).select(
        F.col(id_col),
        F.when(F.col("__t").isNotNull(), _h64(hash_fn, F.col("__t"))).alias("__h"),
    )
    bit_sums = exploded.groupBy(id_col).agg(
        *[
            F.sum(F.getbit("__h", F.lit(b)) * 2 - 1).alias(f"__b{b}")
            for b in range(bits)
        ]
    )
    packed = None
    for b in range(bits):
        term = F.when(
            F.col(f"__b{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        packed = term if packed is None else packed + term
    return bit_sums.select(F.col(id_col), packed.alias("simhash"))


@register_stage("simhash_dedup")
def simhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    band_bits: int = 16,
) -> DataFrame:
    """Near-dedup on simhash: docs sharing any ~16-bit band collapse
    (pigeonhole: catches all pairs within Hamming distance n_bands−1).

    NULL-text docs all carry the zero signature and would collapse into
    one — like minhash, they bypass signatures and pass through."""
    with_text = df.filter(F.col(text_col).isNotNull())
    sig = simhash_table(with_text, text_col, id_col)
    n_bands = (SIMHASH_BITS + band_bits - 1) // band_bits
    mask = (1 << band_bits) - 1
    buckets = sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b),
                        F.shiftrightunsigned("simhash", b * band_bits).bitwiseAND(
                            F.lit(mask)
                        ),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("__bucket"),
    )
    from pyspark.sql import Window as W

    with_rep = buckets.withColumn(
        "__rep", F.min(id_col).over(W.partitionBy("__bucket"))
    )
    doc_rep = with_rep.groupBy(id_col).agg(F.min("__rep").alias("__rep"))
    survivors = doc_rep.filter(F.col(id_col) == F.col("__rep")).select(id_col)
    return with_text.join(survivors, id_col, "left_semi").unionByName(
        df.filter(F.col(text_col).isNull())
    )


@register_stage("ngram_jaccard_pairs")
def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    use_lsh_candidates: bool = True,
    num_hashes: int = 32,
    bands: int = 8,
    max_gram_df: int | None = 10_000,
    impl: str = "arrow",
) -> DataFrame:
    """(id_a, id_b, jaccard) pairs above threshold (id_a < id_b), exact
    word-n-gram Jaccard computed relationally (see inline notes).

    ``impl="arrow"`` (default) draws the per-doc DISTINCT gram stream
    from the poly64 kernel (operators/grams.word_ngram_hashes_poly):
    the co-occurrence join and the df-guard window operate on 64-bit
    hashes, so gram TEXT never reaches an exchange — at 100 TB the
    dominant shuffle shrinks from O(gram bytes) to 16-byte rows.
    ``impl="expr"`` keeps the pure-Catalyst gram-string form (equal
    results modulo 64-bit hash collisions).

    ``use_lsh_candidates`` further restricts output to MinHash-LSH
    bucket-sharing pairs; ``max_gram_df`` caps the document frequency of
    grams entering the co-occurrence join — a gram appearing in d docs
    contributes d² join rows, so one boilerplate n-gram shared by 1M
    docs would alone produce 10¹² rows. The guard defaults ON
    (10,000): grams more common than that carry ~zero discrimination,
    and both the intersection AND the per-doc gram-set sizes are
    computed post-filter, so the reported jaccard is over the filtered
    gram universe (a hot gram present in both docs no longer inflates
    either side). Recall effect: a pair whose overlap is carried ONLY
    by ultra-common grams can drop below threshold. Pass ``None`` for
    the exact quadratic computation.
    """
    if threshold <= 0:
        raise ValueError(
            "threshold must be > 0 (zero-overlap pairs are never emitted)"
        )
    # Relational formulation: |A∩B| via a gram equi-join co-occurrence
    # count — no per-pair array intersections (array HOFs run
    # interpreted), and only pairs sharing ≥1 gram ever materialize,
    # which is exactly the support of jaccard > 0.
    if impl == "arrow":
        from meds_transforms_spark.operators.grams import word_ngram_hashes_poly

        # per-doc distinct by construction; token-less/NULL docs emit
        # no rows — the same outcome the '' filter below gives the
        # expr path ("NULL text never deduplicates").
        grams = word_ngram_hashes_poly(
            df, n=n, text_col=text_col, id_col=id_col, out_col="__g"
        )
    else:
        # word_ngrams_of already array_distincts per doc, so the
        # explode emits unique (id, gram) rows — a dropDuplicates here
        # would re-shuffle the gram stream (the plan's largest frame)
        # for nothing
        grams = df.select(
            F.col(id_col), word_tokens(F.col(text_col)).alias("__toks")
        ).select(
            F.col(id_col), F.explode(word_ngrams_of(F.col("__toks"), n)).alias("__g")
        ).filter(
            # word_ngrams_of's short-doc fallback emits one degenerate
            # '' gram for NULL/empty token arrays — without this filter
            # every NULL/whitespace-only doc pairs with every other one
            # at jaccard=1.0 ("NULL text never deduplicates", the
            # module contract exact_dedup/minhash/simhash all honor).
            F.col("__g") != ""
        )
    if max_gram_df is not None:
        # Drop ultra-common grams: a gram in d docs contributes d² join
        # rows but almost no discrimination. EXACT results require None.
        from pyspark.sql import Window as W

        grams = (
            grams.withColumn("__df", F.count(F.lit(1)).over(W.partitionBy("__g")))
            .filter(F.col("__df") <= int(max_gram_df))
            .drop("__df")
        )
    sizes = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("__sz"))
    a = grams.select(F.col(id_col).alias("id_a"), "__g")
    b = grams.select(F.col(id_col).alias("id_b"), "__g")
    inter = (
        a.join(b, "__g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    if use_lsh_candidates:
        buckets = lsh_band_buckets(df, text_col, id_col, num_hashes, bands)
        cand = (
            buckets.select(F.col(id_col).alias("id_a"), "__bucket")
            .join(buckets.select(F.col(id_col).alias("id_b"), "__bucket"), "__bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
        inter = inter.join(cand, ["id_a", "id_b"], "left_semi")
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("__sz").alias("__sa"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("__sz").alias("__sb"))
    jac = F.col("__inter") / (F.col("__sa") + F.col("__sb") - F.col("__inter"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", jac.cast("double"))
        .filter(F.col("jaccard") >= float(threshold))
        .select("id_a", "id_b", "jaccard")
    )


@register_stage("embedding_cosine_dedup")
def embedding_cosine_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    num_planes: int = 16,
    exact: bool = False,
    pair_impl: str = "gram",
) -> DataFrame:
    """Near-dup removal by embedding cosine within random-hyperplane LSH
    buckets: same-bucket pairs with cosine ≥ threshold collapse to the
    min id. Hyperplanes are deterministic pseudo-random (hash-derived),
    so the operator needs no fitted model state.

    ``exact=True`` switches to the engine-reproducible formulation
    (``hyperplane_bucket_exact``'s md5-derived ±1 planes, and the
    cosine threshold decided in INTEGER arithmetic): components are
    quantized ``floor(x·10⁴ + 0.5)``, and ``cos ≥ t`` becomes
    ``dot > 0 ∧ 10⁴·dot² ≥ round(t²·10⁴)·‖a‖²·‖b‖²`` over exact
    decimals — every engine picks the identical survivor set, so the
    operator is DuckDB-oracle-checkable end to end. Quantization is
    part of the exact mode's definition (near-dup thresholds are
    approximate by nature; 1e-4 per-component wobble only moves pairs
    sitting exactly on the threshold).
    """
    from meds_transforms_spark.operators.similarity import (
        hyperplane_bucket,
        hyperplane_bucket_exact,
    )

    # filter-then-limit keeps CollectLimit's incremental partition scan
    # (an agg(first(...)) would scan the whole corpus just for the dim)
    # while still skipping NULL vectors in whatever row comes first
    probe = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.size(vec_col).alias("d"))
        .limit(1)
        .collect()
    )
    if not probe or probe[0]["d"] is None:
        return df  # empty/all-null input: nothing to dedup, no dim to probe
    dim = probe[0]["d"]
    if exact:
        bucketed = df.withColumn(
            "__bucket", hyperplane_bucket_exact(F.col(vec_col), dim, num_planes)
        )
    else:
        from meds_transforms_spark.operators.similarity import l2_norm

        # Materialize the norm into a COLUMN before the per-component
        # divide: Catalyst does no CSE inside HOF lambdas, so the
        # single-expression l2_normalize re-evaluates the O(d) norm
        # aggregate once PER COMPONENT — O(d²) per row (the measured
        # HOF-CSE pitfall, SCALING.md). Same floats, one norm eval.
        bucketed = (
            df.withColumn("__vn", l2_norm(F.col(vec_col)))
            .withColumn(
                "__bucket",
                hyperplane_bucket(
                    F.when(
                        F.col("__vn") > 0,
                        F.transform(F.col(vec_col), lambda v: v / F.col("__vn")),
                    ),
                    dim,
                    num_planes,
                ),
            )
            .drop("__vn")
        )
    return _cosine_dedup_within(
        bucketed, df, vec_col, id_col, threshold, exact, pair_impl
    )


def _gram_dropped_exact(base: DataFrame, id_col: str, t2: int) -> DataFrame:
    """Dropped ids of the exact-mode pair stage via ONE per-bucket Gram
    matmul (round-11, guide §8 "move big rows once"): the bucket
    self-join form materializes O(Σ n_b²) pair rows each carrying BOTH
    quantized vectors, and evaluates an interpreted per-pair fold over
    every one; here each vector crosses one exchange ONCE
    (groupBy(__bucket).applyInPandas) and the within-bucket dot matrix
    is one int64 matmul per column chunk.

    BIT-IDENTICAL to the interpreted plan by construction:

    - integer addition is order-independent, so the matmul's
      ``Σ qa_i·qb_i`` IS the ``aggregate(zip_with(...))`` fold value
      wherever the fold is defined; the fast path is guarded by
      ``max|q|²·dim < 2⁶³`` (beyond it the whole bucket replays in
      Python ints and raises on a product/sum outside int64 — the
      ANSI overflow error the interpreted fold would raise);
    - fold-NULL rows are INERT exactly as in the plan: a NULL array, a
      NULL element (zip_with → NULL product → NULL fold), or a length
      mismatch (zip_with pads → NULL) makes every pair's ``__dot``
      NULL → both filter conjuncts false → the row neither drops nor
      is dropped; empty arrays fold to the init 0 → ``__dot > 0``
      false → inert;
    - the threshold ``10⁴·dot² ≥ t2·‖a‖²·‖b‖²`` (decimal(38,0) in the
      plan — exceeds int64) is decided in float64 ONLY when the two
      sides differ by > 1e-9 relative (float error ≤ ~1e-15 relative:
      6 orders of safety); border candidates re-decide in exact Python
      ints;
    - ``id_a < id_b`` via first-occurrence ranks over the id-sorted
      bucket (strict: duplicate id values never pair, as in the plan).

    Skew: a hot bucket is ONE task here (no AQE pair-join split), but
    the working set is chunked to O(m·4M) Gram cells, and both callers
    bound bucket size by construction (semantic cells ∝ N; hyperplane
    buckets). Memory per task stays O(bucket vectors + one chunk)."""
    import numpy as np
    import pandas as pd

    id_ddl = base.select(id_col).schema[0].dataType.simpleString()
    src = base.select(id_col, "__bucket", "__q", "__n2")
    T2 = int(t2)
    CHUNK_CELLS = 4 << 20
    DEC_MAX = 10**38  # Decimal(38,0) capacity — the plan's ANSI limit

    def exact_cond(dot: int, na: int, nb: int) -> bool:
        """Exact replay of ``__dot > 0 AND dot²·10⁴ ≥ t2·na·nb`` in
        decimal(38,0) — INCLUDING the ANSI overflow raise the plan
        throws when an intermediate product exceeds Decimal(38,0)
        (evaluated only when ``__dot > 0``, matching the conjunction's
        short-circuit)."""
        if dot <= 0:
            return False
        sq = dot * dot
        if sq >= DEC_MAX:
            raise ArithmeticError(
                f"{sq} cannot be represented as Decimal(38, 0) (ANSI)"
            )
        lhs = sq * 10_000
        if lhs >= DEC_MAX:
            raise ArithmeticError(
                f"{lhs} cannot be represented as Decimal(38, 0) (ANSI)"
            )
        r1 = T2 * na
        if r1 >= DEC_MAX:
            raise ArithmeticError(
                f"{r1} cannot be represented as Decimal(38, 0) (ANSI)"
            )
        rhs = r1 * nb
        if rhs >= DEC_MAX:
            raise ArithmeticError(
                f"{rhs} cannot be represented as Decimal(38, 0) (ANSI)"
            )
        return lhs >= rhs

    def slow_bucket(ids, qs, n2s):
        """Exact per-pair replay (Python ints) — pathological buckets
        only (weird dtypes or int64-unsafe magnitudes)."""
        out = set()
        m = len(ids)
        cand = []
        for i in range(m):
            q = qs[i]
            if q is None or n2s[i] is None:
                continue
            if ids[i] is None or (
                isinstance(ids[i], float) and ids[i] != ids[i]
            ):
                continue  # NULL id: inert (id_a < id_b is NULL)
            q = list(q)
            if any(x is None or (isinstance(x, float) and x != x) for x in q):
                continue
            cand.append((i, [int(x) for x in q]))
        for ai in range(len(cand)):
            i, qa = cand[ai]
            for bj in range(len(cand)):
                j, qb = cand[bj]
                if ids[i] == ids[j] or len(qa) != len(qb):
                    continue
                acc = 0
                for x, y in zip(qa, qb):
                    p = x * y
                    if not (-(1 << 63) <= p < (1 << 63)):
                        raise ArithmeticError("pair dot: long overflow (ANSI)")
                    acc += p
                    if not (-(1 << 63) <= acc < (1 << 63)):
                        raise ArithmeticError("pair dot: long overflow (ANSI)")
                if exact_cond(acc, int(n2s[i]), int(n2s[j])):
                    out.add(max(ids[i], ids[j]))
        return out

    def process(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        ids = pdf[id_col].tolist()
        qs = pdf["__q"].tolist()
        n2s = [None if pd.isna(v) else int(v) for v in pdf["__n2"].tolist()]
        groups: dict[int, list[int]] = {}
        weird = False
        for i in range(m):
            q, n2 = qs[i], n2s[i]
            if q is None or n2 is None:
                continue  # fold-NULL row: inert
            if ids[i] is None or (
                isinstance(ids[i], float) and ids[i] != ids[i]
            ):
                continue  # NULL id: id_a < id_b is NULL → inert
            arr = np.asarray(q)
            if arr.dtype.kind not in "iu":
                if arr.dtype.kind == "f" and np.isnan(arr).any():
                    continue  # NULL element → NULL fold: inert
                weird = True  # shouldn't happen for array<long>; replay
                break
            if len(arr) == 0:
                continue  # fold init 0, never > 0: inert
            groups.setdefault(len(arr), []).append(i)
        dropped: set = set()
        if weird:
            dropped = slow_bucket(ids, qs, n2s)
        else:
            for dim, idx in groups.items():
                if len(idx) < 2:
                    continue
                sub_ids = [ids[i] for i in idx]
                order = sorted(range(len(idx)), key=lambda k: sub_ids[k])
                idx = [idx[k] for k in order]
                sid = [sub_ids[k] for k in order]
                # first-occurrence rank: strict id order (dup ids tie)
                ranks = np.empty(len(idx), dtype=np.int64)
                r = -1
                for k in range(len(idx)):
                    if k == 0 or sid[k] != sid[k - 1]:
                        r = k
                    ranks[k] = r
                Q = np.stack([np.asarray(qs[i], dtype=np.int64) for i in idx])
                n2v = np.array([n2s[i] for i in idx], dtype=np.int64)
                mx = int(np.abs(Q).max()) if Q.size else 0
                if mx and mx * mx * dim >= (1 << 63):
                    dropped |= slow_bucket(
                        [ids[i] for i in idx],
                        [qs[i] for i in idx],
                        [n2s[i] for i in idx],
                    )
                    continue
                mm = len(idx)
                chunk = max(1, CHUNK_CELLS // mm)
                nfa = n2v.astype(np.float64)
                hit = np.zeros(mm, dtype=bool)
                for c0 in range(0, mm, chunk):
                    cols = slice(c0, min(c0 + chunk, mm))
                    G = Q @ Q[cols].T  # int64 exact under the bound
                    pos = G > 0
                    dotf = G.astype(np.float64)
                    lhs = dotf * dotf * 1e4
                    rhs = float(T2) * nfa[:, None] * nfa[cols][None, :]
                    cond = pos & (lhs >= rhs)
                    # exact-replay set: float-border candidates AND
                    # anything within float error of the Decimal(38,0)
                    # capacity (exact_cond raises there, mirroring the
                    # plan's ANSI overflow)
                    border = pos & (
                        (np.abs(lhs - rhs) <= 1e-9 * np.maximum(lhs, rhs))
                        | (lhs >= 9.999e37)
                        | (rhs >= 9.999e37)
                    )
                    if border.any():
                        bi, bj = np.nonzero(border)
                        for i_, j_ in zip(bi, bj):
                            cond[i_, j_] = exact_cond(
                                int(G[i_, j_]),
                                int(n2v[i_]),
                                int(n2v[c0 + j_]),
                            )
                    # j dropped ⟺ ∃ i with rank_i < rank_j and cond
                    lt = ranks[:, None] < ranks[cols][None, :]
                    hit[cols] |= (cond & lt).any(axis=0)
                dropped |= {sid[k] for k in np.flatnonzero(hit)}
        return pd.DataFrame({id_col: sorted(dropped)})

    return src.groupby("__bucket").applyInPandas(
        process, schema=f"`{id_col}` {id_ddl}"
    )


def _cosine_dedup_within(
    bucketed: DataFrame,
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    exact: bool,
    pair_impl: str = "expr",
) -> DataFrame:
    """Shared core of embedding_cosine_dedup / semantic_dedup: within
    each ``__bucket`` of ``bucketed``, pairs with cosine ≥ threshold
    collapse to the min id; survivors are returned from ``df``.

    The bucket (LSH band or semantic cluster) bounds the self-join:
    work is Σ_bucket n_b² — never corpus², and the AQE skew-join splits
    any hot bucket.

    ``pair_impl`` selects the exact-mode pair engine: ``"expr"`` the
    bucket self-join + interpreted per-pair fold, ``"gram"`` the
    bit-identical per-bucket Gram matmul
    (:func:`_gram_dropped_exact`)."""
    from meds_transforms_spark.operators.similarity import cosine_similarity

    if exact:
        QUANT = 10_000
        qvec = F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * QUANT + F.lit(0.5)).cast("long"),
        )
        norm2 = lambda q: F.aggregate(  # noqa: E731
            q, F.lit(0).cast("long"), lambda acc, v: acc + v * v
        )
        base = bucketed.withColumn("__q", qvec).withColumn(
            "__n2", norm2(F.col("__q"))
        )
        t2 = int(round(threshold * threshold * 10_000))
        if pair_impl == "gram":
            dropped = _gram_dropped_exact(base, id_col, t2).localCheckpoint(
                eager=False
            )
            return df.join(dropped, id_col, "left_anti")
        a = base.select(
            F.col(id_col).alias("id_a"), F.col("__q").alias("__qa"),
            F.col("__n2").alias("__na"), "__bucket",
        )
        b = base.select(
            F.col(id_col).alias("id_b"), F.col("__q").alias("__qb"),
            F.col("__n2").alias("__nb"), "__bucket",
        )
        dot = F.aggregate(
            F.zip_with(F.col("__qa"), F.col("__qb"), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        dec = "decimal(38,0)"
        pairs = (
            a.join(b, "__bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("__dot", dot)
            .filter(
                (F.col("__dot") > 0)
                & (
                    F.col("__dot").cast(dec) * F.col("__dot").cast(dec) * F.lit(10_000)
                    >= F.lit(t2).cast(dec) * F.col("__na").cast(dec) * F.col("__nb").cast(dec)
                )
            )
        )
    else:
        from meds_transforms_spark.operators.similarity import l2_norm

        # norm as a column, divide in the lambda — NOT l2_normalize's
        # single-expression form, whose captured norm aggregate
        # re-evaluates per component (O(d²)/row; HOF-CSE pitfall)
        normed = (
            bucketed.withColumn("__vn", l2_norm(F.col(vec_col)))
            .withColumn(
                "__nvec",
                F.when(
                    F.col("__vn") > 0,
                    F.transform(F.col(vec_col), lambda v: v / F.col("__vn")),
                ),
            )
            .drop("__vn")
        )
        a = normed.select(F.col(id_col).alias("id_a"), F.col("__nvec").alias("__va"), "__bucket")
        b = normed.select(F.col(id_col).alias("id_b"), F.col("__nvec").alias("__vb"), "__bucket")
        pairs = (
            a.join(b, "__bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cos", cosine_similarity(F.col("__va"), F.col("__vb"), assume_normalized=True))
            .filter(F.col("cos") >= float(threshold))
        )
    # Collapse: every id_b similar to a smaller id_a is dropped.
    # Pin the (id-only) dropped set with a GC-released lazy
    # localCheckpoint (round-11): when ``df`` is a Union (e.g. corpus +
    # augmentation), the optimizer pushes the anti-join below the
    # union, and each branch rebuilds the ENTIRE pair pipeline — the
    # per-pair cosine stage (the measured bulk of the query: 2×~1.4 s
    # cpu of emb_semantic_dedup's 2.2 s wall at sf0.1) executed once
    # per branch with no exchange reuse. The checkpoint truncates the
    # lineage so every consumer reads the same computed-once id
    # blocks. NOT a broadcast: the dropped set is duplicate-count-
    # sized — unbounded at 100 TB — while checkpoint blocks stay
    # distributed.
    dropped = (
        pairs.select(F.col("id_b").alias(id_col))
        .dropDuplicates()
        .localCheckpoint(eager=False)
    )
    return df.join(dropped, id_col, "left_anti")


@register_stage("semantic_dedup")
def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    iters: int = 0,
    threshold: float = 0.9,
    exact: bool = False,
    assign: str = "hof",
    pair_impl: str = "gram",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space with k-means, then remove near-duplicates WITHIN
    each cluster — semantically redundant documents land in the same
    cell, so the pairwise cosine check runs over cluster-sized groups
    instead of hyperplane buckets (which only catch near-identical
    directions) or the full corpus.

    Plan: centroids come from :func:`~meds_transforms_spark.operators.
    ivf.kmeans_refine` (``iters=0`` → the deterministic seed rows —
    the engine-reproducible mode the oracle replays); assignment is a
    broadcast of ``n_cells`` rows against one corpus scan (no corpus
    shuffle); the within-cell pair join + min-id collapse is the same
    Σ n_cell² machinery as :func:`embedding_cosine_dedup`, with AQE
    splitting any skewed cell. ``exact=True`` uses the integer-exact
    cosine threshold so every engine keeps the identical survivor set.

    SemDeDup keeps one representative per near-dup group; this
    implementation keeps the min id (deterministic, join-free).

    Granularity caveat: keep ``n_cells`` well below the corpus size —
    in the degenerate regime where a near-dup pair are BOTH seed
    centroids (iters=0 on a tiny frame) they anchor separate cells and
    are never compared. Real corpora use n_cells ≪ N (SemDeDup's own
    setting: ~100k clusters for 100M+ docs). And n_cells must GROW
    with N: fixed cells mean linearly growing cells and quadratically
    growing within-cell pair volume (measured super-linear in
    SCALING.md round-6; n_cells ∝ N restores linear wall).

    ``assign`` picks the cell-assignment engine: ``"hof"`` (default)
    is the interpreted per-pair dot product the DuckDB oracle replays
    bit-for-bit; ``"arrow"`` is one BLAS matmul per Arrow batch
    (:func:`~meds_transforms_spark.operators.ivf.assign_cells_arrow`)
    — the scale path once n_cells is large (measured ~40× on the
    assignment pass), identical up to float-summation-order ties.
    """
    from meds_transforms_spark.operators.ivf import (
        assign_cells_arrow,
        assign_cells_exact,
        ivf_centroids,
        kmeans_refine,
    )

    if assign not in ("hof", "arrow"):
        raise ValueError(f"semantic_dedup: unknown assign={assign!r}")
    cents = (
        kmeans_refine(df, n_cells, iters, id_col, vec_col, assign=assign)
        if iters > 0
        else ivf_centroids(df, n_cells, id_col, vec_col)
    )
    if assign == "arrow":
        assigned = assign_cells_arrow(df, cents, id_col, vec_col).withColumn(
            "__bucket", F.col("__cell")
        )
    else:
        # "hof" SEMANTICS served by the fold-order-preserving Arrow
        # kernel (round-10): assign_cells_exact replays the interpreted
        # dot/norm/ranking expressions operation-for-operation (see its
        # docstring), so the assignment is bit-identical to the old
        # _nearest_cells plan — while the O(N·n_cells·dim) interpreted
        # lambda evaluations (~16M at sf0.1, the measured bulk of the
        # assignment stage) become dim vectorized numpy FMAs per batch.
        # Pinned by tests/test_more_operators.py::
        # test_assign_cells_exact_matches_hof.
        assigned = assign_cells_exact(df, cents, id_col, vec_col).withColumn(
            "__bucket", F.col("__cell")
        )
    # The pair self-join consumes the assignment subtree twice (sides
    # a/b don't canonicalize into one ReusedExchange), which would run
    # the scan + broadcast-nearest-cell assignment twice. Pin the
    # minimal (id, vec, bucket) projection so assignment executes once.
    # persist(), MEASURED against localCheckpoint here: the columnar
    # DataFrame cache reads the float-vector column back vectorized
    # (3.1 s cold at sf0.1) where checkpoint's row-serialized RDD
    # blocks cost more than the recomputation they save (4.2 s, worse
    # than no pin). Cache entries are LRU-evictable; accepted tradeoff
    # for the hot path. The gram pair engine consumes the assignment
    # exactly ONCE (the dropped set is checkpointed), so the pin would
    # be pure overhead there — skip it.
    assigned = assigned.select(id_col, vec_col, "__bucket")
    if not (exact and pair_impl == "gram"):
        assigned = assigned.persist()
    return _cosine_dedup_within(
        assigned, df, vec_col, id_col, threshold, exact, pair_impl
    )


@register_stage("keep_latest")
def keep_latest(
    df: DataFrame,
    key_cols: list[str] | str,
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Version dedup: one row per key — the freshest by ``ts_col``.

    The re-crawl/CDC curation primitive (a URL fetched monthly, a
    record upserted repeatedly): ``row_number`` over the key partition
    ordered by (ts DESC, tiebreaks DESC) — ONE shuffle on the key, no
    join-back. NULL timestamps sort last (a dated version always beats
    an undated one). Supply ``tiebreak_cols`` for a total order when
    timestamps can tie; without them ties resolve arbitrarily (but
    deterministically within a fixed partitioning only).
    """
    from pyspark.sql import Window as W

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = [F.col(ts_col).desc_nulls_last()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
