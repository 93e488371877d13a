"""Tests for the large-scale training-data extension operators."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs away fast", "en"),
        (2, "the quick brown fox jumps over the lazy dog and runs away fast", "en"),  # exact dup
        (3, "the quick brown fox jumps over the lazy dog and runs away slow", "en"),  # near dup
        (4, "completely different content about spark query engines and data", "en"),
        (5, "der hund und die katze sind nicht mit der maus", "de"),
        (6, "", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup(docs):
    from meds_transforms_spark.operators.dedup import exact_dedup

    out = exact_dedup(docs)
    ids = {r.doc_id for r in out.collect()}
    assert 2 not in ids  # dup of 1, min id wins
    assert ids == {1, 3, 4, 5, 6}


def test_minhash_collapses_near_dups(docs):
    from meds_transforms_spark.operators.dedup import minhash_lsh_dedup

    out = minhash_lsh_dedup(docs, num_hashes=16, bands=8)
    ids = {r.doc_id for r in out.collect()}
    assert 2 not in ids  # exact dup always collapses
    assert 4 in ids and 5 in ids  # unrelated docs survive


def test_simhash_table_deterministic(docs):
    from meds_transforms_spark.operators.dedup import simhash_table

    a = {r.doc_id: r.simhash for r in simhash_table(docs).collect()}
    b = {r.doc_id: r.simhash for r in simhash_table(docs).collect()}
    assert a == b
    assert a[1] == a[2]  # identical text → identical signature
    assert a[1] >= 0  # 63-bit pack stays positive
    # near-dup docs: small Hamming distance
    ham = bin(a[1] ^ a[3]).count("1")
    assert ham <= 16


def test_ngram_jaccard_pairs(docs):
    from meds_transforms_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5, use_lsh_candidates=False)
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert got[(1, 2)] == 1.0
    assert (1, 3) in got and 0.5 <= got[(1, 3)] < 1.0


def test_ngram_jaccard_hot_gram_guard(spark):
    """max_gram_df (default ON) bounds the co-occurrence join: an
    n-gram shared by every doc would contribute n_docs² join rows, so
    it must be dropped before the self-join — pairs whose only overlap
    is the hot gram disappear; max_gram_df=None restores exactness."""
    from meds_transforms_spark.operators.dedup import ngram_jaccard_pairs

    hot = "the cookie banner"  # the one trigram every doc shares
    rows = [(i, f"{hot} w{i}a w{i}b w{i}c") for i in range(1, 7)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # Exact: every pair overlaps (on the hot gram, plus its two
    # boundary grams only within the same doc) → jaccard > 0.
    exact = ngram_jaccard_pairs(
        df, n=3, threshold=0.01, use_lsh_candidates=False, max_gram_df=None
    )
    assert exact.count() == 15  # all C(6,2) pairs survive

    # Guard at 3 (< 6 docs): the hot gram never enters the join, the
    # only shared gram is gone, so no pair has overlap at all.
    guarded = ngram_jaccard_pairs(
        df, n=3, threshold=0.01, use_lsh_candidates=False, max_gram_df=3
    )
    assert guarded.count() == 0


def test_brute_force_topk_self_match(spark):
    from meds_transforms_spark.operators.similarity import brute_force_topk

    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    out = brute_force_topk(emb, queries, k=1)
    got = {r.query_id: (r.vec_id, r.cos) for r in out.collect()}
    assert got[0][0] == 0 and math.isclose(got[0][1], 1.0)
    assert got[1][0] == 1


def test_language_id_und_on_empty(docs):
    from meds_transforms_spark.operators.text import language_id

    out = {r.doc_id: r.lang_pred for r in language_id(docs).collect()}
    assert out[6] == "und"
    assert out[1] == "en"
    assert out[5] == "de"


def test_fingerprint_normalization(spark):
    from meds_transforms_spark.operators.text import fingerprint

    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.fingerprint for r in fingerprint(df).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def _png_bytes(w: int, h: int) -> bytes:
    import struct as _s

    return (
        b"\x89PNG\r\n\x1a\n"
        + _s.pack(">I", 13)
        + b"IHDR"
        + _s.pack(">II", w, h)
        + b"\x08\x02\x00\x00\x00"
        + b"\x00" * 8
    )


def _jpeg_bytes(w: int, h: int) -> bytes:
    import struct as _s

    # SOI + APP0 stub + SOF0 segment carrying dimensions
    app0 = b"\xff\xe0" + _s.pack(">H", 4) + b"JF"
    sof0 = b"\xff\xc0" + _s.pack(">H", 11) + b"\x08" + _s.pack(">HH", h, w) + b"\x03"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _wav_bytes(sample_rate: int, channels: int, n_data: int) -> bytes:
    import struct as _s

    byte_rate = sample_rate * channels * 2
    return (
        b"RIFF" + _s.pack("<I", 36 + n_data) + b"WAVE"
        + b"fmt " + _s.pack("<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, channels * 2, 16)
        + b"data" + _s.pack("<I", n_data) + b"\x00" * n_data
    )


def test_decode_image_real_header_parse(spark):
    from meds_transforms_spark.operators.multimodal import decode_image

    rows = [
        (1, _png_bytes(640, 480)),
        (2, _jpeg_bytes(320, 200)),
        (3, b"not an image"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    by_id = {r.doc_id: r for r in decode_image(df).collect()}
    assert (by_id[1].media_type, by_id[1].width, by_id[1].height) == ("image/png", 640, 480)
    assert (by_id[2].media_type, by_id[2].width, by_id[2].height) == ("image/jpeg", 320, 200)
    assert by_id[3].media_type == "application/octet-stream"
    assert by_id[3].width is None
    assert len(by_id[1].features) == 8  # stub kernel, deterministic


def test_decode_image_real_png_pixels(spark):
    """Round-trip REAL pixel decode: encode known pixels to a valid PNG
    (testing.png, stdlib zlib), push through the decode_image
    mapInPandas path, and verify the feature vector equals the true
    pixel statistics — not the hash-based stub."""
    import numpy as np

    from meds_transforms_spark.operators.multimodal import (
        decode_image,
        decode_png_pixels,
    )
    from meds_transforms_spark.testing.png import encode_png

    # 2x2 RGB: red, green, blue, white
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    png = encode_png(px)

    # Pure-python decoder round-trips exactly (RGBA with opaque alpha).
    back = decode_png_pixels(png)
    assert back.shape == (2, 2, 4)
    assert (back[..., :3] == px).all() and (back[..., 3] == 255).all()

    gray = px.astype(np.float64).mean(axis=2) / 255.0
    df = spark.createDataFrame([(1, bytearray(png))], "doc_id long, payload binary")
    row = decode_image(df).collect()[0]
    assert (row.media_type, row.width, row.height) == ("image/png", 2, 2)
    f = row.features
    assert abs(f[0] - gray.mean()) < 1e-12  # gray mean
    assert abs(f[1] - gray.std()) < 1e-12  # gray std
    assert abs(f[4] - (255 + 0 + 0 + 255) / 4 / 255.0) < 1e-12  # R mean
    assert abs(f[7] - 1.0) < 1e-12  # alpha mean (opaque)

    # Grayscale + alpha path, and a filter-2 (Up) scanline exercised via
    # a taller image round-trip.
    ga = np.dstack([np.arange(12, dtype=np.uint8).reshape(3, 4) * 20,
                    np.full((3, 4), 128, dtype=np.uint8)])
    back2 = decode_png_pixels(encode_png(ga))
    assert (back2[..., 0] == ga[..., 0]).all() and (back2[..., 3] == 128).all()


def test_decode_png_pixels_all_filters():
    """The stdlib PNG decoder reverses every scanline filter type —
    verified by hand-building IDAT streams with filters 1..4."""
    import struct as st
    import zlib

    import numpy as np

    from meds_transforms_spark.operators.multimodal import decode_png_pixels
    from meds_transforms_spark.testing.png import _chunk

    h, w = 4, 5
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    # Forward-filter each row with a different type (1=Sub,2=Up,3=Avg,4=Paeth)
    stride = w * 3
    flat = px.reshape(h, stride).astype(int)
    raw = bytearray()
    for y in range(h):
        ftype = (y % 4) + 1
        raw.append(ftype)
        for x in range(stride):
            cur = flat[y][x]
            a = flat[y][x - 3] if x >= 3 else 0
            b = flat[y - 1][x] if y > 0 else 0
            c = flat[y - 1][x - 3] if (y > 0 and x >= 3) else 0
            if ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                pred = paeth(a, b, c)
            raw.append((cur - pred) & 0xFF)
    ihdr = st.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    back = decode_png_pixels(png)
    assert back is not None and (back[..., :3] == px).all()


def test_attach_media_meta_jvm_side(spark):
    from meds_transforms_spark.operators.multimodal import attach_media_meta

    rows = [
        (1, _png_bytes(800, 600)),
        (2, _wav_bytes(44100, 2, 44100 * 2 * 2)),  # 1 second stereo 16-bit
        (3, b"plain bytes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    # Header parsing is pure built-ins — assert no Python eval in the plan.
    out = attach_media_meta(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    by_id = {r.doc_id: r.media_meta for r in out.collect()}
    assert by_id[1]["media_type"] == "image/png"
    assert (by_id[1]["png_width"], by_id[1]["png_height"]) == (800, 600)
    assert by_id[2]["media_type"] == "audio/wav"
    assert by_id[2]["wav"]["sample_rate"] == 44100
    assert by_id[2]["wav"]["channels"] == 2
    assert abs(by_id[2]["wav"]["duration_sec"] - 1.0) < 0.01
    assert by_id[3]["media_type"] == "application/octet-stream"


def test_matcher_any_and_col_expr(spark):
    from meds_transforms_spark.functions.col_expr import parse_col_expr

    df = spark.createDataFrame([("A", "x1"), (None, "y22")], "a string, b string")
    expr, cols = parse_col_expr([{"col": "a"}, {"extract": {"from": "b", "regex": "([0-9]+)"}}])
    assert cols == {"a", "b"}
    got = [r[0] for r in df.select(expr).collect()]
    assert got == ["A", "22"]


def test_decode_wav_pcm_real_samples(spark):
    """Synthesize a real 16-bit PCM WAV (sine + constant) and verify the
    decoder recovers exact sample statistics — no codec library, just
    RIFF walking + frombuffer."""
    import math
    import struct as st

    import numpy as np

    from meds_transforms_spark.operators.multimodal import decode_wav_pcm

    rate, n = 8000, 800
    sine = np.array(
        [int(16383 * math.sin(2 * math.pi * 440 * i / rate)) for i in range(n)],
        dtype="<i2",
    )
    const = np.full(n, 8192, dtype="<i2")

    def wav(samples: np.ndarray) -> bytes:
        data = samples.tobytes()
        fmt = st.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        riff = b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
        riff += b"data" + st.pack("<I", len(data)) + data
        return b"RIFF" + st.pack("<I", len(riff)) + riff

    df = spark.createDataFrame(
        [(1, bytearray(wav(sine))), (2, bytearray(wav(const))), (3, bytearray(b"not a wav"))],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in decode_wav_pcm(df).collect()}
    assert got[1]["sample_rate"] == rate and got[1]["channels"] == 1
    assert got[1]["n_samples"] == n
    expect_rms = float(np.sqrt(np.mean((sine / 32768.0) ** 2)))
    assert abs(got[1]["rms"] - expect_rms) < 1e-12
    assert abs(got[2]["rms"] - 8192 / 32768.0) < 1e-12
    assert abs(got[2]["mean"] - 8192 / 32768.0) < 1e-12
    assert got[3]["n_samples"] is None and got[3]["sample_rate"] is None
