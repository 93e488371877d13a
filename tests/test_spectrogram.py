"""Tests for wav_spectrogram_features (operators/multimodal)."""

from __future__ import annotations

import math
import struct


def _sine_wav(freq_hz: float, rate: int = 8000, seconds: float = 1.0, ch: int = 1) -> bytes:
    n = int(rate * seconds)
    samples = b"".join(
        struct.pack("<h", int(20000 * math.sin(2 * math.pi * freq_hz * i / rate))) * ch
        for i in range(n)
    )
    byte_rate = rate * ch * 2
    return (
        b"RIFF" + struct.pack("<I", 36 + len(samples)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate, byte_rate, ch * 2, 16)
        + b"data" + struct.pack("<I", len(samples)) + samples
    )


def test_sine_peaks_in_expected_band(spark):
    from meds_transforms_spark.operators.multimodal import wav_spectrogram_features

    # 8 kHz rate, frame 256 → rfft bins 0..128 cover 0..4000 Hz;
    # array_split(129, 16) → band sizes [9,8,8,...]: bin(1 kHz)=32 →
    # band 3 (bins 25-32), bin(3 kHz)=96 → band 11 (bins 89-96).
    rows = [(1, _sine_wav(1000.0)), (2, _sine_wav(3000.0)), (3, b"junk")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in wav_spectrogram_features(df).collect()}
    b1 = out[1].band_energy
    b2 = out[2].band_energy
    assert len(b1) == 16 and out[1].n_frames > 50
    assert b1.index(max(b1)) == 3
    assert b2.index(max(b2)) == 11
    assert out[3].band_energy is None and out[3].n_frames is None


def test_stereo_downmix_and_dedup_composability(spark):
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.dedup import semantic_dedup
    from meds_transforms_spark.operators.multimodal import wav_spectrogram_features

    # two copies of the same tone (one stereo), one different tone:
    # spectrogram features + semantic_dedup must collapse the copies
    rows = [
        (1, _sine_wav(500.0)),
        (2, _sine_wav(500.0, ch=2)),   # stereo duplicate
        (3, _sine_wav(2500.0)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    feats = wav_spectrogram_features(df).filter(F.col("band_energy").isNotNull())
    kept = semantic_dedup(
        feats, vec_col="band_energy", id_col="doc_id",
        n_cells=2, threshold=0.999,
    )
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == [1, 3]               # the stereo copy collapsed onto 1


def _png_rgb(pixels) -> bytes:
    """Minimal PNG encoder (8-bit RGB, filter 0) for test fixtures."""
    import struct as s
    import zlib

    h = len(pixels)
    w = len(pixels[0])
    raw = b"".join(
        b"\x00" + b"".join(bytes(px) for px in row) for row in pixels
    )

    def chunk(cid, data):
        c = cid + data
        return s.pack(">I", len(data)) + c + s.pack(">I", zlib.crc32(c))

    ihdr = s.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_image_grid_features_quadrants(spark):
    from meds_transforms_spark.operators.multimodal import image_grid_features

    # 8x8 image: left half black, right half white → with a 2x2 grid,
    # cells (0,0),(1,0) ≈ 0 and (0,1),(1,1) ≈ 1
    px = [[(0, 0, 0)] * 4 + [(255, 255, 255)] * 4 for _ in range(8)]
    rows = [(1, _png_rgb(px)), (2, b"not an image")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in image_grid_features(df, grid=2).collect()}
    g = out[1].grid_embedding
    assert out[1].width == 8 and out[1].height == 8
    assert g[0] < 0.01 and g[2] < 0.01          # left cells dark
    assert g[1] > 0.99 and g[3] > 0.99          # right cells bright
    assert out[2].grid_embedding is None


def test_image_grid_dedup_composability(spark):
    """Same image at two sizes → identical grid descriptors → collapse
    via semantic_dedup (re-encode/resize-resistant image near-dup)."""
    from pyspark.sql import functions as F

    from meds_transforms_spark.operators.dedup import semantic_dedup
    from meds_transforms_spark.operators.multimodal import image_grid_features

    def gradient(n):
        return [
            [(int(255 * j / (n - 1)),) * 3 for j in range(n)] for _ in range(n)
        ]

    rows = [
        (1, _png_rgb(gradient(16))),
        (2, _png_rgb(gradient(32))),    # same picture, 2x the size
        (3, _png_rgb([[(255, 0, 0)] * 16] * 16)),  # different picture
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    feats = image_grid_features(df, grid=4).filter(
        F.col("grid_embedding").isNotNull()
    )
    # n_cells=1: with 3 vectors and seed centroids = first ids, the dup
    # pair would BE the two centroids and land in separate cells — the
    # cells-vs-corpus-size regime the operator docstring warns about
    kept = semantic_dedup(
        feats, vec_col="grid_embedding", id_col="doc_id",
        n_cells=1, threshold=0.995,
    )
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == [1, 3]


def test_resize_image_nearest_neighbor_exact(spark):
    import numpy as np

    from meds_transforms_spark.operators.multimodal import resize_image

    # 2x2 quadrant image upsampled to 4x4: each source pixel becomes a
    # 2x2 block (nearest-neighbor index map is exact integer math)
    px = [
        [(255, 0, 0), (0, 255, 0)],
        [(0, 0, 255), (255, 255, 255)],
    ]
    rows = [(1, _png_rgb(px)), (2, b"junk")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in resize_image(df, 4, 4).collect()}
    r1 = out[1]
    assert (r1.width, r1.height) == (4, 4)
    arr = np.frombuffer(bytes(r1.rgba), dtype=np.uint8).reshape(4, 4, 4)
    assert tuple(arr[0, 0][:3]) == (255, 0, 0)
    assert tuple(arr[0, 3][:3]) == (0, 255, 0)
    assert tuple(arr[3, 0][:3]) == (0, 0, 255)
    assert tuple(arr[3, 3][:3]) == (255, 255, 255)
    assert tuple(arr[1, 1][:3]) == (255, 0, 0)   # block fill
    assert out[2].rgba is None and out[2].width is None
