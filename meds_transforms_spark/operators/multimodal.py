"""Multimodal column operators — image/audio/video as opaque binary.

Media payloads are opaque ``binary`` columns with typed metadata
structs. Two tiers:

- **Real, dependency-free**: container *header* parsing (media type
  sniffing, PNG/JPEG dimensions, WAV sample rate/channels/duration) is
  pure byte-layout arithmetic — implemented here for real, JVM-side
  where the layout is fixed-offset (PNG, WAV) and in an Arrow-batched
  ``mapInPandas`` where it needs scanning (JPEG SOF markers).
- **Real, dependency-free pixel/sample decode**: stdlib-zlib PNG
  (decode_png_pixels), baseline-DCT JPEG (operators/jpeg), 16-bit PCM
  WAV — real pixels/samples with no codec library. PIL is preferred
  when installed (any format). The ONLY remaining stub is the
  clearly-marked deterministic _fake_features fallback for payloads no
  decoder handles (progressive JPEG without PIL, 16-bit PNG, video) —
  same batch signature, swap in PIL/ffmpeg without touching the Spark
  plumbing.

Scale notes: payloads dominate row size → never collect, never shuffle
payload bytes for metadata-only questions (header parsing is a map-side
projection); full decode streams Arrow batches per partition.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meds_transforms_spark.operators.base import register_stage


def sniff_media_type(b: Column) -> Column:
    """Magic-byte media type — real detection, JVM-side."""
    magic8 = F.hex(F.substring(b, 1, 8))
    magic4 = F.hex(F.substring(b, 1, 4))
    return (
        F.when(magic8 == "89504E470D0A1A0A", "image/png")
        .when(magic4.startswith("FFD8FF"), "image/jpeg")
        .when(
            (magic4 == "52494646") & (F.hex(F.substring(b, 9, 4)) == "57415645"),
            "audio/wav",
        )
        .when(F.hex(F.substring(b, 5, 4)) == "66747970", "video/mp4")
        .otherwise("application/octet-stream")
    )


def png_dimensions(b: Column) -> tuple[Column, Column]:
    """PNG width/height — fixed offsets in the IHDR chunk (bytes 17-24,
    big-endian u32). Pure built-ins: substring + hex + base conversion."""
    width = F.conv(F.hex(F.substring(b, 17, 4)), 16, 10).cast("int")
    height = F.conv(F.hex(F.substring(b, 21, 4)), 16, 10).cast("int")
    is_png = F.hex(F.substring(b, 1, 8)) == "89504E470D0A1A0A"
    return F.when(is_png, width), F.when(is_png, height)


def wav_info(b: Column) -> Column:
    """WAV fmt header (canonical layout): channels @23(2 LE),
    sample_rate @25(4 LE), byte_rate @29(4 LE) → duration estimate."""
    is_wav = (F.hex(F.substring(b, 1, 4)) == "52494646") & (
        F.hex(F.substring(b, 9, 4)) == "57415645"
    )

    def le_u(start: int, nbytes: int) -> Column:
        # little-endian: reverse the bytes before base conversion
        parts = [F.hex(F.substring(b, start + i, 1)) for i in reversed(range(nbytes))]
        return F.conv(F.concat(*parts), 16, 10).cast("long")

    channels = le_u(23, 2).cast("int")
    sample_rate = le_u(25, 4).cast("int")
    byte_rate = le_u(29, 4)
    data_bytes = (F.length(b) - F.lit(44)).cast("long")
    duration = F.when(byte_rate > 0, data_bytes / byte_rate)
    return F.when(
        is_wav,
        F.struct(
            channels.alias("channels"),
            sample_rate.alias("sample_rate"),
            duration.cast("double").alias("duration_sec"),
        ),
    )


@register_stage("attach_media_meta")
def attach_media_meta(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """Typed metadata struct — REAL header parsing, zero Python, map-side."""
    b = F.col(binary_col)
    w, h = png_dimensions(b)
    return df.withColumn(
        "media_meta",
        F.struct(
            sniff_media_type(b).alias("media_type"),
            F.length(b).cast("long").alias("n_bytes"),
            F.xxhash64(b).alias("content_hash"),
            w.alias("png_width"),
            h.alias("png_height"),
            wav_info(b).alias("wav"),
        ),
    )


# ----------------------------------------------------------------------
# Python-side parsing (needs scanning) + stubbed decode kernels
# ----------------------------------------------------------------------

def parse_image_dims(payload: bytes) -> tuple[int | None, int | None]:
    """REAL dimension parsing for PNG and JPEG from raw bytes."""
    if payload is None or len(payload) < 12:
        return None, None
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) < 24:  # truncated header: fail soft, not struct.error
            return None, None
        w, h = struct.unpack(">II", payload[16:24])
        return w, h
    if payload[:3] == b"\xff\xd8\xff":
        # scan JPEG segments for a SOF marker (C0-CF except C4/C8/CC)
        i = 2
        n = len(payload)
        while i + 9 < n:
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte padding before a marker
                i += 1
                continue
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return w, h
            if marker in (0x01, *range(0xD0, 0xDA)):  # length-less markers
                i += 2
                continue
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return None, None
    return None, None


def _fake_features(payload: bytes, n_features: int = 8) -> list[float]:
    """STUB decode kernel: deterministic pseudo-features from a payload
    hash. Replace with a real model/codec — batch shape is identical."""
    import hashlib

    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:n_features]]


_PIL_IMAGE = None


def _pil_image_module():
    """PIL.Image when installed, else None (checked once)."""
    global _PIL_IMAGE
    if _PIL_IMAGE is None:
        try:
            from PIL import Image  # type: ignore

            _PIL_IMAGE = Image
        except ImportError:
            _PIL_IMAGE = False
    return _PIL_IMAGE or None


def decode_png_pixels(payload: bytes):
    """REAL PNG pixel decode, stdlib-only (zlib) + numpy — no codec
    library needed, same spirit as the 16-bit PCM WAV path.

    Supports the common case: 8-bit depth, color types 0 (gray),
    2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced, all five
    scanline filters. Returns an (h, w, 4) RGBA uint8 array, or None
    for anything else (16-bit, palette, interlaced, truncated).
    Filters 0/2 are vectorized per row; 1/3/4 fall back to a per-byte
    loop (each byte depends on the byte bpp earlier in the row — an
    inherently sequential recurrence).
    """
    import zlib

    import numpy as np

    if not payload or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    ihdr = None
    idat = b""
    i = 8
    n = len(payload)
    while i + 8 <= n:
        (ln,) = struct.unpack(">I", payload[i : i + 4])
        cid = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + ln]
        if cid == b"IHDR":
            ihdr = data
        elif cid == b"IDAT":
            idat += data
        elif cid == b"IEND":
            break
        i += 12 + ln
    if ihdr is None or len(ihdr) < 13:
        return None
    w, h, bit, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr[:13])
    nch = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if bit != 8 or nch is None or comp != 0 or filt != 0 or interlace != 0:
        return None
    if w == 0 or h == 0:
        return None
    try:
        raw = zlib.decompress(idat)
    except zlib.error:
        return None
    stride = w * nch
    if len(raw) < h * (stride + 1):
        return None
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1)
        pos += stride + 1
        if ftype == 0:
            cur = line.copy()
        elif ftype == 2:  # Up
            cur = line + prev  # uint8 wraparound == mod-256 per spec
        else:  # Sub/Average/Paeth: sequential recurrence on prior bytes
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - nch]) if x >= nch else 0
                bup = int(prev[x])
                c = int(prev[x - nch]) if x >= nch else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + bup) // 2
                elif ftype == 4:
                    p = a + bup - c
                    pa, pb, pc = abs(p - a), abs(p - bup), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (bup if pb <= pc else c)
                else:
                    return None
                cur[x] = (int(line[x]) + pred) & 0xFF
        out[y] = cur
        prev = cur
    px = out.reshape(h, w, nch)
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    if color == 0:
        rgba[..., 0] = rgba[..., 1] = rgba[..., 2] = px[..., 0]
        rgba[..., 3] = 255
    elif color == 2:
        rgba[..., :3] = px
        rgba[..., 3] = 255
    elif color == 4:
        rgba[..., 0] = rgba[..., 1] = rgba[..., 2] = px[..., 0]
        rgba[..., 3] = px[..., 1]
    else:
        rgba[:] = px
    return rgba


def _image_pixels(payload: bytes):
    """(h, w, 4) RGBA uint8 pixels via PIL when installed (any format),
    else the dependency-free decoders — stdlib-zlib PNG or baseline-DCT
    JPEG (operators/jpeg); None when undecodable."""
    if payload is None:
        return None
    Image = _pil_image_module()
    if Image is not None:
        import io

        import numpy as np

        try:
            with Image.open(io.BytesIO(payload)) as img:
                return np.asarray(img.convert("RGBA"))
        except Exception:
            return None
    if payload[:3] == b"\xff\xd8\xff":
        import numpy as np

        from meds_transforms_spark.operators.jpeg import decode_baseline_jpeg

        rgb = decode_baseline_jpeg(payload)
        if rgb is None:
            return None
        rgba = np.empty((*rgb.shape[:2], 4), dtype=np.uint8)
        rgba[..., :3] = rgb
        rgba[..., 3] = 255
        return rgba
    return decode_png_pixels(payload)


def _pixel_features(rgba) -> list[float]:
    """8 real pixel statistics on [0, 1]: gray mean/std/min/max,
    per-channel R/G/B means, alpha mean."""
    rgb = rgba[..., :3].astype("float64") / 255.0
    alpha = rgba[..., 3].astype("float64") / 255.0
    gray = rgb.mean(axis=2)
    return [
        float(gray.mean()),
        float(gray.std()),
        float(gray.min()),
        float(gray.max()),
        float(rgb[..., 0].mean()),
        float(rgb[..., 1].mean()),
        float(rgb[..., 2].mean()),
        float(alpha.mean()),
    ]


IMAGE_DECODE_SCHEMA = (
    "doc_id long, media_type string, width int, height int, features array<double>"
)


@register_stage("decode_image")
def decode_image(df: DataFrame, binary_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched image decode: REAL type sniff + dimension parse +
    REAL pixel decode (PIL when installed — any format — else the
    dependency-free decoders: stdlib-zlib PNG for 8-bit non-interlaced
    PNGs, baseline-DCT JPEG via operators/jpeg) producing real pixel
    statistics as the feature vector. The only payloads no decoder
    handles (e.g. progressive JPEG without PIL, 16-bit PNG) fall back
    to the clearly-marked deterministic _fake_features stub so the
    batch shape never changes."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = list(pdf[binary_col])
            dims = [parse_image_dims(p) for p in payloads]
            types = []
            feats = []
            for p in payloads:
                if p is not None and p[:8] == b"\x89PNG\r\n\x1a\n":
                    types.append("image/png")
                elif p is not None and p[:3] == b"\xff\xd8\xff":
                    types.append("image/jpeg")
                else:
                    types.append("application/octet-stream")
                rgba = _image_pixels(p)
                feats.append(
                    _pixel_features(rgba) if rgba is not None else _fake_features(p)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": types,
                    "width": pd.array([d[0] for d in dims], dtype="Int32"),
                    "height": pd.array([d[1] for d in dims], dtype="Int32"),
                    "features": feats,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(decode, IMAGE_DECODE_SCHEMA)


def _wav_chunks(payload: bytes) -> dict[bytes, bytes]:
    """Walk the RIFF chunk list; return {chunk_id: chunk_bytes}."""
    out: dict[bytes, bytes] = {}
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return out
    i, n = 12, len(payload)
    while i + 8 <= n:
        cid = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        out[cid] = payload[i + 8 : i + 8 + size]
        i += 8 + size + (size & 1)  # chunks are word-aligned
    return out


WAV_DECODE_SCHEMA = (
    "doc_id long, sample_rate int, channels int, n_samples long, "
    "rms double, peak double, mean double"
)


def _pcm16_samples(payload: bytes):
    """(rate, channels, mono float64 samples | None): the shared RIFF
    fmt/data walk + 16-bit PCM decode used by decode_wav_pcm and
    wav_spectrogram_features — one place to extend for EXTENSIBLE or
    24-bit formats."""
    import numpy as np

    chunks = _wav_chunks(payload)
    fmt, data = chunks.get(b"fmt "), chunks.get(b"data")
    if fmt is None or len(fmt) < 16 or data is None:
        return None, None, None
    audio_fmt, ch, rate = struct.unpack("<HHI", fmt[:8])
    (bits,) = struct.unpack("<H", fmt[14:16])
    if audio_fmt != 1 or bits != 16 or len(data) < 2:
        return rate, ch, None
    x = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2").astype(
        np.float64
    ) / 32768.0
    return rate, ch, x


@register_stage("decode_wav_pcm")
def decode_wav_pcm(
    df: DataFrame, binary_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL 16-bit PCM WAV decode — no codec library needed.

    PCM is just packed little-endian int16s: walk the RIFF chunks to
    the fmt/data payloads (real container parsing), then
    ``np.frombuffer`` the sample data and compute sample statistics
    (RMS, peak, mean on [-1, 1]-normalized values). Unlike the image
    pixel kernel (which genuinely needs a codec and stays stubbed),
    this path is production-real end to end. Arrow-batched mapInPandas;
    payload bytes never shuffle.
    """
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "sample_rate": [], "channels": [],
                "n_samples": [], "rms": [], "peak": [], "mean": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                rate, ch, x = _pcm16_samples(payload)
                stats = (None, None, None, None)
                if x is not None and len(x):
                    stats = (
                        len(x),
                        float(np.sqrt(np.mean(x * x))),
                        float(np.max(np.abs(x))),
                        float(np.mean(x)),
                    )
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(rate)
                rows["channels"].append(ch)
                rows["n_samples"].append(stats[0])
                rows["rms"].append(stats[1])
                rows["peak"].append(stats[2])
                rows["mean"].append(stats[3])
            out = pd.DataFrame(rows)
            out["sample_rate"] = pd.array(out["sample_rate"], dtype="Int32")
            out["channels"] = pd.array(out["channels"], dtype="Int32")
            out["n_samples"] = pd.array(out["n_samples"], dtype="Int64")
            yield out

    return df.select(id_col, binary_col).mapInPandas(decode, WAV_DECODE_SCHEMA)


@register_stage("frame_sample")
def frame_sample(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    every_n: int = 10,
    max_frames: int = 4,
) -> DataFrame:
    """Video → one row per sampled frame index (STUB frame count: derived
    from payload size; a real kernel probes the container). The explode
    stays JVM-side; only per-frame decode would enter Python."""
    n_frames = F.least(
        F.floor(F.length(F.col(binary_col)) / F.lit(max(every_n, 1))).cast("int") + 1,
        F.lit(int(max_frames)),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)),
    ).select(
        F.col(id_col),
        F.col("pos").alias("frame_index"),
        (F.col("pos") * every_n).alias("source_frame"),
    )


SPECTROGRAM_SCHEMA = "doc_id long, n_frames long, band_energy array<double>"


@register_stage("wav_spectrogram_features")
def wav_spectrogram_features(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    frame: int = 256,
    hop: int = 128,
    n_bands: int = 16,
) -> DataFrame:
    """REAL audio feature extraction — numpy only, no codec library.

    16-bit PCM WAV → framed STFT (``np.fft.rfft``, Hann window) →
    log-power spectrum → time-averaged into ``n_bands`` equal frequency
    bands: one fixed-dimension clip descriptor per document, the audio
    analog of a document embedding. The output feeds the existing
    embedding machinery unchanged (cosine top-k, LSH/semantic dedup,
    clustering) — audio near-dup detection is ``semantic_dedup`` over
    this column.

    Arrow-batched ``mapInPandas``; payload bytes never shuffle; cost is
    O(samples · log frame) FFTs per clip, embarrassingly parallel.
    Non-PCM/underlength payloads yield NULL features (fail-soft, the
    attach_media_meta quarantine convention).
    """
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        win = np.hanning(frame)
        for pdf in batches:
            out = {"doc_id": [], "n_frames": [], "band_energy": []}
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                feats, nf = None, None
                try:
                    rate, ch, x = _pcm16_samples(payload)
                    if x is not None and len(x) >= frame:
                            if ch and ch > 1:  # downmix interleaved channels
                                x = x[: len(x) - len(x) % ch].reshape(-1, ch).mean(axis=1)
                            n = 1 + (len(x) - frame) // hop
                            if n > 0 and len(x) >= frame:
                                idx = (
                                    np.arange(frame)[None, :]
                                    + hop * np.arange(n)[:, None]
                                )
                                spec = np.abs(np.fft.rfft(x[idx] * win, axis=1)) ** 2
                                logp = np.log1p(spec).mean(axis=0)  # time-avg
                                bands = np.array_split(logp, n_bands)
                                feats = [float(b.mean()) for b in bands]
                                nf = n
                except Exception:
                    feats, nf = None, None
                out["doc_id"].append(doc_id)
                out["n_frames"].append(nf)
                out["band_energy"].append(feats)
            res = pd.DataFrame(out)
            res["n_frames"] = pd.array(res["n_frames"], dtype="Int64")
            yield res

    return df.select(id_col, binary_col).mapInPandas(extract, SPECTROGRAM_SCHEMA)


IMAGE_GRID_SCHEMA = "doc_id long, width int, height int, grid_embedding array<double>"


@register_stage("image_grid_features")
def image_grid_features(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    grid: int = 4,
) -> DataFrame:
    """REAL image descriptor: decode pixels (stdlib PNG decoder, PIL
    when installed for other codecs), resize-by-mean-pooling onto a
    ``grid × grid`` grayscale grid — a ``grid²``-dim embedding per
    image, the visual analog of ``wav_spectrogram_features``'s clip
    descriptor. Feeds the embedding machinery unchanged: image near-dup
    (including re-encoded/alpha-variant copies that defeat byte-exact
    hashing) is ``semantic_dedup`` over this column.

    Pooling uses cumulative sums over irregular cell boundaries
    (exact block means for any aspect ratio — true area downsampling,
    not nearest-neighbor sampling). Undecodable payloads yield NULL.
    """
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def pool(gray):
            h, w = gray.shape
            ys = np.linspace(0, h, grid + 1).astype(int)
            xs = np.linspace(0, w, grid + 1).astype(int)
            out = []
            for i in range(grid):
                for j in range(grid):
                    cell = gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
                    out.append(float(cell.mean()) if cell.size else 0.0)
            return out

        for pdf in batches:
            res = {"doc_id": [], "width": [], "height": [], "grid_embedding": []}
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                w = h = None
                feats = None
                rgba = _image_pixels(bytes(payload) if payload is not None else None)
                if rgba is not None and rgba.size:
                    h, w = int(rgba.shape[0]), int(rgba.shape[1])
                    gray = rgba[..., :3].astype("float64").mean(axis=2) / 255.0
                    feats = pool(gray)
                res["doc_id"].append(doc_id)
                res["width"].append(w)
                res["height"].append(h)
                res["grid_embedding"].append(feats)
            out = pd.DataFrame(res)
            out["width"] = pd.array(out["width"], dtype="Int32")
            out["height"] = pd.array(out["height"], dtype="Int32")
            yield out

    return df.select(id_col, binary_col).mapInPandas(extract, IMAGE_GRID_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, width int, height int, rgba binary"
)


@register_stage("resize_image")
def resize_image(
    df: DataFrame,
    out_w: int,
    out_h: int,
    binary_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL image resize — decode pixels (stdlib PNG decoder, PIL when
    installed for other codecs) and nearest-neighbor index-map to
    ``out_w × out_h``, emitting raw RGBA bytes + dimensions: the
    fixed-shape tensor a vision-model preprocessing pipeline feeds on.

    Nearest-neighbor is exact and deterministic (pure integer index
    arithmetic — identical on every platform); for quality-sensitive
    downsampling compose with :func:`image_grid_features`' area pooling
    instead. Arrow-batched ``mapInPandas``; payloads never shuffle;
    undecodable payloads yield NULL.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "rgba": []}
            for doc_id, payload in zip(pdf[id_col], pdf[binary_col]):
                blob = w = h = None
                rgba = _image_pixels(bytes(payload) if payload is not None else None)
                if rgba is not None and rgba.size:
                    sh, sw = rgba.shape[0], rgba.shape[1]
                    ys = (np.arange(out_h) * sh) // out_h
                    xs = (np.arange(out_w) * sw) // out_w
                    blob = rgba[ys][:, xs].tobytes()
                    w, h = out_w, out_h
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["rgba"].append(blob)
            res = pd.DataFrame(out)
            res["width"] = pd.array(res["width"], dtype="Int32")
            res["height"] = pd.array(res["height"], dtype="Int32")
            yield res

    return df.select(id_col, binary_col).mapInPandas(run, RESIZE_SCHEMA)
