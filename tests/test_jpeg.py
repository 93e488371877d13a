"""Baseline JPEG decoder (operators/jpeg) — round-trip against an
INDEPENDENT test-only encoder.

The encoder below is written from the T.81 spec with deliberately
different table constructions than the decoder (zigzag derived by a
diagonal walk vs. the decoder's literal table; trivial fixed-length
canonical Huffman codes vs. the decoder's generic mincode/maxcode
walker), so shared-bug cancellation can't fake a pass. Real-world
files (when present on the host) add an extra non-self-referential
smoke check.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

from meds_transforms_spark.operators.jpeg import decode_baseline_jpeg


# --------------------------- test-only encoder ---------------------------

def _zigzag_order():
    """(row, col) visit order via the diagonal walk — independent of
    the decoder's literal ZIGZAG table."""
    order = []
    for s in range(15):
        diag = [(y, s - y) for y in range(8) if 0 <= s - y < 8]
        if s % 2 == 0:
            diag.reverse()
        order.extend(diag)
    return order


_ZZ = _zigzag_order()


def _fdct(block: np.ndarray) -> np.ndarray:
    """Forward 8x8 DCT-II, explicit double loop (test-only)."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8)
            cv = math.sqrt(1 / 8) if v == 0 else math.sqrt(2 / 8)
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[u, v] = cu * cv * s
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


# Trivial canonical Huffman tables: DC = 12 symbols, all 4-bit codes;
# AC = 255 symbols at 9 bits + symbol 255 at 10 bits (DHT counts are
# single bytes, so one length can hold at most 255 symbols). Valid
# canonical tables the decoder must handle through the generic
# mincode/maxcode algorithm.
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_DC_SYMBOLS = bytes(range(12))
_AC_COUNTS = [0] * 8 + [255, 1] + [0] * 6
_AC_SYMBOLS = bytes(range(256))


def _dc_code(sym: int):
    return sym, 4


def _ac_code(sym: int):
    # canonical: codes 0..254 at length 9; symbol 255 -> (255 << 1) = 510 at 10
    return (sym, 9) if sym < 255 else (510, 10)


def _magnitude(v: int):
    """(category t, t-bit code) per T.81 F.1.2.1."""
    v = int(v)
    if v == 0:
        return 0, 0
    t = v.bit_length() if v > 0 else (-v).bit_length()
    code = v if v > 0 else v + (1 << t) - 1
    return t, code


def _encode_block(bw: _BitWriter, block: np.ndarray, q: np.ndarray, pred: int) -> int:
    coef = np.round(_fdct(block.astype(np.float64) - 128.0) / q).astype(int)
    zz = [coef[r, c] for r, c in _ZZ]
    t, code = _magnitude(zz[0] - pred)
    sym, ln = _dc_code(t)
    bw.write(sym, ln)
    bw.write(code, t)
    run = 0
    for v in zz[1:]:
        if v == 0:
            run += 1
            continue
        while run > 15:
            s, ln = _ac_code(0xF0)  # ZRL
            bw.write(s, ln)
            run -= 16
        t, code = _magnitude(int(v))
        s, ln = _ac_code((run << 4) | t)
        bw.write(s, ln)
        bw.write(code, t)
        run = 0
    if run:
        s, ln = _ac_code(0x00)  # EOB
        bw.write(s, ln)
    return int(zz[0])


def encode_jpeg(rgb: np.ndarray, q: int = 2, subsample: bool = False,
                restart_interval: int = 0, gray: bool = False) -> bytes:
    """Minimal baseline JPEG encoder (test-only): uniform quant table
    ``q``, 4:4:4 or 4:2:0, optional restart markers."""
    h, w = rgb.shape[:2]
    if gray:
        planes = [rgb[..., 0].astype(np.float64)]
        samps = [(1, 1)]
    else:
        r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            # pad to even, then 2x2 mean
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            def _pad(p):
                return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = _pad(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = _pad(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            planes, samps = [y, cb, cr], [(2, 2), (1, 1), (1, 1)]
        else:
            planes, samps = [y, cb, cr], [(1, 1), (1, 1), (1, 1)]

    qtab = np.full(64, q, dtype=int)
    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (table 0)
    out += b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big") + b"\x00" + bytes(
        int(qtab[i]) for i in range(64)
    )
    # SOF0
    ncomp = len(planes)
    sof = bytearray()
    sof += (8).to_bytes(1, "big") + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samps[ci][0] << 4) | samps[ci][1], 0])
    out += b"\xff\xc0" + (2 + len(sof)).to_bytes(2, "big") + sof
    # DHT: DC table 0, AC table 0
    dht = bytearray()
    dht += b"\x00" + bytes(_DC_COUNTS) + _DC_SYMBOLS
    dht += b"\x10" + bytes(_AC_COUNTS) + _AC_SYMBOLS
    out += b"\xff\xc4" + (2 + len(dht)).to_bytes(2, "big") + dht
    if restart_interval:
        out += b"\xff\xdd" + (4).to_bytes(2, "big") + restart_interval.to_bytes(2, "big")
    # SOS
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samps):
        th, tw = mcus_y * sv * 8, mcus_x * sh * 8
        padded.append(
            np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        )
    bw = _BitWriter()
    pred = [0] * ncomp
    rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            out += bw.out
            bw = _BitWriter()
            out += b"\xff" + bytes([0xD0 + (rst % 8)])
            rst += 1
            pred = [0] * ncomp
        my, mx = divmod(m, mcus_x)
        for ci, (p, (sh, sv)) in enumerate(zip(padded, samps)):
            for by in range(sv):
                for bx in range(sh):
                    r0 = (my * sv + by) * 8
                    c0 = (mx * sh + bx) * 8
                    # uniform table: natural order == zigzag order
                    pred[ci] = _encode_block(
                        bw, p[r0 : r0 + 8, c0 : c0 + 8], qtab.reshape(8, 8),
                        pred[ci],
                    )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------- fixtures --------------------------------

def _gradient_rgb(h=24, w=40):
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 / max(w - 1, 1)).astype(np.uint8)
    g = (yy * 255 / max(h - 1, 1)).astype(np.uint8)
    b = ((xx + yy) * 255 / max(h + w - 2, 1)).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


# --------------------------------- tests ---------------------------------

def test_roundtrip_444():
    src = _gradient_rgb()
    img = decode_baseline_jpeg(encode_jpeg(src, q=2))
    assert img is not None and img.shape == src.shape
    err = np.abs(img.astype(float) - src.astype(float))
    assert err.mean() < 3.0 and err.max() < 32.0


def test_roundtrip_420_subsampled():
    src = _gradient_rgb(h=33, w=50)  # odd sizes exercise crop + padding
    img = decode_baseline_jpeg(encode_jpeg(src, q=2, subsample=True))
    assert img is not None and img.shape == src.shape
    err = np.abs(img.astype(float) - src.astype(float))
    assert err.mean() < 6.0  # chroma averaging adds loss on gradients


def test_roundtrip_grayscale():
    g = _gradient_rgb()[..., :1].repeat(3, axis=-1)
    img = decode_baseline_jpeg(encode_jpeg(g, q=2, gray=True))
    assert img is not None and img.shape == g.shape
    assert np.abs(img.astype(float) - g.astype(float)).mean() < 3.0


def test_roundtrip_restart_markers():
    src = _gradient_rgb(h=40, w=64)
    img = decode_baseline_jpeg(encode_jpeg(src, q=2, restart_interval=3))
    assert img is not None
    assert np.abs(img.astype(float) - src.astype(float)).mean() < 3.0


def test_rejects_progressive_and_garbage():
    src = _gradient_rgb()
    payload = bytearray(encode_jpeg(src, q=2))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    assert decode_baseline_jpeg(bytes(payload)) is None
    assert decode_baseline_jpeg(b"") is None
    assert decode_baseline_jpeg(b"\x00" * 100) is None
    assert decode_baseline_jpeg(encode_jpeg(src)[:40]) is None  # truncated


_REAL_JPEGS = [
    "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/python.jpg",
]


@pytest.mark.parametrize("path", _REAL_JPEGS)
def test_decodes_real_world_file_when_present(path):
    if not os.path.exists(path):
        pytest.skip("host fixture not present")
    img = decode_baseline_jpeg(open(path, "rb").read())
    assert img is not None and img.ndim == 3 and img.shape[2] == 3
    assert img.shape[0] > 0 and img.shape[1] > 0
    assert 0 < float(img.mean()) < 255  # non-degenerate pixels


def test_decode_image_stage_reports_real_jpeg_stats(spark):
    """decode_image on a JPEG payload must produce REAL pixel features
    (matching the source image statistics), not the _fake_features
    stub — the round-7 'retire the stub tier' contract."""
    from meds_transforms_spark.operators.multimodal import decode_image

    src = _gradient_rgb()
    payload = encode_jpeg(src, q=2)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    row = decode_image(df).collect()[0]
    assert row.media_type == "image/jpeg"
    assert (row.width, row.height) == (src.shape[1], src.shape[0])
    gray = (src.astype(float) / 255.0).mean(axis=2)
    assert abs(row.features[0] - gray.mean()) < 0.02  # gray mean
    assert abs(row.features[1] - gray.std()) < 0.02  # gray std
    assert abs(row.features[7] - 1.0) < 1e-9  # alpha = opaque
