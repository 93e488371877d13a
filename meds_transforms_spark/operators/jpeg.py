"""Dependency-free baseline JPEG (ITU-T T.81) decoder.

Completes the multimodal decode tier: PNG pixels already decode via
stdlib zlib (operators/multimodal.decode_png_pixels); this module does
the same for baseline sequential DCT JPEG — DQT/DHT/SOF0/SOF1/DRI/SOS
parsing, canonical Huffman entropy decode with restart markers and
0xFF00 byte unstuffing, dequantization, vectorized 8×8 IDCT (one
einsum over every block of a component), chroma upsampling for
arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0), and JFIF
YCbCr→RGB. Grayscale (1-component) and YCbCr (3-component) frames are
supported; progressive (SOF2), arithmetic-coded, hierarchical, and
12-bit frames return ``None`` — the caller's documented
cannot-decode signal (operators/multimodal._image_pixels).

The entropy decode is a per-symbol Python loop (Huffman is inherently
sequential); everything after coefficient extraction is numpy. This is
a fixture/local-codec path — production pipelines with PIL installed
take the PIL branch first.

Decode math follows the public JPEG spec (T.81 Annex A/F) and the
JFIF 1.02 color conversion. No code derived from any JPEG library.
"""

from __future__ import annotations

import numpy as np

# T.81 Figure A.6 zig-zag ordering of the 64 DCT coefficients.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# IDCT basis: A[u, x] = c_u * cos((2x+1) u pi / 16); spatial = A^T F A.
_A = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


class _BitReader:
    """MSB-first bit reader over pre-unstuffed entropy bytes."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise EOFError
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


class _Huffman:
    """Canonical Huffman per T.81 Annex C: mincode/maxcode per length."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.symbols = symbols
        code, k = 0, 0
        for length in range(1, 17):
            n = counts[length - 1]
            if n:
                self.valptr[length] = k
                self.mincode[length] = code
                self.maxcode[length] = code + n - 1
                code += n
                k += n
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            if code <= self.maxcode[length]:
                return self.symbols[self.valptr[length] + code - self.mincode[length]]
        raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _entropy_segments(payload: bytes, start: int):
    """(unstuffed bytes per restart segment, index after entropy data).
    Splits at RST0-7 markers, removes 0xFF00 stuffing, stops at any
    other marker."""
    segs, cur = [], bytearray()
    i = start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = payload[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def decode_baseline_jpeg(payload: bytes):
    """(h, w, 3) RGB uint8 array, or ``None`` when the payload is not a
    decodable baseline JPEG (wrong magic, progressive, truncated, ...).
    Never raises on malformed input."""
    try:
        return _decode(payload)
    except Exception:
        return None


def _decode(payload: bytes):
    if not payload or payload[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _Huffman] = {}
    ac_tables: dict[int, _Huffman] = {}
    frame = None
    restart_interval = 0
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            return None  # reached EOI without a scan
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers carry no segment
        seglen = int.from_bytes(payload[i : i + 2], "big")
        seg = payload[i + 2 : i + seglen]
        i += seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(
                        np.int32
                    )
                    p += 64
                else:  # 16-bit precision table
                    tbl = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.int32)
                    p += 128
                qt[tq] = tbl
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1: baseline / ext. sequential
            precision = seg[0]
            if precision != 8:
                return None
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / lossless / arithmetic / hierarchical
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                total = sum(counts)
                symbols = seg[p + 17 : p + 17 + total]
                table = _Huffman(counts, symbols)
                (dc_tables if tc == 0 else ac_tables)[th] = table
                p += 17 + total
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tables >> 4, tables & 0x0F))
            segs, _ = _entropy_segments(payload, i)
            return _decode_scan(frame, scan, qt, dc_tables, ac_tables,
                                restart_interval, segs)
    return None


def _decode_scan(frame, scan, qt, dc_tables, ac_tables, restart_interval, segs):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcus = mcus_x * mcus_y

    # Per-component coefficient planes in block units.
    planes = {}
    for comp, _, _ in scan:
        bw, bh = mcus_x * comp["h"], mcus_y * comp["v"]
        planes[comp["id"]] = np.zeros((bh, bw, 64), dtype=np.int32)

    seg_iter = iter(segs)
    br = _BitReader(next(seg_iter))
    pred = {comp["id"]: 0 for comp, _, _ in scan}
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            br = _BitReader(next(seg_iter))
            pred = {comp["id"]: 0 for comp, _, _ in scan}
        my, mx = divmod(m, mcus_x)
        for comp, td, ta in scan:
            dct, act = dc_tables[td], ac_tables[ta]
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    coeffs = np.zeros(64, dtype=np.int32)
                    t = dct.decode(br)
                    diff = _extend(br.read_bits(t), t)
                    pred[comp["id"]] += diff
                    coeffs[0] = pred[comp["id"]]
                    k = 1
                    while k < 64:
                        rs = act.decode(br)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        coeffs[k] = _extend(br.read_bits(s), s)
                        k += 1
                    planes[comp["id"]][
                        my * comp["v"] + by, mx * comp["h"] + bx
                    ] = coeffs

    # Dequantize + IDCT, one einsum per component over all its blocks.
    out_planes = []
    for comp, _, _ in scan:
        coeffs = planes[comp["id"]].astype(np.float64) * qt[comp["tq"]][
            np.newaxis, np.newaxis, :
        ].astype(np.float64)
        bh, bw = coeffs.shape[:2]
        blocks = np.zeros((bh, bw, 8, 8))
        blocks.reshape(bh, bw, 64)[..., ZIGZAG] = coeffs
        spatial = np.einsum("ua,ybuv,vc->ybac", _A, blocks, _A)
        plane = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8) + 128.0
        # Upsample to full resolution (nearest/replication, the JFIF
        # default), then crop to the frame size.
        plane = plane.repeat(vmax // comp["v"], axis=0).repeat(
            hmax // comp["h"], axis=1
        )
        out_planes.append(plane[:h, :w])

    if len(out_planes) == 1:
        g = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)
