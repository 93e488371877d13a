"""Minimal PNG encoder for test fixtures.

Emits valid 8-bit non-interlaced PNGs (gray / gray+alpha / RGB / RGBA,
filter type 0 on every scanline) from a numpy array using only stdlib
zlib — so tests can round-trip known pixel values through
operators.multimodal.decode_png_pixels / decode_image without any
imaging dependency in the container.
"""

from __future__ import annotations

import struct
import zlib

_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # n_channels -> PNG color type


def _chunk(cid: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + cid
        + data
        + struct.pack(">I", zlib.crc32(cid + data) & 0xFFFFFFFF)
    )


def encode_png(pixels) -> bytes:
    """uint8 array (h, w) or (h, w, {1,2,3,4}) -> PNG bytes."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _COLOR_TYPE:
        raise ValueError(f"Unsupported pixel array shape {arr.shape}")
    h, w, nch = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[nch], 0, 0, 0)
    # filter byte 0 prepended to each scanline
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
