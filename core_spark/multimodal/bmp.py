"""Pure-stdlib BMP codec for the multimodal real mode — completes the
format family (png.py, jpeg.py, gif.py) for the one container format
that needs no entropy coding at all.

Scope: BITMAPINFOHEADER-family DIBs (40+ bytes), uncompressed
(BI_RGB): 24-bit BGR, 32-bit BGRA (alpha preserved), and 8-bit
palette rows; bottom-up (positive height) and top-down (negative)
row orders. RLE compression and the 12-byte OS/2 core header raise
NotImplementedError naming PIL; malformed structures raise named
ValueErrors. The encoder writes 24-bit bottom-up BI_RGB — enough for
the resize round-trip and library-free fixtures.
"""

from __future__ import annotations

import struct

import numpy as np


def _headers(raw: bytes):
    if raw[:2] != b"BM" or len(raw) < 54:
        raise ValueError("malformed BMP: bad signature or truncated header")
    data_off = struct.unpack_from("<I", raw, 10)[0]
    dib = struct.unpack_from("<I", raw, 14)[0]
    if dib < 40:
        raise NotImplementedError(
            f"STUB: BMP with {dib}-byte DIB header (BITMAPCOREHEADER) "
            "requires PIL (pillow)"
        )
    w, h = struct.unpack_from("<ii", raw, 18)
    planes, bits = struct.unpack_from("<HH", raw, 26)
    comp = struct.unpack_from("<I", raw, 30)[0]
    return data_off, dib, w, h, bits, comp


def bmp_meta(raw: bytes) -> tuple[int, int, int]:
    """(width, height, bits_per_pixel)."""
    _off, _dib, w, h, bits, _comp = _headers(raw)
    return w, abs(h), bits


def bmp_decode(raw: bytes) -> np.ndarray:
    """Decode to (h, w, 3) RGB — or (h, w, 4) RGBA for 32-bit files."""
    off, dib, w, h, bits, comp = _headers(raw)
    if comp != 0:
        raise NotImplementedError(
            f"STUB: BMP compression {comp} (RLE/bitfields) requires PIL"
        )
    top_down = h < 0
    h = abs(h)
    if bits == 8:
        n_colors = struct.unpack_from("<I", raw, 46)[0] or 256
        pal_off = 14 + dib
        pal = np.frombuffer(
            raw[pal_off : pal_off + 4 * n_colors], dtype=np.uint8
        )
        if pal.size < 4 * n_colors:
            raise ValueError("malformed BMP: palette truncated")
        pal = pal.reshape(-1, 4)[:, [2, 1, 0]]  # BGRX -> RGB
        row_bytes = (w + 3) // 4 * 4
        need = row_bytes * h
        body = np.frombuffer(raw[off : off + need], dtype=np.uint8)
        if body.size < need:
            raise ValueError("malformed BMP: pixel data truncated")
        idx = body.reshape(h, row_bytes)[:, :w]
        if int(idx.max()) >= pal.shape[0]:
            raise ValueError("malformed BMP: palette index out of range")
        img = pal[idx]
    elif bits in (24, 32):
        ch = bits // 8
        row_bytes = (w * ch + 3) // 4 * 4
        need = row_bytes * h
        body = np.frombuffer(raw[off : off + need], dtype=np.uint8)
        if body.size < need:
            raise ValueError("malformed BMP: pixel data truncated")
        rows = body.reshape(h, row_bytes)[:, : w * ch].reshape(h, w, ch)
        img = rows[..., [2, 1, 0]] if ch == 3 else rows[..., [2, 1, 0, 3]]
    else:
        raise NotImplementedError(
            f"STUB: {bits}-bit BMP requires PIL (pillow); pure-python "
            "real mode covers 8 (palette), 24 and 32 bits"
        )
    return img if top_down else img[::-1].copy()


def bmp_encode(arr: np.ndarray) -> bytes:
    """Encode uint8 (h, w, 3) RGB (or (h, w) grayscale) as 24-bit
    bottom-up BI_RGB."""
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    h, w = arr.shape[:2]
    row_bytes = (w * 3 + 3) // 4 * 4
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, [2, 1, 0]].reshape(h, w * 3)
    raw_body = body.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(raw_body), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raw_body), 2835, 2835, 0, 0
    )
    return header + raw_body
