"""Pure-stdlib GIF codec (LZW) for the multimodal real mode — the
third common scraped-web image format after PNG and JPEG
(multimodal/png.py, jpeg.py), in a container without PIL.

Scope: GIF87a/GIF89a, global or local color table, interlaced or
sequential rows, GIF89a graphic-control transparency (decoded to an
alpha channel), and FULL ANIMATION: `gif_frames` composites every
frame onto the logical screen honoring disposal methods 0-3
(none / keep / restore-background / restore-previous) and yields
(delay_ms, rgb) pairs, which is what backs the video
frame-sampling kernel (columns.sample_video_frames) — animated GIF
is the one video-like container expressible in pure stdlib, so it
is the real-mode stand-in for MP4/WEBM (which raise, naming pyav).
`gif_encode_anim` writes multi-frame GIFs (per-frame GCE delays +
NETSCAPE loop block) so the compositing path is exercised by
construction. Malformed structures raise named ValueErrors; there
is no unsupported-variant stub left for GIF.

The encoder exists for tests and the resize round-trip: it builds a
palette from the image's distinct colors (<= 256, else raises — a
real quantizer is PIL's job) and emits literal LZW codes with a
CLEAR before the code width would grow, so the decoder's full
variable-width path is exercised by construction.

Executor shape: same Arrow `mapInPandas` batches as every multimodal
kernel; LZW is bit-at-a-time Python — honest cost, amortized per
batch, swapped for PIL/giflib on a cluster image behind the same
column contract.
"""

from __future__ import annotations

import struct

import numpy as np

MAGICS = (b"GIF87a", b"GIF89a")


def _color_table(raw: bytes, i: int, flags: int) -> tuple[np.ndarray | None, int]:
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        tbl = raw[i : i + 3 * n]
        if len(tbl) < 3 * n:
            raise ValueError("malformed GIF: color table truncated")
        return np.frombuffer(tbl, dtype=np.uint8).reshape(n, 3), i + 3 * n
    return None, i


def _sub_blocks(raw: bytes, i: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if i >= len(raw):
            raise ValueError("malformed GIF: unterminated sub-blocks")
        n = raw[i]
        i += 1
        if n == 0:
            return bytes(out), i
        out += raw[i : i + n]
        if i + n > len(raw):
            raise ValueError("malformed GIF: sub-block truncated")
        i += n


def _screen(raw: bytes) -> tuple[int, int]:
    if raw[:6] not in MAGICS:
        raise ValueError("malformed GIF: bad signature")
    if len(raw) < 13:
        raise ValueError("malformed GIF: truncated screen descriptor")
    return struct.unpack_from("<HH", raw, 6)


def gif_meta(raw: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) from the screen descriptor + a block
    walk (no LZW decode)."""
    w, h = _screen(raw)
    flags = raw[10]
    _, i = _color_table(raw, 13, flags)
    frames = 0
    while i < len(raw):
        b = raw[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            _, i = _sub_blocks(raw, i + 2)
        elif b == 0x2C:  # image descriptor
            frames += 1
            if i + 10 > len(raw):
                raise ValueError("malformed GIF: image descriptor truncated")
            lflags = raw[i + 9]
            _, i = _color_table(raw, i + 10, lflags)
            i += 1  # LZW min code size
            _, i = _sub_blocks(raw, i)
        else:
            raise ValueError(f"malformed GIF: unknown block 0x{b:02X}")
    return w, h, frames


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> list[int]:
    clear = 1 << min_code
    eoi = clear + 1
    table: list[list[int]] = [[c] for c in range(clear)] + [[], []]
    width = min_code + 1
    out: list[int] = []
    prev: list[int] | None = None
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("malformed GIF: LZW stream truncated")
            acc |= data[pos] << nbits  # GIF packs LSB-first
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [[c] for c in range(clear)] + [[], []]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("malformed GIF: first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + [entry[0]])
        elif code == len(table):
            entry = prev + [prev[0]]
            table.append(entry)
        else:
            raise ValueError("malformed GIF: LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out[:n_pixels]


_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _parse_frame(
    raw: bytes, i: int, gct: np.ndarray | None
) -> tuple[int, int, np.ndarray, np.ndarray, int]:
    """Parse one image-descriptor block (0x2C already seen at raw[i]):
    local color table, LZW pixel decode, deinterlace, palette-bounds
    check. Returns (left, top, idx, palette, next_i). Shared by the
    first-frame decoder and the animation player so the two can never
    drift on the bit-level frame format."""
    left, top, fw, fh = struct.unpack_from("<HHHH", raw, i + 1)
    lflags = raw[i + 9]
    lct, i = _color_table(raw, i + 10, lflags)
    palette = lct if lct is not None else gct
    if palette is None:
        raise ValueError("malformed GIF: frame has no color table")
    min_code = raw[i]
    data, i = _sub_blocks(raw, i + 1)
    idx = np.array(
        _lzw_decode(data, min_code, fw * fh), dtype=np.int32
    ).reshape(fh, fw)
    if lflags & 0x40:  # interlaced: 4-pass row order
        rows = np.empty(fh, dtype=np.int64)
        k = 0
        for start, step in _INTERLACE:
            for y in range(start, fh, step):
                rows[y] = k
                k += 1
        idx = idx[rows]
    if int(idx.max()) >= palette.shape[0]:
        raise ValueError(
            f"malformed GIF: pixel index {int(idx.max())} outside "
            f"{palette.shape[0]}-entry palette"
        )
    return left, top, idx, palette, i


def gif_decode(raw: bytes) -> np.ndarray:
    """Decode the FIRST frame to uint8 (h, w, 3) RGB — or (h, w, 4)
    RGBA when the frame declares a transparent index."""
    sw, sh = _screen(raw)
    gflags = raw[10]
    bg = raw[11]
    gct, i = _color_table(raw, 13, gflags)
    transparent = None
    while i < len(raw):
        b = raw[i]
        if b == 0x3B:
            raise ValueError("malformed GIF: no image frame before trailer")
        if b == 0x21:
            label = raw[i + 1]
            data, i = _sub_blocks(raw, i + 2)
            if label == 0xF9 and len(data) >= 4 and data[0] & 0x01:
                transparent = data[3]
            continue
        if b != 0x2C:
            raise ValueError(f"malformed GIF: unknown block 0x{b:02X}")
        left, top, idx, palette, i = _parse_frame(raw, i, gct)
        fh, fw = idx.shape
        # compose the frame onto the logical screen (frame 0 usually
        # covers it; smaller frames sit on the background color)
        base_idx = np.full((sh, sw), bg if gct is not None else 0, np.int32)
        base_idx[top : top + fh, left : left + fw] = idx
        rgb = palette[np.clip(base_idx, 0, palette.shape[0] - 1)]
        if transparent is not None:
            alpha = np.where(base_idx == transparent, 0, 255).astype(np.uint8)
            return np.dstack([rgb, alpha])
        return rgb
    raise ValueError("malformed GIF: no image frame")


def gif_encode(arr: np.ndarray) -> bytes:
    """Encode uint8 (h, w, 3) RGB, (h, w, 4) RGBA, or (h, w)
    palette-index grayscale as a single-frame GIF89a. RGBA maps to
    binary GIF transparency (alpha < 128 -> the frame's transparent
    index, carried in a graphic-control extension — the format has
    no partial alpha), so `gif_decode(gif_encode(rgba))` round-trips
    the alpha mask exactly. Distinct colors must fit the 256-entry
    palette (255 with transparency) — quantization is out of scope
    (PIL's job)."""
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    h, w = arr.shape[:2]
    trans_mask = None
    if arr.shape[-1] == 4:
        trans_mask = arr[..., 3].reshape(-1) < 128
        arr = arr[..., :3]
        if not trans_mask.any():
            trans_mask = None
    flat = arr.reshape(-1, 3)
    if trans_mask is not None:
        # palette from OPAQUE pixels only + one reserved slot
        colors_all, inv = np.unique(flat, axis=0, return_inverse=True)
        used = np.unique(inv[~trans_mask])
        if used.size > 255:
            raise ValueError(
                f"{used.size} distinct colors plus a transparent "
                "slot exceed GIF's 256-entry palette; quantize first (PIL)"
            )
        remap = np.zeros(colors_all.shape[0], dtype=np.int32)
        remap[used] = np.arange(used.size, dtype=np.int32)
        colors = colors_all[used]
        idx = remap[inv]
        trans_idx = int(used.size)
        idx[trans_mask] = trans_idx
        n_colors = used.size + 1
    else:
        colors, idx = np.unique(flat, axis=0, return_inverse=True)
        if colors.shape[0] > 256:
            raise ValueError(
                f"{colors.shape[0]} distinct colors exceed GIF's "
                "256-entry palette; quantize first (PIL)"
            )
        trans_idx = None
        n_colors = colors.shape[0]
    # palette size: power of two >= max(2, n)
    bits = max(2, int(np.ceil(np.log2(max(2, n_colors)))))
    n_pal = 1 << bits
    pal = np.zeros((n_pal, 3), dtype=np.uint8)
    pal[: colors.shape[0]] = colors

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    if trans_idx is not None:
        # graphic-control extension: transparency flag + index
        out += b"\x21\xf9\x04" + bytes([0x01, 0, 0, trans_idx]) + b"\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)

    min_code = bits
    body = _lzw_encode_literal(idx, min_code)
    out.append(min_code)
    for j in range(0, len(body), 255):
        chunk = body[j : j + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def gif_frames(raw: bytes, max_frames: int | None = None):
    """Composite every animation frame onto the logical screen and
    yield `(delay_ms, rgb)` pairs (uint8 (sh, sw, 3)).

    Disposal semantics (GIF89a spec §23, graphic-control packed
    field): 0/1 leave the frame in place, 2 restores the frame's
    rect to the background color, 3 restores the pre-draw pixels.
    Transparent pixels never overwrite the canvas, so partial-update
    animations (the common delta-encoded case) compose correctly.
    Reference parity: this is the decode stage a video curation
    pipeline runs per asset — the engine itself still only moves
    opaque bytes (message/interfaces.go:121-124).
    """
    sw, sh = _screen(raw)
    gflags = raw[10]
    bg = raw[11]
    gct, i = _color_table(raw, 13, gflags)
    if gct is not None:
        bg_rgb = gct[min(bg, gct.shape[0] - 1)]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    transparent: int | None = None
    delay_ms = 0
    disposal = 0
    n = 0
    while i < len(raw):
        b = raw[i]
        if b == 0x3B:
            break
        if b == 0x21:
            label = raw[i + 1]
            data, i = _sub_blocks(raw, i + 2)
            if label == 0xF9 and len(data) >= 4:
                disposal = (data[0] >> 2) & 0x07
                delay_ms = struct.unpack_from("<H", data, 1)[0] * 10
                transparent = data[3] if data[0] & 0x01 else None
            continue
        if b != 0x2C:
            raise ValueError(f"malformed GIF: unknown block 0x{b:02X}")
        left, top, idx, palette, i = _parse_frame(raw, i, gct)
        fh, fw = idx.shape
        rect = canvas[top : top + fh, left : left + fw]
        saved = rect.copy() if disposal == 3 else None
        rgb = palette[idx]
        if transparent is not None:
            mask = idx != transparent
            rect[mask] = rgb[mask]
        else:
            rect[...] = rgb
        yield delay_ms, canvas.copy()
        n += 1
        if max_frames is not None and n >= max_frames:
            return
        if disposal == 2:
            rect[...] = bg_rgb
        elif disposal == 3:
            rect[...] = saved
        disposal = 0
        transparent = None
        delay_ms = 0
    if n == 0:
        raise ValueError("malformed GIF: no image frame")


def _lzw_encode_literal(idx: np.ndarray, min_code: int) -> bytearray:
    """Literal-code LZW stream (CLEAR before any width bump) — shared
    by the static and animated encoders."""
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    acc = 0
    nbits = 0
    body = bytearray()

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    next_code = eoi + 1
    for px in idx.reshape(-1):
        if next_code >= (1 << width) - 1:
            emit(clear)
            next_code = eoi + 1
        emit(int(px))
        next_code += 1
    emit(eoi)
    if nbits:
        body.append(acc & 0xFF)
    return body


def gif_encode_anim(
    frames: list[np.ndarray], delays_ms: list[int], loop: int = 0
) -> bytes:
    """Encode full frames as an animated GIF89a: one global palette
    built from the union of all frames' colors (<= 256 else raises —
    quantization is PIL's job), a NETSCAPE2.0 loop block, and a
    graphic-control extension per frame carrying its delay. Frames
    are written whole (disposal 1) — delta encoding is an optimizer,
    not a format requirement — so `gif_frames` round-trips exactly.
    """
    if len(frames) != len(delays_ms) or not frames:
        raise ValueError("frames and delays_ms must be equal-length, non-empty")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("animated GIF frames must share dimensions")
    stack = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors, inv = np.unique(stack, axis=0, return_inverse=True)
    if colors.shape[0] > 256:
        raise ValueError(
            f"{colors.shape[0]} distinct colors exceed GIF's 256-entry "
            "palette; quantize first (PIL)"
        )
    bits = max(2, int(np.ceil(np.log2(max(2, colors.shape[0])))))
    n_pal = 1 << bits
    pal = np.zeros((n_pal, 3), dtype=np.uint8)
    pal[: colors.shape[0]] = colors

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    # NETSCAPE2.0 application extension: loop count (0 = forever)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    inv = inv.reshape(len(frames), h * w)
    for fi, delay in enumerate(delays_ms):
        out += b"\x21\xf9\x04" + bytes([0x04]) + struct.pack(
            "<H", max(0, delay) // 10
        ) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        min_code = bits
        body = _lzw_encode_literal(inv[fi], min_code)
        out.append(min_code)
        for j in range(0, len(body), 255):
            chunk = body[j : j + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
