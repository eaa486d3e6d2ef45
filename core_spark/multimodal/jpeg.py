"""Pure-stdlib+numpy baseline JPEG codec for the multimodal real
mode — extends the PNG work (VERDICT r3 ask #8) to the other
ubiquitous image format, in a container without PIL.

Scope: baseline sequential DCT (SOF0, interleaved or one-SOS-per-
component non-interleaved) AND progressive DCT (SOF2: spectral
selection, successive approximation, DC/AC first + refinement
scans, EOB runs — ITU T.81 Annex G), 8-bit samples, Huffman entropy
coding, grayscale or 3-component YCbCr with any JFIF sampling
factors (4:4:4, 4:2:0, 4:2:2 all exercised in tests), restart
intervals (DRI/RSTn). Arithmetic coding, lossless/hierarchical
modes, 12-bit precision and CMYK raise NotImplementedError naming
PIL — the loud-stub policy every other codec follows. `jpeg_meta`
parses dimensions from ANY SOFn frame without entropy-decoding.

Both modes decode through one coefficient-accumulation path: every
scan deposits bits into per-component coefficient grids;
dequantization + a vectorized IDCT run once at the end.

The encoders (baseline: Annex-K quantization at quality 50 scaled,
Annex-K Huffman tables, optional 2x2 chroma subsampling;
progressive: the same quantized coefficients re-emitted as an
8-scan script) exist so the decode paths are testable end-to-end
without fixtures from a real image library — progressive decode is
pinned pixel-exact against baseline decode of identical
coefficients — and so decode→resize→re-encode round-trips inside
the resize kernel.

Numerics: the DCT runs as an orthonormal matrix sandwich
(C @ block @ C.T) in float64 — deterministic across partitions and
platforms per IEEE 754; quantization rounds half-away-from-zero like
libjpeg's slow path. The entropy coder is bit-at-a-time Python — the
per-payload cost is real, but it rides the same Arrow `mapInPandas`
batches as every multimodal kernel, so per-batch dispatch amortizes
and a cluster image would swap in PIL/libjpeg-turbo behind the same
column contract.

Reference parity: media payloads stay opaque bytes + typed metadata
beside them, exactly how journals carry "only raw serializations"
(message/interfaces.go:121-124).
"""

from __future__ import annotations

import struct

import numpy as np

SOI = b"\xff\xd8"

# zigzag scan order: index i of the scan -> (row, col) flattened index
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.1 luminance / K.2 chrominance quantization tables (quality 50)
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 Huffman tables: (bits[1..16], huffval) per (class, id)
_HT_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_HT_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
_HT_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_HT_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c *= np.sqrt(2 / 8)
    c[0] /= np.sqrt(2)
    return c


_C = _dct_matrix()

_SOF_BASELINE = {0xC0, 0xC1}
# 0xC2 (progressive) is SUPPORTED — decoded via the Annex-G
# coefficient-accumulation path in jpeg_decode/_decode_scan.
_SOF_UNSUPPORTED = {
    0xC3: "lossless JPEG (SOF3) — needs PIL/libjpeg",
    0xC5: "differential sequential JPEG — needs PIL/libjpeg",
    0xC6: "differential progressive JPEG — needs PIL/libjpeg",
    0xC7: "differential lossless JPEG — needs PIL/libjpeg",
    0xC9: "arithmetic-coded JPEG (SOF9) — needs PIL/libjpeg",
    0xCA: "arithmetic progressive JPEG — needs PIL/libjpeg",
    0xCB: "arithmetic lossless JPEG — needs PIL/libjpeg",
}
_ALL_SOF = (
    _SOF_BASELINE | {0xC2} | set(_SOF_UNSUPPORTED) | {0xCD, 0xCE, 0xCF}
)


def _segments(raw: bytes):
    """Yield (marker, payload, payload_offset) for each marker segment
    before entropy data; the SOS payload ends where the scan begins."""
    if raw[:2] != SOI:
        raise ValueError("malformed JPEG: missing SOI")
    i = 2
    while i + 4 <= len(raw):
        if raw[i] != 0xFF:
            raise ValueError(f"malformed JPEG: expected marker at {i}")
        m = raw[i + 1]
        if m == 0xD9:  # EOI
            return
        if m in (0x01,) or 0xD0 <= m <= 0xD7:  # standalone
            i += 2
            continue
        (ln,) = struct.unpack(">H", raw[i + 2 : i + 4])
        if i + 2 + ln > len(raw):
            raise ValueError(f"malformed JPEG: segment 0x{m:02X} truncated")
        yield m, raw[i + 4 : i + 2 + ln], i + 4
        i += 2 + ln
        if m == 0xDA:  # start of scan: entropy data follows
            return
    raise ValueError("malformed JPEG: ran out of data before SOS/EOI")


def jpeg_meta(raw: bytes) -> tuple[int, int, int]:
    """(width, height, n_components) from any SOFn — no entropy
    decode, so this works for progressive files too."""
    for m, data, _ in _segments(raw):
        if m in _ALL_SOF:
            if len(data) < 6:
                raise ValueError("malformed JPEG: short SOF")
            _prec, h, w, nc = struct.unpack(">BHHB", data[:6])
            return w, h, nc
    raise ValueError("malformed JPEG: no SOF frame header")


def _build_huffman(bits, vals):
    """(code, length) -> symbol map per JPEG Annex C code assignment."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy data with 0xFF00 byte
    de-stuffing; stops at any non-RST marker."""

    def __init__(self, raw: bytes, pos: int):
        self.raw = raw
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        if self.pos >= len(self.raw):
            raise ValueError("malformed JPEG: truncated entropy data")
        b = self.raw[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.raw):
                raise ValueError("malformed JPEG: truncated entropy data")
            nxt = self.raw[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt & 0x07)
            else:
                raise ValueError(
                    f"malformed JPEG: marker 0x{nxt:02X} inside scan"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8
        # keep only the live bits: without this mask the accumulator
        # retains every byte ever read and the bigint shifts make the
        # whole decode quadratic in entropy size (measured 13x per 4x
        # pixels before the fix)
        self.acc &= (1 << self.n) - 1

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self):
        """Consume padding bits + the RSTn marker itself."""
        self.n = 0
        self.acc = 0
        while True:
            if self.pos + 1 >= len(self.raw):
                raise ValueError(
                    "malformed JPEG: truncated before restart marker"
                )
            if self.raw[self.pos] == 0xFF and (
                0xD0 <= self.raw[self.pos + 1] <= 0xD7
            ):
                break
            self.pos += 1
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, idx):
        self.idx = idx


def _decode_huff(r: _BitReader, table) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | r.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("malformed JPEG: invalid Huffman code in scan")


def _extend(v: int, t: int) -> int:
    # JPEG F.2.2.1 sign extension of a t-bit magnitude
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_decode(raw: bytes) -> np.ndarray:
    """Decode a baseline OR progressive JPEG to uint8 (h, w)
    grayscale or (h, w, 3) RGB.

    Both modes flow through one coefficient-accumulation path
    (ITU T.81 Annex G): every scan — a full baseline scan, a
    non-interleaved baseline scan (one SOS per component), a
    progressive DC/AC first scan, or a successive-approximation
    refinement — deposits bits into per-component coefficient grids;
    dequantization and the IDCT run once at the end, vectorized over
    all blocks of each plane."""
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    progressive = False
    restart = 0
    coeffs: list[np.ndarray] | None = None
    scans_done = 0

    if raw[:2] != SOI:
        raise ValueError("malformed JPEG: missing SOI")
    i = 2
    while True:
        if i + 2 > len(raw):
            raise ValueError("malformed JPEG: ran out of data before EOI")
        if raw[i] != 0xFF:
            raise ValueError(f"malformed JPEG: expected marker at {i}")
        m = raw[i + 1]
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:  # standalone
            i += 2
            continue
        if i + 4 > len(raw):
            raise ValueError("malformed JPEG: ran out of data before EOI")
        (ln,) = struct.unpack(">H", raw[i + 2 : i + 4])
        if i + 2 + ln > len(raw):
            raise ValueError(f"malformed JPEG: segment 0x{m:02X} truncated")
        data = raw[i + 4 : i + 2 + ln]
        seg_end = i + 2 + ln
        if m in _SOF_UNSUPPORTED:
            raise NotImplementedError(_SOF_UNSUPPORTED[m])
        if m in _SOF_BASELINE or m == 0xC2:
            progressive = m == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", data[:6])
            if prec != 8:
                raise NotImplementedError(
                    f"{prec}-bit JPEG precision — needs PIL/libjpeg"
                )
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"{nc}-component JPEG (CMYK?) — needs PIL/libjpeg"
                )
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", data, 6 + 3 * c)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif m == 0xDB:  # DQT
            j = 0
            while j < len(data):
                pq, tq = data[j] >> 4, data[j] & 15
                j += 1
                if pq:
                    vals = np.frombuffer(
                        data[j : j + 128], dtype=">u2"
                    ).astype(np.int32)
                    j += 128
                else:
                    vals = np.frombuffer(
                        data[j : j + 64], dtype=np.uint8
                    ).astype(np.int32)
                    j += 64
                z = np.zeros(64, dtype=np.int32)
                z[_ZZ] = vals
                qt[tq] = z.reshape(8, 8)
        elif m == 0xC4:  # DHT
            j = 0
            while j < len(data):
                tc, th = data[j] >> 4, data[j] & 15
                bits = list(data[j + 1 : j + 17])
                n = sum(bits)
                vals = list(data[j + 17 : j + 17 + n])
                huff[(tc, th)] = _build_huffman(bits, vals)
                j += 17 + n
        elif m == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", data[:2])
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("malformed JPEG: SOS before SOF")
            ns = data[0]
            scan = []
            for c in range(ns):
                cs, tdta = data[1 + 2 * c], data[2 + 2 * c]
                scan.append({"cs": cs, "td": tdta >> 4, "ta": tdta & 15})
            # Ss/Se/AhAl trail every SOS; baseline fixes them 0/63/0
            ss_, se_, ahal = data[1 + 2 * ns], data[2 + 2 * ns], data[
                3 + 2 * ns
            ]
            ah, al = ahal >> 4, ahal & 15
            if not progressive:
                ss_, se_, ah, al = 0, 63, 0, 0
            if coeffs is None:
                comps = frame["comps"]
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
                mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
                coeffs = [
                    np.zeros(
                        (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64
                    )
                    for c in comps
                ]
            i = _decode_scan(
                raw, seg_end, frame, scan, huff, restart, coeffs,
                ss_, se_, ah, al, progressive,
            )
            scans_done += 1
            continue
        i = seg_end

    if frame is None or scans_done == 0:
        raise ValueError("malformed JPEG: missing SOF or SOS")

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out = []
    for ci, comp in enumerate(comps):
        q = qt.get(comp["tq"])
        if q is None:
            raise ValueError(
                f"malformed JPEG: missing quantization table {comp['tq']}"
            )
        by, bx = coeffs[ci].shape[:2]
        zz = coeffs[ci].reshape(-1, 64).astype(np.float64)
        nat = np.zeros_like(zz)
        nat[:, _ZZ] = zz
        blocks = nat.reshape(-1, 8, 8) * q
        pix = np.einsum("ij,njk,kl->nil", _C.T, blocks, _C) + 128.0
        p = pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(
            by * 8, bx * 8
        )
        if comp["h"] != hmax or comp["v"] != vmax:
            p = np.repeat(
                np.repeat(p, vmax // comp["v"], axis=0),
                hmax // comp["h"],
                axis=1,
            )
        out.append(p[: frame["h"], : frame["w"]])
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out
    rch = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([rch, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def _decode_scan(
    raw, pos, frame, scan, huff, restart, coeffs, ss_, se_, ah, al,
    progressive,
) -> int:
    """Entropy-decode one scan into the coefficient grids; returns
    the byte offset of the next marker after the scan's data.

    Dispatch (T.81 G.2): baseline scans decode full blocks; a
    progressive scan is either DC (Ss=0, interleaving allowed) or AC
    (Ss>0, exactly one component, the component's OWN block grid in
    raster order), and either first (Ah=0, magnitudes shifted left by
    Al) or refinement (Ah>0, one correction bit per coefficient)."""
    comps = frame["comps"]
    by_id = {c["id"]: idx for idx, c in enumerate(comps)}
    order = [by_id[s["cs"]] for s in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)

    if progressive:
        if ss_ == 0 and se_ != 0:
            raise ValueError("malformed JPEG: DC scan with Se != 0")
        if ss_ > 0 and len(scan) != 1:
            raise ValueError(
                "malformed JPEG: progressive AC scan must be "
                "non-interleaved"
            )

    r = _BitReader(raw, pos)
    state = {"eobrun": 0}

    def decode_into(blk, si):
        s = scan[si]
        if not progressive:
            dc_t = huff[(0, s["td"])]
            ac_t = huff[(1, s["ta"])]
            _decode_block(r, dc_t, ac_t, blk, pred, order[si])
        elif ss_ == 0:
            if ah == 0:
                t = _decode_huff(r, huff[(0, s["td"])])
                pred[order[si]] += _extend(r.bits(t), t)
                blk[0] = pred[order[si]] << al
            else:
                # DC refinement: the next lower bit of every DC value
                if r.bit():
                    blk[0] |= 1 << al
        else:
            ac_t = huff[(1, s["ta"])]
            if ah == 0:
                _first_ac(r, ac_t, blk, ss_, se_, al, state)
            else:
                _refine_ac(r, ac_t, blk, ss_, se_, al, state)

    try:
        if len(scan) == 1 and (progressive and ss_ > 0 or len(comps) > 1):
            # non-interleaved: the single component's own block grid
            ci = order[0]
            comp = comps[ci]
            cw = (frame["w"] * comp["h"] + hmax - 1) // hmax
            ch = (frame["h"] * comp["v"] + vmax - 1) // vmax
            bw, bh = (cw + 7) // 8, (ch + 7) // 8
            pred = [0] * len(comps)
            blk_i = 0
            for byy in range(bh):
                for bxx in range(bw):
                    if restart and blk_i and blk_i % restart == 0:
                        r.align_restart()
                        pred = [0] * len(comps)
                        state["eobrun"] = 0
                    blk_i += 1
                    decode_into(coeffs[ci][byy, bxx], 0)
        else:
            pred = [0] * len(comps)
            mcu_i = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart and mcu_i and mcu_i % restart == 0:
                        r.align_restart()
                        pred = [0] * len(comps)
                        state["eobrun"] = 0
                    mcu_i += 1
                    for si, ci in enumerate(order):
                        comp = comps[ci]
                        for v in range(comp["v"]):
                            for hh in range(comp["h"]):
                                decode_into(
                                    coeffs[ci][
                                        my * comp["v"] + v,
                                        mx * comp["h"] + hh,
                                    ],
                                    si,
                                )
    except _RestartMarker:
        raise ValueError("malformed JPEG: restart inside block") from None

    # the scan's entropy data ends at the next true marker (stuffed
    # 0xFF00 and stray RSTn are data, not boundaries)
    p = r.pos
    while p + 1 < len(raw):
        if raw[p] == 0xFF and raw[p + 1] != 0x00 and not (
            0xD0 <= raw[p + 1] <= 0xD7
        ):
            return p
        p += 1
    raise ValueError("malformed JPEG: ran out of data before EOI")


def _decode_block(r: _BitReader, dc_t, ac_t, blk, pred, ci) -> None:
    """Full baseline block (DC diff + AC run-lengths) into `blk`."""
    t = _decode_huff(r, dc_t)
    pred[ci] += _extend(r.bits(t), t)
    blk[0] = pred[ci]
    k = 1
    while k < 64:
        rs = _decode_huff(r, ac_t)
        rr, sz = rs >> 4, rs & 15
        if sz == 0:
            if rr == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += rr
        if k > 63:
            raise ValueError("malformed JPEG: AC run past block end")
        blk[k] = _extend(r.bits(sz), sz)
        k += 1


def _first_ac(r: _BitReader, ac_t, blk, ss_, se_, al, state) -> None:
    """Progressive AC first scan (T.81 G.1.2.2): run-length coded
    magnitudes shifted left by Al, plus EOBn codes carrying a run of
    all-further-zero blocks."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss_
    while k <= se_:
        rs = _decode_huff(r, ac_t)
        rr, sz = rs >> 4, rs & 15
        if sz == 0:
            if rr == 15:  # ZRL: 16 zeros
                k += 16
                continue
            state["eobrun"] = (1 << rr) - 1
            if rr:
                state["eobrun"] += r.bits(rr)
            break
        k += rr
        if k > se_:
            raise ValueError("malformed JPEG: AC run past band end")
        blk[k] = _extend(r.bits(sz), sz) << al
        k += 1


def _refine_ac(r: _BitReader, ac_t, blk, ss_, se_, al, state) -> None:
    """Progressive AC refinement (T.81 G.1.2.3): one correction bit
    for each already-nonzero coefficient in the band; zero-history
    positions receive new ±1<<Al coefficients via run-length codes.
    Two's-complement `& p1` equals the magnitude-bit test because
    history coefficients are multiples of 1<<Al."""
    p1 = 1 << al
    m1 = -p1
    k = ss_
    if state["eobrun"] == 0:
        while k <= se_:
            rs = _decode_huff(r, ac_t)
            rr, sz = rs >> 4, rs & 15
            newval = 0
            if sz == 0:
                if rr != 15:
                    state["eobrun"] = 1 << rr
                    if rr:
                        state["eobrun"] += r.bits(rr)
                    break
                # rr == 15: skip 16 zero-history coefficients
            else:
                if sz != 1:
                    raise ValueError(
                        "malformed JPEG: AC refinement magnitude != 1"
                    )
                newval = p1 if r.bit() else m1
            # advance over `rr` zero-history positions, refining any
            # nonzero-history coefficient passed along the way
            while k <= se_:
                if blk[k] != 0:
                    if r.bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if newval and k <= se_:
                blk[k] = newval
            k += 1
    if state["eobrun"] > 0:
        # inside an EOB run: zero-history stays zero, but nonzero
        # coefficients still receive their correction bits
        while k <= se_:
            if blk[k] != 0 and r.bit() and (blk[k] & p1) == 0:
                blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


# ------------------------------------------------------------- encoder
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, ln: int):
        self.acc = (self.acc << ln) | code
        self.n += ln
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        # drop emitted bits — an unmasked accumulator grows with the
        # whole stream and turns encoding quadratic (same trap as the
        # reader)
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _enc_table(bits, vals):
    m, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            m[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return m


def _mag(v: int) -> tuple[int, int]:
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _encode_plane_block(w, blk, q, dc_map, ac_map, pred):
    coef = _C @ (blk - 128.0) @ _C.T
    qz = np.sign(coef) * np.floor(np.abs(coef) / q + 0.5)
    z = qz.reshape(-1)[_ZZ].astype(np.int64)
    diff = int(z[0]) - pred
    t, mv = _mag(diff)
    c, ln = dc_map[t]
    w.write(c, ln)
    if t:
        w.write(mv, t)
    run = 0
    last = 63
    while last > 0 and z[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        if z[k] == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_map[0xF0]
            w.write(c, ln)
            run -= 16
        t, mv = _mag(int(z[k]))
        c, ln = ac_map[(run << 4) | t]
        w.write(c, ln)
        w.write(mv, t)
        run = 0
    if last < 63:
        c, ln = ac_map[0x00]
        w.write(c, ln)
    return int(z[0])


def quant_scale(quality: int) -> int:
    """The public IJG quality→scale mapping (jcparam.c): scale =
    5000/Q below 50, 200−2Q at and above. Table value k becomes
    clip((K_k*scale + 50) // 100, 1, 255); quality 50 is the Annex-K
    table verbatim."""
    if not 1 <= quality <= 100:
        raise ValueError("quality out of [1, 100]")
    return 5000 // quality if quality < 50 else 200 - 2 * quality


def _scaled(zzvals: np.ndarray, quality: int) -> np.ndarray:
    s = quant_scale(quality)
    return np.clip((zzvals * s + 50) // 100, 1, 255).astype(np.int32)


def jpeg_quant_tables(raw: bytes) -> dict[int, list[int]]:
    """DQT walk: {table id: [64 zigzag-order values]} — the metadata
    a recompression-quality estimator reads (no entropy decode)."""
    out: dict[int, list[int]] = {}
    for m, data, _ in _segments(raw):
        if m != 0xDB:
            continue
        i = 0
        while i < len(data):
            pq, tq = data[i] >> 4, data[i] & 0xF
            i += 1
            if pq not in (0, 1):
                raise ValueError(f"malformed JPEG: DQT precision {pq}")
            n = 64 * (2 if pq else 1)
            if i + n > len(data):
                raise ValueError("malformed JPEG: truncated DQT")
            if pq:
                vals = [
                    int.from_bytes(data[i + 2 * k : i + 2 * k + 2], "big")
                    for k in range(64)
                ]
            else:
                vals = [data[i + k] for k in range(64)]
            out[tq] = vals
            i += n
    if not out:
        raise ValueError("malformed JPEG: no DQT segment")
    return out


def jpeg_encode(
    arr: np.ndarray,
    subsample: bool = False,
    restart_interval: int = 0,
    quality: int = 50,
) -> bytes:
    """Encode uint8 (h, w) grayscale or (h, w, 3) RGB as baseline
    JPEG (Annex-K tables scaled by `quality` per the IJG mapping —
    the default 50 is the tables verbatim, byte-identical to the
    pre-quality-knob encoder; `subsample` switches chroma to 4:2:0;
    `restart_interval` > 0 emits DRI + RSTn every N MCUs)."""
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64)]
        samp = [(1, 1)]
        qids = [0]
    else:
        a = arr.astype(np.float64)
        y = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
        cb = 128.0 - 0.168736 * a[..., 0] - 0.331264 * a[..., 1] + 0.5 * a[..., 2]
        cr = 128.0 + 0.5 * a[..., 0] - 0.418688 * a[..., 1] - 0.081312 * a[..., 2]
        if subsample:
            he, we = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cbp = np.pad(cb, ((0, he - h), (0, we - w)), mode="edge")
            crp = np.pad(cr, ((0, he - h), (0, we - w)), mode="edge")
            cb = cbp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qids = [0, 1, 1]

    qzz = {0: _scaled(_QL, quality), 1: _scaled(_QC, quality)}
    qmats = {}
    for tq, zzvals in qzz.items():
        z = np.zeros(64, dtype=np.int32)
        z[_ZZ] = zzvals
        qmats[tq] = z.reshape(8, 8).astype(np.float64)

    out = bytearray(SOI)
    for tq, zzvals in qzz.items():
        if gray and tq == 1:
            continue
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(
            int(v) for v in zzvals
        )
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += struct.pack(
            ">BBB", i + 1, (samp[i][0] << 4) | samp[i][1], qids[i]
        )
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    tables = [(0, 0, _HT_DC_L), (1, 0, _HT_AC_L)]
    if not gray:
        tables += [(0, 1, _HT_DC_C), (1, 1, _HT_AC_C)]
    enc_maps = {}
    for tc, th, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(
            ">HB", 2 + 1 + 16 + len(vals), (tc << 4) | th
        ) + bytes(bits) + bytes(vals)
        enc_maps[(tc, th)] = _enc_table(bits, vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for i in range(nc):
        td = 0 if i == 0 or gray else 1
        sos += bytes([i + 1, (td << 4) | td])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for i, p in enumerate(planes):
        ph = mcuy * samp[i][1] * 8
        pw = mcux * samp[i][0] * 8
        padded.append(
            np.pad(
                p,
                ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                mode="edge",
            )
        )
    bw = _BitWriter()
    pred = [0] * nc
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.flush()
                bw.out += bytes(
                    [0xFF, 0xD0 + ((mcu_i // restart_interval - 1) % 8)]
                )
                pred = [0] * nc
            mcu_i += 1
            for i in range(nc):
                td = 0 if i == 0 or gray else 1
                q = qmats[qids[i]]
                for v in range(samp[i][1]):
                    for hh in range(samp[i][0]):
                        y0 = (my * samp[i][1] + v) * 8
                        x0 = (mx * samp[i][0] + hh) * 8
                        pred[i] = _encode_plane_block(
                            bw,
                            padded[i][y0 : y0 + 8, x0 : x0 + 8],
                            q,
                            enc_maps[(0, td)],
                            enc_maps[(1, td)],
                            pred[i],
                        )
    bw.flush()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


# -------------------------------------------------- progressive encoder
#
# Exists for the same reason as the baseline encoder: so the decode
# path is testable end-to-end without fixtures from a real image
# library. It re-emits the EXACT quantized coefficients the baseline
# encoder produces (same per-block DCT expression, same rounding) as
# a progressive scan script — DC first/refine, spectral-selection AC
# bands, one successive-approximation refinement — so
# jpeg_decode(progressive bytes) must equal jpeg_decode(baseline
# bytes) pixel-for-pixel. Huffman tables are fixed-length canonical
# tables (DC: 12 symbols x 4 bits; AC: 256 symbols x 9 bits, both
# leaving the all-ones code unassigned per Annex C) — valid, if not
# minimal, so no frequency pass is needed.


def _quantized_coeffs(arr: np.ndarray, subsample: bool):
    """Per-component zigzag quantized coefficient grids, computed with
    the baseline encoder's exact per-block arithmetic."""
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64)]
        samp = [(1, 1)]
        qids = [0]
    else:
        a = arr.astype(np.float64)
        y = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
        cb = (
            128.0 - 0.168736 * a[..., 0] - 0.331264 * a[..., 1]
            + 0.5 * a[..., 2]
        )
        cr = (
            128.0 + 0.5 * a[..., 0] - 0.418688 * a[..., 1]
            - 0.081312 * a[..., 2]
        )
        if subsample:
            he, we = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cbp = np.pad(cb, ((0, he - h), (0, we - w)), mode="edge")
            crp = np.pad(cr, ((0, he - h), (0, we - w)), mode="edge")
            cb = cbp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qids = [0, 1, 1]

    qzz = {0: _QL, 1: _QC}
    qmats = {}
    for tq, zzvals in qzz.items():
        z = np.zeros(64, dtype=np.int32)
        z[_ZZ] = zzvals
        qmats[tq] = z.reshape(8, 8).astype(np.float64)

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    coeffs = []
    for i, p in enumerate(planes):
        by, bx = mcuy * samp[i][1], mcux * samp[i][0]
        pp = np.pad(
            p, ((0, by * 8 - p.shape[0]), (0, bx * 8 - p.shape[1])),
            mode="edge",
        )
        q = qmats[qids[i]]
        grid = np.zeros((by, bx, 64), dtype=np.int64)
        for yy in range(by):
            for xx in range(bx):
                blk = pp[yy * 8 : yy * 8 + 8, xx * 8 : xx * 8 + 8]
                coef = _C @ (blk - 128.0) @ _C.T
                qz = np.sign(coef) * np.floor(np.abs(coef) / q + 0.5)
                grid[yy, xx] = qz.reshape(-1)[_ZZ].astype(np.int64)
        coeffs.append(grid)
    return gray, h, w, samp, qids, coeffs, mcux, mcuy


# flat canonical tables (all-ones codeword unassigned per Annex C;
# a DHT count byte maxes at 255, so the AC table is 255 nine-bit
# codes plus one ten-bit)
_P_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_P_DC_VALS = list(range(12))
_P_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_P_AC_VALS = list(range(256))
_P_DC_MAP = _enc_table(_P_DC_BITS, _P_DC_VALS)
_P_AC_MAP = _enc_table(_P_AC_BITS, _P_AC_VALS)


def _emit_eobrun(bw: "_BitWriter", st: dict) -> None:
    if st["eobrun"] > 0:
        eb = st["eobrun"]
        rr = eb.bit_length() - 1
        c, ln = _P_AC_MAP[rr << 4]
        bw.write(c, ln)
        if rr:
            bw.write(eb - (1 << rr), rr)
        for b in st["be"]:
            bw.write(b, 1)
        st["eobrun"] = 0
        st["be"] = []


def _enc_ac_first_block(bw, band, al, st) -> None:
    t = [
        (1 if v > 0 else -1) * (abs(int(v)) >> al) if v else 0
        for v in band
    ]
    nz = [k for k, v in enumerate(t) if v]
    if not nz:
        st["eobrun"] += 1
        if st["eobrun"] == 0x7FFF:
            _emit_eobrun(bw, st)
        return
    run = 0
    for k, v in enumerate(t):
        if v == 0:
            run += 1
            continue
        _emit_eobrun(bw, st)
        while run > 15:
            c, ln = _P_AC_MAP[0xF0]
            bw.write(c, ln)
            run -= 16
        sz, mv = _mag(v)
        c, ln = _P_AC_MAP[(run << 4) | sz]
        bw.write(c, ln)
        bw.write(mv, sz)
        run = 0
    if run > 0:
        st["eobrun"] += 1
        if st["eobrun"] == 0x7FFF:
            _emit_eobrun(bw, st)


def _enc_ac_refine_block(bw, band, al, st) -> None:
    absv = [abs(int(v)) >> al for v in band]
    eobpos = max((k for k, a in enumerate(absv) if a == 1), default=-1)
    run = 0
    br: list[int] = []
    for k, a in enumerate(absv):
        if a == 0:
            run += 1
            continue
        # the ZRL resolution runs at EVERY nonzero (history included)
        # — that ordering is what keeps the decoder's positional
        # correction-bit reads aligned with the flushed buffer
        while run > 15 and k <= eobpos:
            _emit_eobrun(bw, st)
            c, ln = _P_AC_MAP[0xF0]
            bw.write(c, ln)
            run -= 16
            for b in br:
                bw.write(b, 1)
            br = []
        if a > 1:
            br.append(a & 1)
            continue
        _emit_eobrun(bw, st)
        c, ln = _P_AC_MAP[(run << 4) | 1]
        bw.write(c, ln)
        bw.write(1 if band[k] > 0 else 0, 1)
        for b in br:
            bw.write(b, 1)
        br = []
        run = 0
    if run > 0 or br:
        st["eobrun"] += 1
        st["be"].extend(br)
        if st["eobrun"] == 0x7FFF:
            _emit_eobrun(bw, st)


def jpeg_encode_progressive(
    arr: np.ndarray, subsample: bool = False
) -> bytes:
    """Encode uint8 grayscale/RGB as a progressive JPEG (SOF2) whose
    quantized coefficients exactly equal the baseline encoder's."""
    gray, h, w, samp, qids, coeffs, mcux, mcuy = _quantized_coeffs(
        arr, subsample
    )
    nc = len(coeffs)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    out = bytearray(SOI)
    for tq, zzvals in ((0, _QL), (1, _QC)):
        if gray and tq == 1:
            continue
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(
            int(v) for v in zzvals
        )
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += struct.pack(
            ">BBB", i + 1, (samp[i][0] << 4) | samp[i][1], qids[i]
        )
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    out += b"\xff\xc4" + struct.pack(
        ">HB", 2 + 1 + 16 + len(_P_DC_VALS), 0x00
    ) + bytes(_P_DC_BITS) + bytes(_P_DC_VALS)
    out += b"\xff\xc4" + struct.pack(
        ">HB", 2 + 1 + 16 + len(_P_AC_VALS), 0x10
    ) + bytes(_P_AC_BITS) + bytes(_P_AC_VALS)

    def sos_header(comp_ids, ss_, se_, ah, al):
        b = bytes([len(comp_ids)])
        for cid in comp_ids:
            b += bytes([cid + 1, 0x00])
        b += bytes([ss_, se_, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(b)) + b

    def mcu_blocks():
        """(ci, blk) in interleaved MCU order over ALL components."""
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(nc):
                    sh, sv = samp[ci]
                    for v in range(sv):
                        for hh in range(sh):
                            yield ci, coeffs[ci][my * sv + v, mx * sh + hh]

    def comp_blocks(ci):
        """The component's OWN grid in raster order (non-interleaved:
        padding blocks outside it are never coded)."""
        cw = (w * samp[ci][0] + hmax - 1) // hmax
        ch = (h * samp[ci][1] + vmax - 1) // vmax
        bw_, bh_ = (cw + 7) // 8, (ch + 7) // 8
        for byy in range(bh_):
            for bxx in range(bw_):
                yield coeffs[ci][byy, bxx]

    # --- scan 1: DC first, interleaved, Al=1
    bw = _BitWriter()
    pred = [0] * nc
    for ci, blk in mcu_blocks():
        dcv = int(blk[0]) >> 1
        diff = dcv - pred[ci]
        pred[ci] = dcv
        sz, mv = _mag(diff)
        c, ln = _P_DC_MAP[sz]
        bw.write(c, ln)
        if sz:
            bw.write(mv, sz)
    bw.flush()
    out += sos_header(list(range(nc)), 0, 0, 0, 1) + bw.out

    # --- AC first scans, Al=1: luma split into two spectral bands
    ac_bands = [(0, 1, 5)] if nc > 1 else [(0, 1, 5)]
    if nc > 1:
        ac_bands += [(1, 1, 63), (2, 1, 63), (0, 6, 63)]
    else:
        ac_bands += [(0, 6, 63)]
    for ci, ss_, se_ in ac_bands:
        bw = _BitWriter()
        st = {"eobrun": 0, "be": []}
        for blk in comp_blocks(ci):
            _enc_ac_first_block(bw, blk[ss_ : se_ + 1], 1, st)
        _emit_eobrun(bw, st)
        bw.flush()
        out += sos_header([ci], ss_, se_, 0, 1) + bw.out

    # --- DC refine, interleaved, Ah=1 Al=0: one raw bit per block
    bw = _BitWriter()
    for ci, blk in mcu_blocks():
        bw.write(int(blk[0]) & 1, 1)
    bw.flush()
    out += sos_header(list(range(nc)), 0, 0, 1, 0) + bw.out

    # --- AC refine scans, Ah=1 Al=0
    for ci in range(nc):
        bw = _BitWriter()
        st = {"eobrun": 0, "be": []}
        for blk in comp_blocks(ci):
            _enc_ac_refine_block(bw, blk[1:64], 0, st)
        _emit_eobrun(bw, st)
        bw.flush()
        out += sos_header([ci], 1, 63, 1, 0) + bw.out

    return bytes(out + b"\xff\xd9")
