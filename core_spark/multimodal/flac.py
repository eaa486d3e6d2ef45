"""Pure-stdlib FLAC codec for the multimodal real mode — the common
lossless audio format in scraped corpora, in a container without
libsndfile/pyav.

Decoder scope: the full static FLAC subset a curation pipeline
meets — STREAMINFO metadata walk, frames with CONSTANT / VERBATIM /
FIXED (orders 0-4) / LPC (any order) subframes, both Rice residual
coding methods (4- and 5-bit parameters, escape-to-raw partitions),
wasted bits, and all four channel assignments (independent,
left/side, right/side, mid/side). CRC-8 frame-header and CRC-16
frame checksums are verified; mismatches raise named ValueErrors.

The encoder exists for tests and round-trips: per spec it writes
FIXED subframes (best of orders 0-2 by residual magnitude, order-0
Rice partition, parameter chosen from the mean residual) falling
back to VERBATIM when Rice would expand, so the decoder's
prediction + Rice paths are exercised by construction. Like the
image codecs (png.py, jpeg.py, gif.py) this is honest per-batch
Python cost behind the same Arrow column contract a cluster image
would serve with libFLAC.

Reference parity: the engine moves opaque serializations only
(message/interfaces.go:121-124); codec work happens in executor-side
kernels (columns.py), never in the engine.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"fLaC"

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}

_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc_tables() -> tuple[list[int], list[int]]:
    t8, t16 = [], []
    for b in range(256):
        crc = b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
        t8.append(crc)
        crc = b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
        t16.append(crc)
    return t8, t16


_CRC8_TABLE, _CRC16_TABLE = _crc_tables()


def _crc8(data: bytes) -> int:
    crc = 0
    t = _CRC8_TABLE
    for b in data:
        crc = t[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    t = _CRC16_TABLE
    for b in data:
        crc = t[(crc >> 8) ^ b] ^ ((crc << 8) & 0xFFFF)
    return crc


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        # One int.from_bytes over the touched span instead of a
        # per-byte Python loop — same bits, same truncation error.
        total = self.bit + n
        nbytes = (total + 7) >> 3
        byte = self.byte
        chunk = self.data[byte : byte + nbytes]
        if len(chunk) < nbytes:
            raise ValueError("malformed FLAC: bitstream truncated")
        out = (
            int.from_bytes(chunk, "big") >> ((nbytes << 3) - total)
        ) & ((1 << n) - 1)
        self.byte = byte + (total >> 3)
        self.bit = total & 7
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        # Scan whole zero bytes at C speed; the terminating 1 bit is
        # located with bit_length. Same bits consumed, same
        # truncation error when the stream ends inside the zeros.
        data, n = self.data, len(self.data)
        byte, bit = self.byte, self.bit
        q = 0
        while True:
            if byte >= n:
                raise ValueError("malformed FLAC: bitstream truncated")
            cur = data[byte] & ((1 << (8 - bit)) - 1)
            if cur == 0:
                q += 8 - bit
                byte += 1
                bit = 0
                continue
            hb = cur.bit_length()  # 1..8-bit position of the first 1
            q += (8 - bit) - hb
            bit = 8 - hb + 1
            if bit == 8:
                byte += 1
                bit = 0
            self.byte, self.bit = byte, bit
            return q

    def align(self):
        if self.bit:
            self.bit = 0
            self.byte += 1


def _read_utf8_number(r: _BitReader) -> int:
    """UTF-8-style variable-length frame/sample number."""
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("malformed FLAC: bad UTF-8 frame number")
    v = b0 & (0xFF >> (n + 1))
    for _ in range(n - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("malformed FLAC: bad UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _write_utf8_number(w, fi: int) -> None:
    """General n-byte (n <= 7, 36-bit) UTF-8-style frame number —
    the encoder twin of `_read_utf8_number`. A fixed 3-byte cap
    would corrupt the lead byte past frame 0x10000 (~101 minutes of
    mono 44.1 kHz at block 4096): 0xE0 | (fi >> 12) overflows the
    3-byte form's 4 payload bits."""
    if fi < 0x80:
        w.write(fi, 8)
        return
    n = 2
    while n < 7 and fi >= (1 << (6 * (n - 1) + (7 - n))):
        n += 1
    if fi >= (1 << (6 * (n - 1) + (7 - n))):
        raise ValueError("FLAC frame number exceeds the 36-bit limit")
    w.write(((0xFF00 >> n) & 0xFF) | (fi >> (6 * (n - 1))), 8)
    for i in range(n - 2, -1, -1):
        w.write(0x80 | ((fi >> (6 * i)) & 0x3F), 8)


def flac_meta(raw: bytes) -> tuple[int, int, int, int]:
    """(sample_rate, channels, bits_per_sample, total_samples) from
    STREAMINFO (no frame decode)."""
    if raw[:4] != MAGIC:
        raise ValueError("malformed FLAC: bad signature")
    i = 4
    while True:
        if i + 4 > len(raw):
            raise ValueError("malformed FLAC: metadata truncated")
        hdr = raw[i]
        length = int.from_bytes(raw[i + 1 : i + 4], "big")
        body = raw[i + 4 : i + 4 + length]
        if hdr & 0x7F == 0:  # STREAMINFO
            if length < 34:
                raise ValueError("malformed FLAC: STREAMINFO truncated")
            bits = int.from_bytes(body[10:18], "big")
            rate = bits >> 44
            nch = ((bits >> 41) & 0x07) + 1
            bps = ((bits >> 36) & 0x1F) + 1
            total = bits & ((1 << 36) - 1)
            return rate, nch, bps, total
        i += 4 + length
        if hdr & 0x80:
            raise ValueError("malformed FLAC: no STREAMINFO block")


def _skip_metadata(raw: bytes) -> int:
    i = 4
    while True:
        hdr = raw[i]
        length = int.from_bytes(raw[i + 1 : i + 4], "big")
        i += 4 + length
        if hdr & 0x80:
            return i


def _read_residual(r: _BitReader, block_size: int, pred_order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("malformed FLAC: reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = r.read(4)
    n_parts = 1 << part_order
    if block_size % n_parts:
        raise ValueError("malformed FLAC: partition order mismatch")
    out: list[int] = []
    for p in range(n_parts):
        n = block_size >> part_order
        if p == 0:
            n -= pred_order
        k = r.read(pbits)
        if k == escape:
            nbits = r.read(5)
            for _ in range(n):
                out.append(r.read_signed(nbits) if nbits else 0)
        else:
            for _ in range(n):
                q = r.read_unary()
                v = (q << k) | r.read(k) if k else q
                out.append((v >> 1) ^ -(v & 1))  # un-zigzag
    return out


def _read_subframe(r: _BitReader, block_size: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("malformed FLAC: subframe padding bit set")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
        bps -= wasted
    if ftype == 0:  # CONSTANT
        v = r.read_signed(bps)
        samples = [v] * block_size
    elif ftype == 1:  # VERBATIM
        samples = [r.read_signed(bps) for _ in range(block_size)]
    elif 8 <= ftype <= 12:  # FIXED
        order = ftype - 8
        samples = [r.read_signed(bps) for _ in range(order)]
        resid = _read_residual(r, block_size, order)
        coeffs = _FIXED_COEFFS[order]
        for i, e in enumerate(resid):
            pred = sum(
                c * samples[order + i - j - 1] for j, c in enumerate(coeffs)
            )
            samples.append(e + pred)
    elif ftype >= 32:  # LPC
        order = ftype - 31
        samples = [r.read_signed(bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("malformed FLAC: invalid LPC precision")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("malformed FLAC: negative LPC shift")
        coeffs = [r.read_signed(precision) for _ in range(order)]
        resid = _read_residual(r, block_size, order)
        for i, e in enumerate(resid):
            pred = sum(
                c * samples[order + i - j - 1] for j, c in enumerate(coeffs)
            ) >> shift
            samples.append(e + pred)
    else:
        raise ValueError(f"malformed FLAC: reserved subframe type {ftype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def flac_decode(raw: bytes) -> tuple[np.ndarray, int]:
    """Decode all frames → (int32 array shaped (n_samples, channels),
    sample_rate). CRCs are verified."""
    rate0, nch0, bps0, _total = flac_meta(raw)
    i = _skip_metadata(raw)
    channels_out: list[list[int]] = [[] for _ in range(nch0)]
    while i < len(raw):
        if i + 2 > len(raw):
            break
        sync = (raw[i] << 6) | (raw[i + 1] >> 2)
        if sync != 0x3FFE:
            raise ValueError("malformed FLAC: lost frame sync")
        r = _BitReader(raw, i)
        r.read(14)
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)  # reserved
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("malformed FLAC: reserved block size code")
        elif bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        else:
            block_size = _BLOCK_SIZES[bs_code]
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code == 15:
            raise ValueError("malformed FLAC: invalid sample rate code")
        bps = bps0 if ss_code == 0 else _SAMPLE_SIZES.get(ss_code)
        if bps is None:
            raise ValueError("malformed FLAC: reserved sample size code")
        r.align()
        header_end = r.byte
        if _crc8(raw[i:header_end]) != raw[header_end]:
            raise ValueError("malformed FLAC: frame header CRC-8 mismatch")
        r.byte = header_end + 1

        if ch_code < 8:
            nch = ch_code + 1
            subs = [
                _read_subframe(r, block_size, bps) for _ in range(nch)
            ]
        elif ch_code in (8, 9, 10):
            nch = 2
            bumps = {8: (0, 1), 9: (1, 0), 10: (0, 1)}[ch_code]
            a = _read_subframe(r, block_size, bps + bumps[0])
            b = _read_subframe(r, block_size, bps + bumps[1])
            if ch_code == 8:  # left/side
                subs = [a, [left - s for left, s in zip(a, b)]]
            elif ch_code == 9:  # side/right
                subs = [[right + s for s, right in zip(a, b)], b]
            else:  # mid/side
                left = [
                    (((m << 1) | (s & 1)) + s) >> 1 for m, s in zip(a, b)
                ]
                subs = [left, [lv - s for lv, s in zip(left, b)]]
        else:
            raise ValueError("malformed FLAC: reserved channel assignment")
        if nch != nch0:
            raise ValueError("malformed FLAC: channel count changed mid-stream")
        r.align()
        if _crc16(raw[i : r.byte]) != int.from_bytes(
            raw[r.byte : r.byte + 2], "big"
        ):
            raise ValueError("malformed FLAC: frame CRC-16 mismatch")
        i = r.byte + 2
        for c in range(nch):
            channels_out[c].extend(subs[c])
    if not channels_out[0]:
        raise ValueError("malformed FLAC: no audio frames")
    return (
        np.array(channels_out, dtype=np.int64).T.astype(np.int32),
        rate0,
    )


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        return bytes(self.out)


def _encode_subframe(w: _BitWriter, samples, bps: int):
    """FIXED order 0-2 with a single Rice partition, or VERBATIM when
    Rice would expand (pathological residuals). `samples` is any int
    sequence; the order search runs vectorized (identical residuals,
    parameter and cost arithmetic as the scalar spelling)."""
    arr = np.asarray(samples, dtype=np.int64)
    n_s = arr.shape[0]
    best_order, best_resid, best_cost = None, None, None
    for order in (0, 1, 2):
        if n_s <= order:
            continue
        if order == 0:
            resid = arr
        elif order == 1:
            resid = arr[1:] - arr[:-1]
        else:
            resid = arr[2:] - 2 * arr[1:-1] + arr[:-2]
        aresid = np.abs(resid)
        mean = int(aresid.sum()) / max(1, resid.shape[0])
        k = 0
        while (1 << (k + 1)) < mean + 1 and k < 14:
            k += 1
        cost = int(((aresid << 1) >> k).sum()) + (1 + k) * resid.shape[0]
        if best_cost is None or cost < best_cost:
            best_order, best_resid, best_cost = order, (resid, k), cost
    verbatim_cost = n_s * bps
    if best_cost is None or best_cost > verbatim_cost:
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)
        for s in arr.tolist():
            w.write(s, bps)
        return
    resid, k = best_resid
    w.write(0, 1)
    w.write(8 + best_order, 6)  # FIXED
    w.write(0, 1)  # no wasted bits
    for s in arr[:best_order].tolist():
        w.write(s, bps)
    w.write(0, 2)  # 4-bit Rice parameters
    w.write(0, 4)  # partition order 0
    w.write(k, 4)
    # zigzag once, vectorized; q zero bits + the terminating 1 are a
    # single (q+1)-bit write of the value 1 — identical bit output.
    zs = np.where(resid < 0, ((-resid) << 1) - 1, resid << 1).tolist()
    write = w.write
    for z in zs:
        write(1, (z >> k) + 1)
        if k:
            write(z, k)


def flac_encode(
    samples: np.ndarray, sample_rate: int = 44100, bps: int = 16,
    block_size: int = 4096,
) -> bytes:
    """Encode int samples shaped (n, channels) or (n,) as FLAC
    (independent channels, FIXED/VERBATIM subframes)."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, nch = arr.shape
    if n == 0 or nch > 8:
        raise ValueError("flac_encode: need 1..8 channels, >=1 sample")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if arr.min() < lo or arr.max() > hi:
        raise ValueError(f"flac_encode: samples exceed {bps}-bit range")

    out = bytearray(MAGIC)
    info = bytearray()
    info += struct.pack(">HH", block_size, block_size)
    info += (0).to_bytes(3, "big") * 2  # min/max frame size unknown
    bits = (sample_rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | n
    info += bits.to_bytes(8, "big")
    info += b"\x00" * 16  # MD5 unset
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + info

    for fi, start in enumerate(range(0, n, block_size)):
        blk = arr[start : start + block_size]
        bs = blk.shape[0]
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        w.write(7, 4)  # 16-bit block size follows
        w.write(0, 4)  # rate from STREAMINFO
        w.write(nch - 1, 4)
        w.write(0, 3)  # bps from STREAMINFO
        w.write(0, 1)
        _write_utf8_number(w, fi)  # general n-byte frame number
        w.write(bs - 1, 16)
        w.align()
        hdr = w.bytes()
        w.write(_crc8(hdr), 8)
        for c in range(nch):
            _encode_subframe(w, blk[:, c], bps)
        w.align()
        frame = w.bytes()
        out += frame + _crc16(frame).to_bytes(2, "big")
    return bytes(out)
