"""Pure-stdlib WAV / AIFF decoders + MP3 stream metadata for the
multimodal real mode.

The stdlib `wave` module only reads WAVE_FORMAT_PCM; scraped audio
corpora carry more. This module parses the RIFF/WAVE container
directly and decodes every codec expressible in stdlib+numpy:

- PCM 8 (unsigned, centered) / 16 / 24 / 32-bit little-endian
- IEEE float 32/64 (format tag 3), quantized to 16-bit scale
- G.711 mu-law (tag 7) and A-law (tag 6) per the CCITT tables
- IMA/DVI ADPCM (tag 0x11), block-based, mono + stereo
- MS ADPCM (tag 0x02), built-in + fmt-supplied coefficient pairs
- WAVE_FORMAT_EXTENSIBLE (0xFFFE) unwrapped via its SubFormat GUID

AIFF and AIFF-C (FORM/COMM/SSND, 80-bit extended sample rate) with
compression types NONE / sowt / ulaw-ULAW / alaw-ALAW / fl32 / fl64.

MP3 gets a real *metadata* walk (`mp3_meta`): ID3v2 skip, frame-
header parse (all MPEG versions/layers, bitrate + samplerate
tables), Xing/Info VBR frame count, duration and average bitrate —
the fields an audio-curation pipeline filters on — without decoding
audio. Full MDCT decode stays behind the columns.py stub naming
the library (mpg123/pyav): the engine contract (schema, batching)
is identical either way.

Decode contract: `(pcm, rate, bits)` where pcm is int64 `(frames,
channels)`. Compressed codecs (G.711, ADPCM, float) decode to
16-bit scale; PCM keeps its native width and reports it in `bits`
so callers can normalize (columns.py shifts >16-bit down before
squaring to keep int64 energy exact).

Reference parity: the engine moves opaque serializations only
(message/interfaces.go:121-124); codec work happens in executor-side
Arrow kernels (columns.py), never in the engine.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- G.711

_ULAW_BIAS = 0x84


def _build_ulaw_table() -> np.ndarray:
    out = np.zeros(256, dtype=np.int64)
    for code in range(256):
        u = ~code & 0xFF
        exp = (u >> 4) & 7
        mant = u & 0x0F
        mag = (((mant << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
        out[code] = -mag if u & 0x80 else mag
    return out


def _build_alaw_table() -> np.ndarray:
    out = np.zeros(256, dtype=np.int64)
    for code in range(256):
        a = code ^ 0x55
        exp = (a >> 4) & 7
        mant = a & 0x0F
        if exp == 0:
            mag = (mant << 4) + 8
        else:
            mag = ((mant << 4) + 0x108) << (exp - 1)
        out[code] = mag if a & 0x80 else -mag
    return out


ULAW_TABLE = _build_ulaw_table()
ALAW_TABLE = _build_alaw_table()


def ulaw_decode(data: bytes) -> np.ndarray:
    """G.711 mu-law bytes -> int16-scale samples (max 32124)."""
    return ULAW_TABLE[np.frombuffer(data, dtype=np.uint8)]


def alaw_decode(data: bytes) -> np.ndarray:
    """G.711 A-law bytes -> int16-scale samples (max 32256)."""
    return ALAW_TABLE[np.frombuffer(data, dtype=np.uint8)]


_ULAW_SEG_END = [0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF]
_ALAW_SEG_END = [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF]


def _ulaw_encode_one(s: int) -> int:
    """Exact Sun g711.c segment search in the 14-bit domain
    (bit-identical to the CCITT reference encoder)."""
    v = s >> 2  # 16- to 14-bit domain
    if v < 0:
        v = -v
        mask = 0x7F
    else:
        mask = 0xFF
    v = min(v, 8159) + (_ULAW_BIAS >> 2)
    for i, end in enumerate(_ULAW_SEG_END):
        if v <= end:
            return ((i << 4) | ((v >> (i + 1)) & 0xF)) ^ mask
    return 0x7F ^ mask


def _alaw_encode_one(s: int) -> int:
    """Exact Sun g711.c segment search in the 13-bit domain."""
    v = s >> 3  # 16- to 13-bit domain
    if v >= 0:
        mask = 0xD5  # sign bit set (positive) + even-bit toggle
    else:
        mask = 0x55
        v = -v - 1
    for i, end in enumerate(_ALAW_SEG_END):
        if v <= end:
            aval = i << 4
            aval |= (v >> 1) & 0xF if i < 2 else (v >> i) & 0xF
            return aval ^ mask
    return 0x7F ^ mask


_ENC_LUTS: dict[str, np.ndarray] = {}


def _enc_lut(codec: str) -> np.ndarray:
    """Lazily built 65536-entry encode LUT (indexed by s + 32768) so
    bulk encodes are one numpy gather instead of a Python loop; the
    scalar reference above stays the definition the LUT is built
    from (and the tests compare against audioop either way)."""
    lut = _ENC_LUTS.get(codec)
    if lut is None:
        one = _ulaw_encode_one if codec == "ulaw" else _alaw_encode_one
        lut = np.array(
            [one(s) for s in range(-32768, 32768)], dtype=np.uint8
        )
        _ENC_LUTS[codec] = lut
    return lut


def ulaw_encode(samples: np.ndarray) -> bytes:
    """int16 samples -> mu-law bytes (bit-identical to the CCITT
    reference encoder; LUT-vectorized)."""
    idx = np.asarray(samples, dtype=np.int64) + 32768
    return _enc_lut("ulaw")[idx].tobytes()


def alaw_encode(samples: np.ndarray) -> bytes:
    """int16 samples -> A-law bytes (bit-identical to the CCITT
    reference encoder; LUT-vectorized)."""
    idx = np.asarray(samples, dtype=np.int64) + 32768
    return _enc_lut("alaw")[idx].tobytes()


# ------------------------------------------------------------ IMA ADPCM

IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
], dtype=np.int64)

IMA_INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8],
    dtype=np.int64,
)


def _ima_step(pred: int, index: int, code: int) -> tuple[int, int]:
    step = int(IMA_STEP_TABLE[index])
    diff = step >> 3
    if code & 1:
        diff += step >> 2
    if code & 2:
        diff += step >> 1
    if code & 4:
        diff += step
    pred = pred - diff if code & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + int(IMA_INDEX_TABLE[code])))
    return pred, index


def ima_adpcm_decode_block(
    block: bytes, nch: int
) -> np.ndarray:
    """One IMA ADPCM block -> int16 samples (frames, nch).

    Block layout (RIFF spec): per channel a 4-byte header
    (predictor int16 LE, step index u8, reserved), then 4-byte
    words of 8 nibbles (low first), channels alternating per word.
    """
    preds, idxs, chans = [], [], []
    off = 0
    for c in range(nch):
        pred, idx = struct.unpack_from("<hB", block, off)
        off += 4
        preds.append(pred)
        idxs.append(max(0, min(88, idx)))
        chans.append([pred])
    data = block[off:]
    # words alternate channels: ch0 ch1 ch0 ch1 ...
    for w in range(len(data) // 4):
        c = w % nch
        word = data[w * 4 : w * 4 + 4]
        for byte in word:
            for code in (byte & 0x0F, byte >> 4):
                preds[c], idxs[c] = _ima_step(preds[c], idxs[c], code)
                chans[c].append(preds[c])
    n = min(len(ch) for ch in chans)
    return np.stack(
        [np.asarray(ch[:n], dtype=np.int64) for ch in chans], axis=1
    )


def ima_adpcm_encode(
    pcm: np.ndarray, nch: int, samples_per_block: int = 505
) -> tuple[bytes, int]:
    """int16 (frames, nch) -> IMA ADPCM blocks; returns
    (data, block_align). `samples_per_block` must be 1 + multiple
    of 8 so nibbles fill whole 4-byte words."""
    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block must be 1 + k*8")
    words_per_ch = (samples_per_block - 1) // 8
    block_align = 4 * nch + 4 * nch * words_per_ch
    out = bytearray()
    idxs = [0] * nch
    nf = pcm.shape[0]
    for b0 in range(0, nf, samples_per_block):
        blk = pcm[b0 : b0 + samples_per_block]
        preds = [int(blk[0, c]) for c in range(nch)]
        codes: list[list[int]] = [[] for _ in range(nch)]
        for c in range(nch):
            # seed the step index from the block's mean slope so the
            # quantizer starts adapted (the index travels in the block
            # header, so any seed is spec-legal for decoders)
            if blk.shape[0] > 1:
                slope = int(np.abs(np.diff(blk[:, c])).mean())
                idxs[c] = int(
                    np.argmin(np.abs(IMA_STEP_TABLE - max(slope, 1)))
                )
            out += struct.pack("<hBB", preds[c], idxs[c], 0)
        for i in range(1, samples_per_block):
            for c in range(nch):
                target = int(blk[i, c]) if i < blk.shape[0] else preds[c]
                step = int(IMA_STEP_TABLE[idxs[c]])
                diff = target - preds[c]
                code = 0
                if diff < 0:
                    code = 8
                    diff = -diff
                if diff >= step:
                    code |= 4
                    diff -= step
                if diff >= step >> 1:
                    code |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    code |= 1
                preds[c], idxs[c] = _ima_step(preds[c], idxs[c], code)
                codes[c].append(code)
        for w in range(words_per_ch * nch):
            c = w % nch
            base = (w // nch) * 8
            word = 0
            for k in range(8):
                word |= codes[c][base + k] << (4 * k)
            out += struct.pack("<I", word)
    return bytes(out), block_align


# ------------------------------------------------------------- MS ADPCM

MS_ADAPT = np.array([
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
], dtype=np.int64)

MS_COEFFS = [
    (256, 0), (512, -256), (0, 0), (192, 64),
    (240, 0), (460, -208), (392, -232),
]


def ms_adpcm_decode_block(
    block: bytes, nch: int, coeffs: list[tuple[int, int]]
) -> np.ndarray:
    """One MS ADPCM block -> int16 samples (frames, nch).

    Header per spec: predictor index u8 per channel, idelta int16
    per channel, sample1 int16 per channel, sample2 int16 per
    channel; then 4-bit codes high-nibble-first, channels
    interleaved per nibble. sample2 precedes sample1 in output.
    """
    off = 0
    pidx = [block[off + c] for c in range(nch)]
    off += nch
    idelta = list(struct.unpack_from("<%dh" % nch, block, off))
    off += 2 * nch
    s1 = list(struct.unpack_from("<%dh" % nch, block, off))
    off += 2 * nch
    s2 = list(struct.unpack_from("<%dh" % nch, block, off))
    off += 2 * nch
    c1 = [coeffs[min(p, len(coeffs) - 1)][0] for p in pidx]
    c2 = [coeffs[min(p, len(coeffs) - 1)][1] for p in pidx]
    chans = [[s2[c], s1[c]] for c in range(nch)]
    nib = []
    for byte in block[off:]:
        nib.append(byte >> 4)
        nib.append(byte & 0x0F)
    for i, code in enumerate(nib):
        c = i % nch
        signed = code - 16 if code & 8 else code
        pred = (s1[c] * c1[c] + s2[c] * c2[c]) >> 8
        samp = max(-32768, min(32767, pred + signed * idelta[c]))
        s2[c], s1[c] = s1[c], samp
        idelta[c] = max(16, (int(MS_ADAPT[code]) * idelta[c]) >> 8)
        chans[c].append(samp)
    n = min(len(ch) for ch in chans)
    return np.stack(
        [np.asarray(ch[:n], dtype=np.int64) for ch in chans], axis=1
    )


def ms_adpcm_encode(
    pcm: np.ndarray, nch: int, samples_per_block: int = 500
) -> tuple[bytes, int]:
    """int16 (frames, nch) -> MS ADPCM blocks using coefficient
    pair 0 (pure first-order) and a greedy quantizer; returns
    (data, block_align). Lossy round-trip for tests/writer use."""
    if samples_per_block < 2:
        raise ValueError("MS ADPCM needs samples_per_block >= 2 "
                         "(two history samples live in the header)")
    codes_per_block = samples_per_block - 2
    block_align = 7 * nch + (codes_per_block * nch + 1) // 2
    out = bytearray()
    nf = pcm.shape[0]
    for b0 in range(0, nf, samples_per_block):
        blk = pcm[b0 : b0 + samples_per_block]
        s2 = [int(blk[0, c]) for c in range(nch)]
        s1 = [
            int(blk[1, c]) if blk.shape[0] > 1 else s2[c]
            for c in range(nch)
        ]
        idelta = [
            max(16, abs(s1[c] - s2[c]) // 4 or 16) for c in range(nch)
        ]
        out += bytes([0] * nch)  # predictor 0: (256, 0)
        out += struct.pack("<%dh" % nch, *idelta)
        out += struct.pack("<%dh" % nch, *s1)
        out += struct.pack("<%dh" % nch, *s2)
        nibbles = []
        for i in range(2, samples_per_block):
            for c in range(nch):
                target = int(blk[i, c]) if i < blk.shape[0] else s1[c]
                pred = (s1[c] * 256 + s2[c] * 0) >> 8
                q = max(
                    -8, min(7, int(round((target - pred) / idelta[c])))
                )
                code = q & 0x0F
                samp = max(-32768, min(32767, pred + q * idelta[c]))
                s2[c], s1[c] = s1[c], samp
                idelta[c] = max(
                    16, (int(MS_ADAPT[code]) * idelta[c]) >> 8
                )
                nibbles.append(code)
        if len(nibbles) % 2:
            nibbles.append(0)
        for i in range(0, len(nibbles), 2):
            out.append((nibbles[i] << 4) | nibbles[i + 1])
    return bytes(out), block_align


# ----------------------------------------------------------- RIFF/WAVE

WAVE_PCM = 0x0001
WAVE_MS_ADPCM = 0x0002
WAVE_FLOAT = 0x0003
WAVE_ALAW = 0x0006
WAVE_ULAW = 0x0007
WAVE_IMA_ADPCM = 0x0011
WAVE_EXTENSIBLE = 0xFFFE

_FMT_NAMES = {
    WAVE_PCM: "pcm", WAVE_MS_ADPCM: "ms-adpcm", WAVE_FLOAT: "float",
    WAVE_ALAW: "alaw", WAVE_ULAW: "ulaw", WAVE_IMA_ADPCM: "ima-adpcm",
}


def _riff_chunks(raw: bytes):
    """Yield (fourcc, payload) for each RIFF sub-chunk, honoring the
    word-alignment pad byte after odd-sized chunks."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    end = min(len(raw), 8 + struct.unpack_from("<I", raw, 4)[0])
    off = 12
    while off + 8 <= end:
        cc = raw[off : off + 4]
        size = struct.unpack_from("<I", raw, off + 4)[0]
        body = raw[off + 8 : off + 8 + size]
        yield cc, body
        off += 8 + size + (size & 1)


def _parse_fmt(body: bytes) -> dict:
    (tag, nch, rate, _brate, balign, bits) = struct.unpack_from(
        "<HHIIHH", body, 0
    )
    info = {
        "tag": tag, "nch": nch, "rate": rate, "block_align": balign,
        "bits": bits, "samples_per_block": 0,
        "coeffs": list(MS_COEFFS),
    }
    ext = body[18:]
    if tag == WAVE_EXTENSIBLE and len(ext) >= 2 + 22:
        # cbSize, valid bits, channel mask, SubFormat GUID (first
        # two bytes are the real format tag, KSDATAFORMAT_SUBTYPE_*)
        info["tag"] = struct.unpack_from("<H", body, 24)[0]
    elif tag == WAVE_IMA_ADPCM and len(ext) >= 4:
        # cbSize at 16, wSamplesPerBlock at 18
        info["samples_per_block"] = struct.unpack_from("<H", body, 18)[0]
    elif tag == WAVE_MS_ADPCM and len(ext) >= 6:
        # cbSize at 16, wSamplesPerBlock 18, wNumCoef 20, pairs at 22
        spb, ncoef = struct.unpack_from("<HH", body, 18)
        info["samples_per_block"] = spb
        pairs = []
        for i in range(ncoef):
            pairs.append(struct.unpack_from("<hh", body, 22 + 4 * i))
        if pairs:
            info["coeffs"] = pairs
    return info


def wav_meta(raw: bytes) -> tuple[int, int, int, int, str]:
    """-> (rate, channels, bits, total_frames, codec_name)."""
    fmt = None
    data_len = 0
    fact_frames = None
    for cc, body in _riff_chunks(raw):
        if cc == b"fmt ":
            fmt = _parse_fmt(body)
        elif cc == b"data":
            data_len = len(body)
        elif cc == b"fact" and len(body) >= 4:
            fact_frames = struct.unpack_from("<I", body, 0)[0]
    if fmt is None:
        raise ValueError("RIFF/WAVE payload without a fmt chunk")
    tag, nch, bits = fmt["tag"], fmt["nch"], fmt["bits"]
    if tag == WAVE_FLOAT and bits not in (32, 64):
        raise ValueError(
            f"malformed WAV: IEEE-float format with {bits} bits "
            "per sample (32 or 64 required)"
        )
    if tag in (WAVE_PCM, WAVE_FLOAT):
        frames = data_len // max(1, nch * (bits // 8))
    elif tag in (WAVE_ALAW, WAVE_ULAW):
        frames = data_len // max(1, nch)
    elif tag == WAVE_IMA_ADPCM:
        ba = fmt["block_align"]
        spb = fmt["samples_per_block"] or ((ba - 4 * nch) * 2 // nch + 1)
        frames = (data_len // max(1, ba)) * spb
        tail = data_len % max(1, ba)
        if tail > 4 * nch:
            # word-granular to match the decoder: data decodes in
            # whole 4-byte words, nch words per 8-frame group, and
            # a leftover sub-group is truncated by the per-channel
            # min-length stack
            tail_words = (tail - 4 * nch) // 4
            frames += 1 + (tail_words // max(1, nch)) * 8
    elif tag == WAVE_MS_ADPCM:
        ba = fmt["block_align"]
        spb = fmt["samples_per_block"] or (
            (ba - 7 * nch) * 2 // nch + 2
        )
        frames = (data_len // max(1, ba)) * spb
        tail = data_len % max(1, ba)
        if tail > 7 * nch:
            frames += (tail - 7 * nch) * 2 // nch + 2
    else:
        name = _FMT_NAMES.get(tag, hex(tag))
        raise NotImplementedError(
            f"STUB: WAV format tag {name} requires libsndfile; "
            "pure-python real mode covers PCM/float/G.711/ADPCM"
        )
    if fact_frames is not None:
        frames = min(frames, fact_frames)
    return fmt["rate"], nch, bits, frames, _FMT_NAMES.get(tag, hex(tag))


def wav_decode(raw: bytes) -> tuple[np.ndarray, int, int]:
    """RIFF/WAVE -> (pcm int64 (frames, nch), rate, bits).

    Compressed codecs (G.711, ADPCM, float) land at 16-bit scale
    and report bits=16; PCM keeps its container width.
    """
    fmt = None
    data = b""
    fact_frames = None
    for cc, body in _riff_chunks(raw):
        if cc == b"fmt ":
            fmt = _parse_fmt(body)
        elif cc == b"data":
            data = body
        elif cc == b"fact" and len(body) >= 4:
            fact_frames = struct.unpack_from("<I", body, 0)[0]
    if fmt is None:
        raise ValueError("RIFF/WAVE payload without a fmt chunk")
    tag, nch, rate, bits = fmt["tag"], fmt["nch"], fmt["rate"], fmt["bits"]
    if tag == WAVE_PCM:
        if bits == 8:
            a = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
        elif bits == 16:
            a = np.frombuffer(data, dtype="<i2").astype(np.int64)
        elif bits == 24:
            b = np.frombuffer(data, dtype=np.uint8)
            b = b[: len(b) - len(b) % 3].reshape(-1, 3).astype(np.int64)
            a = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            a = np.where(a & 0x800000, a - (1 << 24), a)
        elif bits == 32:
            a = np.frombuffer(data, dtype="<i4").astype(np.int64)
        else:
            raise NotImplementedError(
                f"STUB: {bits}-bit PCM WAV needs libsndfile"
            )
        out_bits = bits
    elif tag == WAVE_FLOAT:
        if bits not in (32, 64):
            raise ValueError(
                f"malformed WAV: IEEE-float format with {bits} bits "
                "per sample (32 or 64 required)"
            )
        dt = "<f4" if bits == 32 else "<f8"
        f = np.frombuffer(data, dtype=dt).astype(np.float64)
        a = np.clip(np.rint(f * 32767.0), -32768, 32767).astype(np.int64)
        out_bits = 16
    elif tag == WAVE_ULAW:
        a = ulaw_decode(data)
        out_bits = 16
    elif tag == WAVE_ALAW:
        a = alaw_decode(data)
        out_bits = 16
    elif tag == WAVE_IMA_ADPCM:
        ba = fmt["block_align"]
        blocks = [
            ima_adpcm_decode_block(data[i : i + ba], nch)
            for i in range(0, len(data) - 4 * nch, ba)
        ]
        pcm = (
            np.concatenate(blocks, axis=0)
            if blocks
            else np.zeros((0, nch), dtype=np.int64)
        )
        if fact_frames is not None:
            pcm = pcm[:fact_frames]
        return pcm, rate, 16
    elif tag == WAVE_MS_ADPCM:
        ba = fmt["block_align"]
        blocks = [
            ms_adpcm_decode_block(data[i : i + ba], nch, fmt["coeffs"])
            for i in range(0, len(data) - 7 * nch, ba)
        ]
        pcm = (
            np.concatenate(blocks, axis=0)
            if blocks
            else np.zeros((0, nch), dtype=np.int64)
        )
        if fact_frames is not None:
            pcm = pcm[:fact_frames]
        return pcm, rate, 16
    else:
        name = _FMT_NAMES.get(tag, hex(tag))
        raise NotImplementedError(
            f"STUB: WAV format tag {name} requires libsndfile; "
            "pure-python real mode covers PCM/float/G.711/ADPCM"
        )
    a = a[: (len(a) // nch) * nch].reshape(-1, nch)
    if fact_frames is not None:
        a = a[:fact_frames]
    return a, rate, out_bits


def build_wav(
    fmt_tag: int, rate: int, nch: int, bits: int, data: bytes,
    block_align: int | None = None, extra: bytes = b"",
    fact_frames: int | None = None,
) -> bytes:
    """Assemble a RIFF/WAVE container (tests + writer policy)."""
    if block_align is None:
        block_align = nch * (bits // 8)
    byte_rate = rate * block_align
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, nch, rate, byte_rate, block_align, bits
    )
    if extra or fmt_tag not in (WAVE_PCM,):
        fmt += struct.pack("<H", len(extra)) + extra
    chunks = [(b"fmt ", fmt)]
    if fact_frames is not None:
        chunks.append((b"fact", struct.pack("<I", fact_frames)))
    chunks.append((b"data", data))
    body = b"WAVE"
    for cc, payload in chunks:
        body += cc + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------- AIFF


def _read_extended(b: bytes) -> float:
    """IEEE 754 80-bit extended float (AIFF COMM sample rate).
    Inf/NaN encodings (exp 0x7FFF) and exponents past the float64
    range raise a NAMED error — a sample rate is a small positive
    number, anything else is a malformed COMM chunk."""
    (se,) = struct.unpack_from(">H", b, 0)
    (mant,) = struct.unpack_from(">Q", b, 2)
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    # float64's range ends near 2^1024; rates are < 2^32
    if exp >= 0x7FFF or exp - 16383 - 63 > 960:
        raise ValueError(
            "malformed AIFF: COMM sample rate is non-finite or "
            f"out of range (exponent field 0x{exp:04x})"
        )
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _write_extended(x: float) -> bytes:
    """Inverse of `_read_extended` for integer-valued rates."""
    if x == 0:
        return b"\x00" * 10
    sign = 0x8000 if x < 0 else 0
    x = abs(x)
    exp = 16383 + 63
    mant = int(x)
    while mant < (1 << 63):
        mant <<= 1
        exp -= 1
    while mant >= (1 << 64):
        mant >>= 1
        exp += 1
    return struct.pack(">HQ", sign | exp, mant)


def _aiff_chunks(raw: bytes):
    if raw[:4] != b"FORM" or raw[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF/AIFF-C payload")
    end = min(len(raw), 8 + struct.unpack_from(">I", raw, 4)[0])
    off = 12
    while off + 8 <= end:
        cc = raw[off : off + 4]
        size = struct.unpack_from(">I", raw, off + 4)[0]
        yield cc, raw[off + 8 : off + 8 + size]
        off += 8 + size + (size & 1)


def aiff_meta(raw: bytes) -> tuple[int, int, int, int, str]:
    """-> (rate, channels, bits, total_frames, compression)."""
    is_aifc = raw[8:12] == b"AIFC"
    for cc, body in _aiff_chunks(raw):
        if cc == b"COMM":
            nch, nframes, bits = struct.unpack_from(">hIh", body, 0)
            rate = int(round(_read_extended(body[8:18])))
            comp = "NONE"
            if is_aifc and len(body) >= 22:
                comp = body[18:22].decode("latin-1")
            return rate, nch, bits, nframes, comp
    raise ValueError("AIFF payload without a COMM chunk")


def aiff_decode(raw: bytes) -> tuple[np.ndarray, int, int]:
    """AIFF/AIFF-C -> (pcm int64 (frames, nch), rate, bits)."""
    rate, nch, bits, nframes, comp = aiff_meta(raw)
    ssnd = None
    for cc, body in _aiff_chunks(raw):
        if cc == b"SSND":
            offset, _blk = struct.unpack_from(">II", body, 0)
            ssnd = body[8 + offset :]
    if ssnd is None:
        raise ValueError("AIFF payload without an SSND chunk")
    if comp in ("NONE", "twos"):
        if bits == 8:
            a = np.frombuffer(ssnd, dtype=np.int8).astype(np.int64)
        elif bits == 16:
            a = np.frombuffer(ssnd, dtype=">i2").astype(np.int64)
        elif bits == 24:
            b = np.frombuffer(ssnd, dtype=np.uint8)
            b = b[: len(b) - len(b) % 3].reshape(-1, 3).astype(np.int64)
            a = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]
            a = np.where(a & 0x800000, a - (1 << 24), a)
        elif bits == 32:
            a = np.frombuffer(ssnd, dtype=">i4").astype(np.int64)
        else:
            raise NotImplementedError(
                f"STUB: {bits}-bit AIFF needs libsndfile"
            )
        out_bits = bits
    elif comp == "sowt":  # little-endian 16-bit PCM (Mac convention)
        a = np.frombuffer(ssnd, dtype="<i2").astype(np.int64)
        out_bits = 16
    elif comp in ("ulaw", "ULAW"):
        a = ulaw_decode(ssnd)
        out_bits = 16
    elif comp in ("alaw", "ALAW"):
        a = alaw_decode(ssnd)
        out_bits = 16
    elif comp in ("fl32", "FL32", "fl64", "FL64"):
        dt = ">f4" if comp.lower() == "fl32" else ">f8"
        f = np.frombuffer(ssnd, dtype=dt).astype(np.float64)
        a = np.clip(np.rint(f * 32767.0), -32768, 32767).astype(np.int64)
        out_bits = 16
    else:
        raise NotImplementedError(
            f"STUB: AIFF-C compression {comp!r} requires libsndfile; "
            "pure-python real mode covers NONE/sowt/ulaw/alaw/fl32/fl64"
        )
    a = a[: (len(a) // nch) * nch].reshape(-1, nch)
    return a[:nframes] if nframes else a, rate, out_bits


def build_aiff(
    rate: int, nch: int, bits: int, nframes: int, data: bytes,
    comp: bytes | None = None,
) -> bytes:
    """Assemble an AIFF (comp=None) or AIFF-C container (tests)."""
    comm = struct.pack(">hIh", nch, nframes, bits) + _write_extended(
        float(rate)
    )
    form_type = b"AIFF"
    chunks = []
    if comp is not None:
        form_type = b"AIFC"
        chunks.append((b"FVER", struct.pack(">I", 0xA2805140)))
        comm += comp + b"\x00\x00"  # empty pstring (padded)
    chunks.append((b"COMM", comm))
    chunks.append((b"SSND", struct.pack(">II", 0, 0) + data))
    body = form_type
    for cc, payload in chunks:
        body += cc + struct.pack(">I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"
    return b"FORM" + struct.pack(">I", len(body)) + body


# ----------------------------------------------------------------- MP3

_MP3_BITRATES = {
    # (version_group, layer) -> kbps by index 1..14; version_group:
    # 1 = MPEG1, 2 = MPEG2/2.5
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
             384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160],
}

_MP3_RATES = {
    3: [44100, 48000, 32000],   # MPEG1 (version bits 11)
    2: [22050, 24000, 16000],   # MPEG2 (10)
    0: [11025, 12000, 8000],    # MPEG2.5 (00)
}


def _mp3_frame(raw: bytes, off: int):
    """Parse one frame header at `off`; -> (size, rate, kbps,
    channels, spf) or None if not a valid header."""
    if off + 4 > len(raw):
        return None
    b0, b1, b2, b3 = raw[off : off + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    vbits = (b1 >> 3) & 3
    if vbits == 1:
        return None
    layer = 4 - ((b1 >> 1) & 3)  # bits 11->I ... 01->III
    if layer == 4:
        return None
    vgroup = 1 if vbits == 3 else 2
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format / invalid
    kbps = _MP3_BITRATES[(vgroup, layer)][br_idx]
    rate = _MP3_RATES[vbits][sr_idx]
    padding = (b2 >> 1) & 1
    channels = 1 if ((b3 >> 6) & 3) == 3 else 2
    if layer == 1:
        size = (12 * kbps * 1000 // rate + padding) * 4
        spf = 384
    else:
        spf = 1152 if (layer == 2 or vgroup == 1) else 576
        size = spf // 8 * kbps * 1000 // rate + padding
    return size, rate, kbps, channels, spf


def mp3_meta(raw: bytes) -> dict:
    """Walk an MP3 stream's frame headers -> metadata dict:
    {rate, channels, n_frames, duration_ms, bitrate_kbps, vbr,
    layer, version}. Honors ID3v2 (syncsafe size, footer flag),
    ID3v1 trailer, and the Xing/Info VBR header's frame count.
    No audio is decoded — this is the filter-field scan an audio
    curation pipeline runs (duration/bitrate/channel filters).
    """
    off = 0
    if raw[:3] == b"ID3" and len(raw) >= 10:
        size = 0
        for b in raw[6:10]:
            size = (size << 7) | (b & 0x7F)
        off = 10 + size + (10 if raw[5] & 0x10 else 0)
    end = len(raw)
    if raw[-128:-125] == b"TAG":
        end -= 128
    # resync: scan forward to the first parseable header
    first = None
    while off < end:
        hdr = _mp3_frame(raw, off)
        if hdr is not None:
            first = hdr
            break
        off += 1
    if first is None:
        raise ValueError("no MP3 frame sync found")
    size, rate, kbps0, channels, spf = first
    vbits = (raw[off + 1] >> 3) & 3
    vgroup = 1 if vbits == 3 else 2
    layer = 4 - ((raw[off + 1] >> 1) & 3)
    # Xing/Info header (first frame, after side info)
    xing_off = off + 4 + (
        (17 if channels == 1 else 32)
        if vgroup == 1
        else (9 if channels == 1 else 17)
    )
    xing_frames = None
    tagcc = raw[xing_off : xing_off + 4]
    if tagcc in (b"Xing", b"Info"):
        flags = struct.unpack_from(">I", raw, xing_off + 4)[0]
        if flags & 1:
            xing_frames = struct.unpack_from(">I", raw, xing_off + 8)[0]
    n_frames = 0
    kbps_sum = 0
    rates = set()
    p = off
    while p + 4 <= end:
        hdr = _mp3_frame(raw, p)
        if hdr is None:
            break
        fsize, frate, fkbps, _ch, _spf = hdr
        n_frames += 1
        kbps_sum += fkbps
        rates.add(fkbps)
        p += max(4, fsize)
    if xing_frames is not None:
        counted = n_frames
        n_frames = xing_frames
        kbps_avg = kbps_sum // max(1, counted)
    else:
        kbps_avg = kbps_sum // max(1, n_frames)
    return {
        "rate": rate,
        "channels": channels,
        "n_frames": n_frames,
        "duration_ms": n_frames * spf * 1000 // rate,
        "bitrate_kbps": kbps_avg,
        "vbr": len(rates) > 1 or tagcc == b"Xing",
        "layer": layer,
        "version": {3: "1", 2: "2", 0: "2.5"}[vbits],
        "samples_per_frame": spf,
    }


def mp3_segments(raw: bytes, every_ms: int = 1000) -> list[dict]:
    """Segment fetch plan: walk the frame headers and group frames
    into `every_ms` windows of audio time — one dict per non-empty
    window: {seg_idx, t_ms (window start), off (absolute byte offset
    of its first frame), n_bytes, n_frames}. The audio twin of
    mp4_keyframes' ranged-GET planning: serving "the 10 s clip at
    t=42 s" out of object storage needs exactly this byte range, and
    because every frame header is walked (not extrapolated from the
    first), the plan is correct for VBR streams where frame sizes
    change mid-file. No audio is decoded; ID3v2 is skipped the same
    way mp3_meta does."""
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")
    off = 0
    if raw[:3] == b"ID3" and len(raw) >= 10:
        size = 0
        for b in raw[6:10]:
            size = (size << 7) | (b & 0x7F)
        off = 10 + size + (10 if raw[5] & 0x10 else 0)
    end = len(raw)
    if raw[-128:-125] == b"TAG":
        end -= 128
    while off < end:
        if _mp3_frame(raw, off) is not None:
            break
        off += 1
    else:
        raise ValueError("no MP3 frame sync found")

    segs: list[dict] = []
    t_num = 0  # elapsed samples*1000 (exact; avoids per-frame floor drift)
    rate0 = None
    p = off
    while p + 4 <= end:
        hdr = _mp3_frame(raw, p)
        if hdr is None:
            break
        fsize, frate, _kbps, _ch, fspf = hdr
        if rate0 is None:
            rate0 = frate
        t_ms = t_num * 1000 // rate0  # elapsed samples -> ms
        seg = t_ms // every_ms
        if not segs or segs[-1]["seg_idx"] != seg:
            segs.append(
                {
                    "seg_idx": seg,
                    "t_ms": seg * every_ms,
                    "off": p,
                    "n_bytes": 0,
                    "n_frames": 0,
                }
            )
        segs[-1]["n_bytes"] += fsize
        segs[-1]["n_frames"] += 1
        t_num += fspf
        p += max(4, fsize)
    return segs


def build_mp3_frame(
    kbps: int = 128, rate: int = 44100, channels: int = 2,
    fill: int = 0,
) -> bytes:
    """One syntactically valid MPEG1 Layer III frame (tests)."""
    br_idx = _MP3_BITRATES[(1, 3)].index(kbps)
    sr_idx = _MP3_RATES[3].index(rate)
    b1 = 0xFB  # MPEG1, Layer III, no CRC
    b2 = (br_idx << 4) | (sr_idx << 2)
    b3 = 0xC0 if channels == 1 else 0x00
    size = 144 * kbps * 1000 // rate
    return bytes([0xFF, b1, b2, b3]) + bytes([fill]) * (size - 4)
