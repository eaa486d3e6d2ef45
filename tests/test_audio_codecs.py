"""Audio codec tests: multimodal/wav.py (RIFF/WAVE beyond stdlib
`wave`, AIFF/AIFF-C, MP3 stream metadata) and its columns.py wiring.

Oracle strategy: G.711 tables and encoders are asserted BIT-EXACT
against CPython's `audioop` (the independent CCITT reference
implementation, present in this 3.11 container); the IMA ADPCM
stepper is asserted bit-exact against `audioop.adpcm2lin`; MS ADPCM
is cross-checked against an independently written scalar reference
decoder; containers are round-tripped (encode -> build -> decode)
with codec-appropriate error bounds.
"""

from __future__ import annotations

import io
import struct
import warnings

import numpy as np
import pytest

from core_spark.multimodal import wav as W

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    import aifc
    import audioop


def _sig(n=2000, amp=12000, rate=8000, hz=440, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    s = amp * np.sin(2 * np.pi * hz * t / rate) + rng.integers(
        -400, 400, n
    )
    return s.astype(np.int64)


def _stereo(n=2000):
    s = _sig(n)
    return np.stack([s, np.roll(s, 3)], axis=1)


# ----------------------------------------------------------- G.711


def test_g711_decode_tables_match_audioop_exactly():
    codes = bytes(range(256))
    ref_u = np.frombuffer(audioop.ulaw2lin(codes, 2), dtype="<i2")
    ref_a = np.frombuffer(audioop.alaw2lin(codes, 2), dtype="<i2")
    assert (W.ULAW_TABLE == ref_u).all()
    assert (W.ALAW_TABLE == ref_a).all()


def test_g711_encoders_match_audioop_for_every_int16():
    samples = np.arange(-32768, 32768, dtype=np.int64)
    pcm = samples.astype("<i2").tobytes()
    assert W.ulaw_encode(samples) == audioop.lin2ulaw(pcm, 2)
    assert W.alaw_encode(samples) == audioop.lin2alaw(pcm, 2)


def test_g711_round_trip_error_within_codec_spec():
    samples = np.arange(-32768, 32768, 7, dtype=np.int64)
    rt_u = W.ulaw_decode(W.ulaw_encode(samples))
    rt_a = W.alaw_decode(W.alaw_encode(samples))
    # largest mu-law/A-law quantization cells
    assert np.abs(rt_u - samples).max() <= 1024
    assert np.abs(rt_a - samples).max() <= 1024


# ------------------------------------------------------------ ADPCM


def test_ima_stepper_bit_exact_vs_audioop():
    sig = _sig(1000)
    enc, _state = audioop.lin2adpcm(sig.astype("<i2").tobytes(), 2, None)
    ref = np.frombuffer(audioop.adpcm2lin(enc, 2, None)[0], "<i2")
    pred, idx = 0, 0
    out = []
    for byte in enc:
        for code in (byte >> 4, byte & 0x0F):  # audioop packs high-first
            pred, idx = W._ima_step(pred, idx, code)
            out.append(pred)
    assert (np.asarray(out) == ref).all()


@pytest.mark.parametrize("nch", [1, 2])
def test_ima_adpcm_wav_round_trip(nch):
    pcm = _stereo()[:, :nch]
    enc, ba = W.ima_adpcm_encode(pcm, nch, samples_per_block=505)
    raw = W.build_wav(
        W.WAVE_IMA_ADPCM, 8000, nch, 4, enc, block_align=ba,
        extra=struct.pack("<H", 505), fact_frames=pcm.shape[0],
    )
    rate, got_nch, _bits, frames, codec = W.wav_meta(raw)
    assert (rate, got_nch, frames, codec) == (
        8000, nch, pcm.shape[0], "ima-adpcm",
    )
    dec, dec_rate, bits = W.wav_decode(raw)
    assert dec.shape == pcm.shape and dec_rate == 8000 and bits == 16
    # 4-bit ADPCM on a seeded encoder: small tracking error throughout
    assert np.abs(dec - pcm).max() < 1500


def _ms_reference_decode(block, nch, coeffs):
    """Independent scalar MS ADPCM reference (spec transcription,
    structured differently from the module's decoder)."""
    pos = 0
    pred_idx = list(block[:nch])
    pos += nch
    unpack = lambda: struct.unpack_from("<h", block, pos)[0]  # noqa: E731
    deltas, h1, h2 = [], [], []
    for _ in range(nch):
        deltas.append(struct.unpack_from("<h", block, pos)[0])
        pos += 2
    for _ in range(nch):
        h1.append(struct.unpack_from("<h", block, pos)[0])
        pos += 2
    for _ in range(nch):
        h2.append(struct.unpack_from("<h", block, pos)[0])
        pos += 2
    outs = [[h2[c], h1[c]] for c in range(nch)]
    i = 0
    for byte in block[pos:]:
        for code in (byte >> 4, byte & 0x0F):
            c = i % nch
            coef1, coef2 = coeffs[pred_idx[c]]
            pred = (outs[c][-1] * coef1 + outs[c][-2] * coef2) >> 8
            s = code - 16 if code >= 8 else code
            val = pred + s * deltas[c]
            val = max(-32768, min(32767, val))
            outs[c].append(val)
            deltas[c] = max(16, (deltas[c] * int(W.MS_ADAPT[code])) >> 8)
            i += 1
    n = min(len(o) for o in outs)
    return np.stack([np.asarray(o[:n]) for o in outs], axis=1)


@pytest.mark.parametrize("nch", [1, 2])
def test_ms_adpcm_block_decode_matches_independent_reference(nch):
    pcm = _stereo(700)[:, :nch]
    enc, ba = W.ms_adpcm_encode(pcm, nch, samples_per_block=500)
    for off in range(0, len(enc), ba):
        blk = enc[off : off + ba]
        mine = W.ms_adpcm_decode_block(blk, nch, W.MS_COEFFS)
        ref = _ms_reference_decode(blk, nch, W.MS_COEFFS)
        assert (mine == ref).all()


def test_ms_adpcm_wav_round_trip_with_fmt_coeffs():
    pcm = _stereo()
    enc, ba = W.ms_adpcm_encode(pcm, 2, samples_per_block=500)
    extra = struct.pack("<HH", 500, len(W.MS_COEFFS)) + b"".join(
        struct.pack("<hh", *c) for c in W.MS_COEFFS
    )
    raw = W.build_wav(
        W.WAVE_MS_ADPCM, 8000, 2, 4, enc, block_align=ba, extra=extra,
        fact_frames=pcm.shape[0],
    )
    assert W.wav_meta(raw)[3] == pcm.shape[0]
    dec, _rate, _bits = W.wav_decode(raw)
    assert dec.shape == pcm.shape
    assert np.abs(dec - pcm).max() < 2500


# ----------------------------------------------------- WAV container


def test_wav_pcm16_matches_stdlib_wave():
    import wave as stdwave

    pcm = _stereo()
    raw = W.build_wav(W.WAVE_PCM, 8000, 2, 16, pcm.astype("<i2").tobytes())
    with stdwave.open(io.BytesIO(raw)) as wf:
        ref = np.frombuffer(
            wf.readframes(wf.getnframes()), "<i2"
        ).reshape(-1, 2)
    dec, rate, bits = W.wav_decode(raw)
    assert (dec == ref).all() and rate == 8000 and bits == 16


def test_wav_pcm24_and_32_sign_extension():
    vals = np.array(
        [[-(1 << 23), (1 << 23) - 1], [-1, 1], [0, -12345678 % (1 << 23)]],
        dtype=np.int64,
    )
    b24 = b"".join(
        struct.pack("<i", int(v))[:3] for v in vals.flatten()
    )
    dec, _r, bits = W.wav_decode(W.build_wav(W.WAVE_PCM, 8000, 2, 24, b24))
    assert bits == 24 and (dec == vals).all()
    v32 = (vals << 8).astype("<i4")
    dec32, _r, bits32 = W.wav_decode(
        W.build_wav(W.WAVE_PCM, 8000, 2, 32, v32.tobytes())
    )
    assert bits32 == 32 and (dec32 == vals << 8).all()


def test_wav_float_and_8bit_and_ulaw_alaw():
    pcm = _stereo()
    f32 = (pcm / 32767.0).astype("<f4")
    dec, _r, bits = W.wav_decode(
        W.build_wav(W.WAVE_FLOAT, 8000, 2, 32, f32.tobytes())
    )
    assert bits == 16 and np.abs(dec - pcm).max() <= 1  # rint only
    f64 = (pcm / 32767.0).astype("<f8")
    dec64, _r, _b = W.wav_decode(
        W.build_wav(W.WAVE_FLOAT, 8000, 2, 64, f64.tobytes())
    )
    assert np.abs(dec64 - pcm).max() <= 1
    u8 = ((pcm[:, 0] >> 8) + 128).astype(np.uint8)
    dec8, _r, _b = W.wav_decode(
        W.build_wav(W.WAVE_PCM, 8000, 1, 8, u8.tobytes())
    )
    assert (dec8[:, 0] == (pcm[:, 0] >> 8)).all()
    for tag, codec in ((W.WAVE_ULAW, "ulaw"), (W.WAVE_ALAW, "alaw")):
        enc = (
            W.ulaw_encode(pcm.flatten())
            if codec == "ulaw"
            else W.alaw_encode(pcm.flatten())
        )
        raw = W.build_wav(tag, 8000, 2, 8, enc, block_align=2)
        assert W.wav_meta(raw)[4] == codec
        decg, _r, _b = W.wav_decode(raw)
        assert np.abs(decg - pcm).max() <= 1024


def test_wav_extensible_unwraps_subformat():
    pcm = _stereo()
    guid_tail = bytes.fromhex("000000001000800000aa00389b71")
    extra = (
        struct.pack("<HI", 16, 3)
        + struct.pack("<H", W.WAVE_PCM)
        + b"\x00\x00"
        + guid_tail
    )
    raw = W.build_wav(
        W.WAVE_EXTENSIBLE, 8000, 2, 16, pcm.astype("<i2").tobytes(),
        block_align=4, extra=extra,
    )
    assert W.wav_meta(raw)[4] == "pcm"
    dec, _r, _b = W.wav_decode(raw)
    assert (dec == pcm).all()


def test_wav_unknown_tag_raises_named_stub():
    raw = W.build_wav(0x0031, 8000, 1, 0, b"\x00" * 65, block_align=65)
    with pytest.raises(NotImplementedError, match="libsndfile"):
        W.wav_meta(raw)
    with pytest.raises(NotImplementedError, match="libsndfile"):
        W.wav_decode(raw)


def test_wav_fact_chunk_truncates_frames():
    pcm = _stereo()
    raw = W.build_wav(
        W.WAVE_PCM, 8000, 2, 16, pcm.astype("<i2").tobytes(),
        fact_frames=1500,
    )
    assert W.wav_meta(raw)[3] == 1500
    assert W.wav_decode(raw)[0].shape[0] == 1500


# ------------------------------------------------------------- AIFF


def test_aiff_pcm_via_stdlib_aifc(tmp_path):
    pcm = _stereo()
    path = tmp_path / "ref.aiff"
    with aifc.open(str(path), "wb") as af:
        af.setnchannels(2)
        af.setsampwidth(2)
        af.setframerate(8000)
        af.writeframes(pcm.astype(">i2").tobytes())
    raw = path.read_bytes()
    rate, nch, bits, frames, comp = W.aiff_meta(raw)
    assert (rate, nch, bits, frames, comp) == (8000, 2, 16, 2000, "NONE")
    dec, dec_rate, _b = W.aiff_decode(raw)
    assert (dec == pcm).all() and dec_rate == 8000


def test_aifc_sowt_ulaw_fl32():
    pcm = _stereo()
    raw = W.build_aiff(
        44100, 2, 16, 2000, pcm.astype("<i2").tobytes(), comp=b"sowt"
    )
    assert W.aiff_meta(raw)[4] == "sowt"
    assert (W.aiff_decode(raw)[0] == pcm).all()
    rawu = W.build_aiff(
        8000, 2, 8, 2000, W.ulaw_encode(pcm.flatten()), comp=b"ulaw"
    )
    assert np.abs(W.aiff_decode(rawu)[0] - pcm).max() <= 1024
    rawf = W.build_aiff(
        8000, 2, 32, 2000, (pcm / 32767.0).astype(">f4").tobytes(),
        comp=b"fl32",
    )
    assert np.abs(W.aiff_decode(rawf)[0] - pcm).max() <= 1
    with pytest.raises(NotImplementedError, match="libsndfile"):
        W.aiff_decode(
            W.build_aiff(8000, 1, 16, 4, b"\x00" * 8, comp=b"ima4")
        )


def test_extended_float_round_trip():
    for rate in (8000, 11025, 22050, 44100, 48000, 96000):
        assert W._read_extended(W._write_extended(float(rate))) == rate


def test_pcm24_big_endian_aiff():
    vals = np.array([[-(1 << 23)], [(1 << 23) - 1], [-1], [7]], np.int64)
    data = b"".join(
        struct.pack(">i", int(v) << 8)[:3] for v in vals.flatten()
    )
    raw = W.build_aiff(8000, 1, 24, 4, data)
    dec, _r, bits = W.aiff_decode(raw)
    assert bits == 24 and (dec == vals).all()


# -------------------------------------------------------------- MP3


def test_mp3_cbr_walk_and_duration():
    frames = b"".join(W.build_mp3_frame(kbps=128) for _ in range(10))
    m = W.mp3_meta(frames)
    assert m["n_frames"] == 10
    assert m["rate"] == 44100 and m["channels"] == 2
    assert m["bitrate_kbps"] == 128 and not m["vbr"]
    assert m["duration_ms"] == 10 * 1152 * 1000 // 44100
    assert m["layer"] == 3 and m["version"] == "1"


def test_mp3_id3v2_and_id3v1_are_skipped():
    frames = b"".join(W.build_mp3_frame(kbps=64) for _ in range(4))
    # syncsafe size 0x0105 = 133 payload bytes, no footer
    id3v2 = b"ID3\x03\x00\x00" + bytes([0, 0, 1, 5]) + b"\xff" * 133
    raw = id3v2 + frames + b"TAG" + b"\x00" * 125
    m = W.mp3_meta(raw)
    assert m["n_frames"] == 4 and m["bitrate_kbps"] == 64


def test_mp3_vbr_average_and_flag():
    seq = (128, 160, 128, 192, 128)
    frames = b"".join(W.build_mp3_frame(kbps=k) for k in seq)
    m = W.mp3_meta(frames)
    assert m["n_frames"] == 5 and m["vbr"]
    assert m["bitrate_kbps"] == sum(seq) // len(seq)


def test_mp3_xing_frame_count_overrides_walk():
    first = bytearray(W.build_mp3_frame(kbps=128))
    # MPEG1 stereo side info = 32 bytes after the 4-byte header
    xing_off = 4 + 32
    first[xing_off : xing_off + 4] = b"Xing"
    first[xing_off + 4 : xing_off + 8] = struct.pack(">I", 1)  # FRAMES
    first[xing_off + 8 : xing_off + 12] = struct.pack(">I", 250)
    raw = bytes(first) + W.build_mp3_frame(kbps=128)
    m = W.mp3_meta(raw)
    assert m["n_frames"] == 250 and m["vbr"]
    assert m["duration_ms"] == 250 * 1152 * 1000 // 44100


def test_mp3_resync_past_leading_garbage():
    raw = b"\x00garbage\xff\x00" + W.build_mp3_frame(
        kbps=96, rate=32000, channels=1
    )
    m = W.mp3_meta(raw)
    assert m["n_frames"] == 1 and m["rate"] == 32000
    assert m["channels"] == 1
    with pytest.raises(ValueError, match="sync"):
        W.mp3_meta(b"\x00" * 64)


def test_mp3_mpeg2_layer3_sizes():
    # MPEG2 Layer III: 576 samples/frame, half frame size
    b1 = 0xF3  # 1111 0 011: MPEG2, Layer III, no CRC
    br_idx = W._MP3_BITRATES[(2, 3)].index(64)
    sr_idx = W._MP3_RATES[2].index(22050)
    hdr = bytes([0xFF, b1, (br_idx << 4) | (sr_idx << 2), 0x00])
    size = 72 * 64 * 1000 // 22050
    frame = hdr + b"\x00" * (size - 4)
    m = W.mp3_meta(frame * 3)
    assert m["n_frames"] == 3 and m["version"] == "2"
    assert m["samples_per_frame"] == 576


# ----------------------------------------------- columns.py wiring


def test_spark_audio_frames_across_containers(spark):
    from core_spark.multimodal.columns import sample_audio_frames

    pcm = _stereo(20000)  # 2.5 s at 8 kHz
    wav_ulaw = W.build_wav(
        W.WAVE_ULAW, 8000, 2, 8, W.ulaw_encode(pcm.flatten()),
        block_align=2,
    )
    aiff = W.build_aiff(8000, 2, 16, 20000, pcm.astype(">i2").tobytes())
    mp3 = b"".join(W.build_mp3_frame(kbps=128) for _ in range(40))
    df = spark.createDataFrame(
        [(1, wav_ulaw), (2, aiff), (3, mp3)],
        "doc_id long, payload binary",
    )
    rows = sample_audio_frames(df, fake=False).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # wav + aiff: 3 slices of 8000 frames (last 4000), 2ch 2B
    for doc in (1, 2):
        got = sorted((r.frame_idx, r.n_bytes) for r in by_doc[doc])
        assert got == [(0, 32000), (1, 32000), (2, 16000)]
    # mp3: 40 frames x 1152 samples @44100 = ~1.04 s -> 2 slices
    got3 = sorted((r.frame_idx, r.n_bytes) for r in by_doc[3])
    total = 40 * 1152
    assert got3 == [(0, 44100 * 4), (1, (total - 44100) * 4)]


def test_spark_audio_features_adpcm_energy_exact(spark):
    from core_spark.multimodal.columns import audio_frame_features

    pcm = _stereo(12000)  # 1.5 s at 8 kHz
    enc, ba = W.ima_adpcm_encode(pcm, 2, samples_per_block=505)
    raw = W.build_wav(
        W.WAVE_IMA_ADPCM, 8000, 2, 4, enc, block_align=ba,
        extra=struct.pack("<H", 505), fact_frames=12000,
    )
    # expected energies from the module decoder (engine-exact contract)
    dec, rate, _bits = W.wav_decode(raw)
    df = spark.createDataFrame([(5, raw)], "doc_id long, payload binary")
    rows = sorted(
        audio_frame_features(df).collect(), key=lambda r: r.frame_idx
    )
    assert [r.n_samples for r in rows] == [8000, 4000]
    for r in rows:
        sl = dec[r.frame_idx * 8000 : (r.frame_idx + 1) * 8000]
        assert r.energy == int((sl * sl).sum())


def test_spark_audio_features_24bit_shifted_to_16(spark):
    from core_spark.multimodal.columns import audio_frame_features

    pcm24 = _stereo(4000) << 8
    data = b"".join(
        struct.pack("<i", int(v))[:3] for v in pcm24.flatten()
    )
    raw = W.build_wav(W.WAVE_PCM, 8000, 2, 24, data)
    df = spark.createDataFrame([(9, raw)], "doc_id long, payload binary")
    rows = audio_frame_features(df).collect()
    expect = pcm24 >> 8
    assert rows[0].energy == int((expect * expect).sum())


# ------------------------------------------------------ property fuzz

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 3).map(lambda c: c),
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=400),
    st.sampled_from([8000, 22050, 44100]),
)
def test_pcm16_container_round_trip_property(nch, vals, rate):
    n = (len(vals) // nch) * nch or nch
    pcm = np.asarray((vals * nch)[:n], dtype=np.int64).reshape(-1, nch)
    raw = W.build_wav(W.WAVE_PCM, rate, nch, 16, pcm.astype("<i2").tobytes())
    dec, got_rate, bits = W.wav_decode(raw)
    assert got_rate == rate and bits == 16 and (dec == pcm).all()
    assert W.wav_meta(raw)[3] == pcm.shape[0]


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=16, max_size=600))
def test_g711_round_trip_monotone_bounded_property(vals):
    samples = np.asarray(vals, dtype=np.int64)
    for enc, dec in (
        (W.ulaw_encode, W.ulaw_decode),
        (W.alaw_encode, W.alaw_decode),
    ):
        rt = dec(enc(samples))
        # error bounded by the largest segment's step, sign preserved
        assert np.abs(rt - samples).max() <= 1024
        assert ((rt >= 0) == (samples >= 0))[np.abs(samples) > 64].all()


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=512))
def test_random_bytes_never_hang_or_misparse(raw):
    """Arbitrary payloads must raise a NAMED error (ValueError /
    NotImplementedError / struct.error) or return a well-formed
    result — never hang, never crash with an opaque internal error."""
    for fn in (W.wav_meta, W.wav_decode, W.aiff_meta, W.aiff_decode,
               W.mp3_meta):
        try:
            fn(raw)
        except (ValueError, NotImplementedError, struct.error):
            pass


@settings(max_examples=30, deadline=None)
@given(
    st.binary(min_size=0, max_size=64),
    st.integers(1, 6),
    st.sampled_from([32, 64, 96, 128]),
)
def test_mp3_walk_with_garbage_prefix_property(prefix, n_frames, kbps):
    frames = b"".join(W.build_mp3_frame(kbps=kbps) for _ in range(n_frames))
    # a prefix that happens to contain a parseable sync could
    # legitimately change the count; only assert on sync-free prefixes
    has_sync = any(
        prefix[i] == 0xFF and i + 1 < len(prefix)
        and prefix[i + 1] & 0xE0 == 0xE0
        for i in range(len(prefix))
    )
    if has_sync:
        return
    m = W.mp3_meta(prefix + frames)
    assert m["n_frames"] == n_frames and m["bitrate_kbps"] == kbps


# ----------------------------------------------- review-pass fixes


def test_float_wav_invalid_bits_raises_named():
    raw = W.build_wav(W.WAVE_FLOAT, 8000, 1, 16, b"\x00" * 64)
    with pytest.raises(ValueError, match="IEEE-float"):
        W.wav_meta(raw)
    with pytest.raises(ValueError, match="IEEE-float"):
        W.wav_decode(raw)


def test_aifc_fl64_uppercase_accepted():
    pcm = _stereo(200)
    raw = W.build_aiff(
        8000, 2, 64, 200, (pcm / 32767.0).astype(">f8").tobytes(),
        comp=b"FL64",
    )
    assert np.abs(W.aiff_decode(raw)[0] - pcm).max() <= 1


def test_extended_float_inf_nan_raises_named():
    # exp = 0x7FFF encodes inf/NaN in 80-bit extended
    bad = struct.pack(">HQ", 0x7FFF, 1 << 63)
    with pytest.raises(ValueError, match="COMM sample rate"):
        W._read_extended(bad)
    raw = W.build_aiff(8000, 1, 16, 4, b"\x00" * 8)
    comm_at = raw.index(b"COMM")
    patched = bytearray(raw)
    patched[comm_at + 8 + 8 : comm_at + 8 + 18] = bad
    with pytest.raises(ValueError, match="COMM sample rate"):
        W.aiff_meta(bytes(patched))


def test_ima_truncated_tail_meta_matches_decode():
    """wav_meta's frame count must equal what wav_decode actually
    produces on a truncated IMA payload (word-granular tails)."""
    pcm = _stereo(1200)[:, :1]
    enc, ba = W.ima_adpcm_encode(pcm, 1, samples_per_block=505)
    for cut in (ba + 4 + 6, ba + 4 + 9, ba + 4, len(enc)):
        raw = W.build_wav(
            W.WAVE_IMA_ADPCM, 8000, 1, 4, enc[:cut], block_align=ba,
            extra=struct.pack("<H", 505),
        )
        assert W.wav_meta(raw)[3] == W.wav_decode(raw)[0].shape[0], cut


def test_ms_adpcm_encode_bad_block_size_raises():
    with pytest.raises(ValueError, match="samples_per_block"):
        W.ms_adpcm_encode(_stereo(10), 2, samples_per_block=1)
