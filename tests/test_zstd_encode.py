"""Minimal from-spec zstd ENCODER (functions/zstd_encode.py) —
pinned against zstd-jni's independent DECODER on Spark's classpath
(plain, raw-dictionary, and trained-structured-dictionary frames)
and round-tripped against the repo's own from-spec decoder."""

import random

import pytest

from core_spark.functions.zstd_decode import (
    ZstdDecodeError,
    zstd_decompress,
)
from core_spark.functions.zstd_encode import ZstdEncodeError, zstd_compress

_WORDS = [b"journal", b"fragment", b"manifest", b"shard", b"offset",
          b"commit", b"watermark", b"sequence", b"dictionary", b"window"]


def _shapes():
    rng = random.Random(5)
    return [
        b"",
        b"a",
        b"hello world " * 500,
        b" ".join(rng.choice(_WORDS) for _ in range(20_000)),
        bytes(rng.randrange(256) for _ in range(50_000)),  # incompressible
        b"abcabcabcabd" * 997,
        bytes(range(256)) * 600,  # multi-block (>64 KiB)
    ]


def test_roundtrip_own_decoder_and_compresses():
    texty = b" ".join(random.Random(1).choice(_WORDS) for _ in range(20_000))
    for raw in _shapes():
        comp = zstd_compress(raw)
        assert zstd_decompress(comp) == raw
    # real compression, not just conformance
    assert len(zstd_compress(texty)) < len(texty) // 4
    assert len(zstd_compress(b"abc" * 10_000)) < 100


def test_checksum_emitted_and_verified():
    comp = zstd_compress(b"checksummed " * 100)
    evil = bytearray(comp)
    evil[-9] ^= 1  # a content byte, leaving the stored checksum alone
    with pytest.raises(ZstdDecodeError):
        zstd_decompress(bytes(evil))


def test_fuzz_roundtrip_random_texts():
    rng = random.Random(77)
    for _ in range(60):
        n = rng.randrange(0, 3000)
        raw = b" ".join(
            rng.choice(_WORDS) for _ in range(n)
        ) + bytes(rng.randrange(256) for _ in range(rng.randrange(0, 50)))
        assert zstd_decompress(zstd_compress(raw)) == raw


def test_dictionary_roundtrip_and_requires_dict():
    rng = random.Random(8)
    d = b" ".join(rng.choice(_WORDS) for _ in range(3000))
    payload = b" ".join(rng.choice(_WORDS) for _ in range(300))
    comp = zstd_compress(payload, dictionary=d)
    assert zstd_decompress(comp, dictionary=d) == payload
    # the frame genuinely leans on the dictionary: without it the
    # prefix matches escape the window
    with pytest.raises(ZstdDecodeError):
        zstd_decompress(comp)
    # and a dictionary-assisted frame beats the dict-less one
    assert len(comp) < len(zstd_compress(payload))


def test_pins_against_zstd_jni_decoder(spark):
    """The independent C decoder (zstd-jni) accepts every frame this
    encoder emits: plain across shapes, raw-content-dictionary, and
    a dictionary TRAINED by the reference ZDICT trainer (structured:
    the frame stamps the dict id, jni resolves it)."""
    jvm = spark._jvm
    rng = random.Random(6)
    for raw in _shapes():
        comp = zstd_compress(raw)
        got = bytes(
            jvm.com.github.luben.zstd.Zstd.decompress(comp, max(1, len(raw)))
        )
        assert got == raw

    d_raw = b" ".join(rng.choice(_WORDS) for _ in range(3000))
    payload = b" ".join(rng.choice(_WORDS) for _ in range(300))
    comp = zstd_compress(payload, dictionary=d_raw)
    dctx = jvm.com.github.luben.zstd.ZstdDecompressCtx()
    dctx.loadDict(d_raw)
    assert bytes(dctx.decompress(comp, len(payload))) == payload

    samples = [
        b" ".join(rng.choice(_WORDS) for _ in range(rng.randrange(30, 120)))
        + b"\n"
        for _ in range(200)
    ]
    tr = jvm.com.github.luben.zstd.ZstdDictTrainer(
        sum(map(len, samples)), 16 * 1024
    )
    for s in samples:
        assert tr.addSample(s)
    db = bytes(tr.trainSamples())
    comp = zstd_compress(payload, dictionary=db)
    dctx2 = jvm.com.github.luben.zstd.ZstdDecompressCtx()
    dctx2.loadDict(db)
    assert bytes(dctx2.decompress(comp, len(payload))) == payload
    # our own decoder agrees on the same structured-dict frame
    assert zstd_decompress(comp, dictionary=db) == payload


def test_encode_fences():
    from core_spark.functions.zstd_encode import _ll_code, _ml_code

    with pytest.raises(ZstdEncodeError):
        _ml_code(2)  # below the 3-byte minimum match
    with pytest.raises(ZstdEncodeError):
        _ll_code(1 << 20)  # beyond the last LL code band
    assert _ml_code(3) == 0 and _ml_code(34) == 31
    assert _ll_code(0) == 0 and _ll_code(15) == 15


def test_dict_only_witness_soundness():
    """dict_only=True + economize=False make dictionary dependence a
    function of the content alone (the q_bits_dict oracle contract):
    decode-without-dictionary fails iff a >=4-char '|'-free word
    exists — including the review-r12 counterexample where a
    frame-history self-match would otherwise preempt the dictionary
    ('abcd q abc z': '|abc' from the short word covers '|abcd''s
    prefix), and the tiny-single-word document where economizing to
    a raw block would otherwise drop the dependence."""
    from core_spark.functions.zstd_decode import ZstdDecodeError

    cases = ["abcd q abc z", "ab c d", "abcd", "", "x",
             "abc abc abc", "abcd abcd", "zz yy xx abcd"]
    for text in cases:
        words = text.split(" ")
        payload = "|".join(reversed(words)).encode()
        d = text.encode()
        comp = zstd_compress(
            payload, dictionary=d, dict_only=True, economize=False
        )
        assert zstd_decompress(comp, dictionary=d) == payload
        try:
            needed = zstd_decompress(comp) != payload
        except ZstdDecodeError:
            needed = True
        assert needed == any(len(w) >= 4 for w in words), text


def test_dict_only_full_stride_over_64k_prefix():
    """ADVICE-r12 regression: with a >64 KiB dictionary the plain
    encoder indexes the prefix at stride 3, which can skip the only
    4-gram of a >=4-char word — silently flipping the q_bits_dict
    witness for some placements. dict_only=True must index at full
    stride so the witness is placement-independent."""
    from core_spark.functions.zstd_decode import ZstdDecodeError

    rng = random.Random(13)
    small = ["abc", "de", "fgh", "ij", "klm", "no", "pqr"]
    n = 20_000  # ~72 KiB of dictionary text, over the 64 KiB knee
    for placement in (0, 1, 7, 1_234, 9_999, n - 1):
        words = [rng.choice(small) for _ in range(n)]
        words[placement] = "word"
        text = " ".join(words)
        d = text.encode()
        assert len(d) > 1 << 16
        payload = "|".join(reversed(words)).encode()
        comp = zstd_compress(
            payload, dictionary=d, dict_only=True, economize=False
        )
        assert zstd_decompress(comp, dictionary=d) == payload
        try:
            needed = zstd_decompress(comp) != payload
        except ZstdDecodeError:
            needed = True
        assert needed, placement  # 'word' exists -> frame MUST need dict


def test_fcs_overflow_named_fence():
    """content >= 4 GiB exceeds the 4-byte Frame_Content_Size this
    encoder always writes: named ZstdEncodeError, not struct.error."""

    class _Huge(bytes):
        def __len__(self):
            return 1 << 32

    with pytest.raises(ZstdEncodeError, match="4-byte FCS"):
        zstd_compress(_Huge())
