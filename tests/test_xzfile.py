"""XZ container walk (functions/xzfile.py), pinned against bytes the
stdlib lzma writer produced — tail-only split planning with every
integrity field verified."""

import lzma
import random

import pytest

from core_spark.functions.xzfile import XzError, xz_streams


def test_walks_concatenated_streams_with_padding_and_checks():
    a = lzma.compress(b"first " * 100)
    b = lzma.compress(b"second chunk " * 77, check=lzma.CHECK_CRC32)
    c = lzma.compress(b"third! " * 55, check=lzma.CHECK_SHA256)
    blob = a + b"\x00" * 8 + b + c  # 8 bytes of stream padding
    ss = xz_streams(blob)
    assert [s["stream_idx"] for s in ss] == [0, 1, 2]
    assert ss[0]["off"] == 0 and ss[0]["length"] == len(a)
    assert ss[1]["off"] == len(a) + 8 and ss[1]["length"] == len(b)
    assert ss[2]["off"] == len(a) + 8 + len(b)
    # CHECK_CRC64 default, CRC32, SHA256
    assert [s["check"] for s in ss] == [4, 1, 10]
    # uncompressed sizes come from the index, no payload read
    assert sum(x["d_size"] for x in ss[0]["blocks"]) == 600
    assert sum(x["d_size"] for x in ss[1]["blocks"]) == 13 * 77
    # the split plan is real: each stream's range decodes independently
    for s, want in zip(ss, (b"first " * 100, b"second chunk " * 77,
                            b"third! " * 55)):
        assert lzma.decompress(
            blob[s["off"] : s["off"] + s["length"]]
        ) == want


def test_multiblock_index_geometry():
    # stdlib writes one block per stream; multi-record indexes come
    # from concatenation of per-chunk streams — block offsets must
    # tile each stream exactly
    chunks = [bytes([65 + k]) * (100 + k) for k in range(5)]
    blob = b"".join(lzma.compress(c) for c in chunks)
    ss = xz_streams(blob)
    assert len(ss) == 5
    pos = 0
    for s, c in zip(ss, chunks):
        assert s["off"] == pos
        assert s["blocks"][0]["d_size"] == len(c)
        pos += s["length"]
    assert pos == len(blob)


def test_corrupt_shapes_raise_named_error():
    good = lzma.compress(b"payload " * 200)
    cases = {
        "empty-ish": b"\x00\x00\x00\x00",
        "bad footer magic": good[:-2] + b"XX",
        "truncated": good[: len(good) // 2],
        "bad header magic": b"XXXXXX" + good[6:],
    }
    for label, blob in cases.items():
        with pytest.raises(XzError):
            xz_streams(blob)
    # flip a byte in the index region (just before the 12-byte footer)
    evil = bytearray(good)
    evil[-20] ^= 0x01
    with pytest.raises(XzError):
        xz_streams(bytes(evil))
    # flags copies disagreeing must raise, not trust either
    evil = bytearray(good)
    evil[7] ^= 0x01  # header flags byte; footer copy unchanged
    with pytest.raises(XzError):
        xz_streams(bytes(evil))


def test_random_tails_never_hang_or_fabricate():
    rng = random.Random(51)
    for _ in range(300):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(64)))
        try:
            xz_streams(blob + b"YZ")
        except XzError:
            pass  # the only acceptable failure shape
