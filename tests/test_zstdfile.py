"""Zstd frame walk (functions/zstdfile.py), pinned against pyarrow's
zstd codec in BOTH directions: real pyarrow frames walk correctly,
and our built raw-block frames decode under pyarrow."""

import random

import pyarrow as pa
import pytest

from core_spark.functions.zstdfile import (
    ZstdError,
    build_skippable,
    build_zstd_frames,
    zstd_frames,
)

CODEC = pa.Codec("zstd")


def test_walks_real_pyarrow_frames():
    raw = b"the quick brown fox jumps over the lazy dog " * 40
    comp = CODEC.compress(raw, asbytes=True)
    (f,) = zstd_frames(comp)
    assert f["kind"] == "zstd"
    assert f["off"] == 0 and f["length"] == len(comp)
    assert f["content_size"] == len(raw)
    # concatenated frames: each is an independent split unit
    blob = comp + CODEC.compress(b"second frame", asbytes=True)
    frames = zstd_frames(blob)
    assert [x["off"] for x in frames] == [0, len(comp)]
    assert frames[1]["content_size"] == len(b"second frame")


def test_built_frames_decode_under_pyarrow_and_reassemble():
    content = b"hello world, this is frame content! " * 11
    blob = build_skippable(b"seektbl1") + build_zstd_frames(content, 3)
    frames = zstd_frames(blob)
    assert [x["kind"] for x in frames] == ["skippable"] + ["zstd"] * 3
    got = b""
    for f in frames:
        if f["kind"] != "zstd":
            continue
        piece = blob[f["off"] : f["off"] + f["length"]]
        got += CODEC.decompress(
            piece, decompressed_size=f["content_size"], asbytes=True
        )
    assert got == content
    # chunk sizes follow the base/remainder split exactly
    sizes = [f["content_size"] for f in frames if f["kind"] == "zstd"]
    base, rem = divmod(len(content), 3)
    assert sizes == [base + 1] * rem + [base] * (3 - rem)


def test_rle_block_occupies_one_byte():
    # single-segment frame, FCS 4-byte, one RLE block: size field is
    # the REPEAT count, content is one byte (RFC 8878 §3.1.1)
    import struct

    hdr = (10 << 3) | (1 << 1) | 1  # size=10 repeats, RLE, last
    blob = (
        struct.pack("<I", 0xFD2FB528)
        + bytes([(2 << 6) | 0x20])
        + struct.pack("<I", 10)
        + bytes([hdr & 0xFF, (hdr >> 8) & 0xFF, (hdr >> 16) & 0xFF])
        + b"z"
    )
    (f,) = zstd_frames(blob)
    assert f["n_blocks"] == 1 and f["length"] == len(blob)


def test_corrupt_shapes_raise_named_error():
    content = b"abc def ghi jkl"
    blob = build_zstd_frames(content, 2)
    cases = [
        b"\x00\x00\x00\x00",      # bad magic
        blob[:6],                  # truncated header
        blob[:-2],                 # block escapes buffer
        build_skippable(b"xy")[:-1],  # skippable escapes buffer
        # reserved FHD bit set
        blob[:4] + bytes([blob[4] | 0x08]) + blob[5:],
    ]
    for bad in cases:
        with pytest.raises(ZstdError):
            zstd_frames(bad)
    # reserved block type
    import struct

    hdr = (4 << 3) | (3 << 1) | 1
    bad = (
        struct.pack("<I", 0xFD2FB528)
        + bytes([(2 << 6) | 0x20])
        + struct.pack("<I", 4)
        + bytes([hdr & 0xFF, (hdr >> 8) & 0xFF, (hdr >> 16) & 0xFF])
        + b"abcd"
    )
    with pytest.raises(ZstdError):
        zstd_frames(bad)


def test_random_bytes_never_hang_or_fabricate():
    random.seed(17)
    for _ in range(300):
        blob = bytes(
            random.randrange(256) for _ in range(random.randrange(1, 80))
        )
        try:
            frames = zstd_frames(blob)
        except ZstdError:
            continue
        # anything that walks must consume exactly the buffer
        assert sum(f["length"] for f in frames) == len(blob)


def test_seek_table_matches_frame_walk_and_reassembles():
    """Seekable format: the tail-only seek table must agree with the
    full frame walk, and its ranges must reassemble the content
    through pyarrow's decompressor."""
    from core_spark.functions.zstdfile import (
        build_seekable,
        zstd_seek_table,
    )

    content = b"seekable content for the walker " * 20
    blob = build_seekable(content, 4)
    tab = zstd_seek_table(blob)
    frames = [f for f in zstd_frames(blob) if f["kind"] == "zstd"]
    assert [(e["c_off"], e["c_size"]) for e in tab] == [
        (f["off"], f["length"]) for f in frames
    ]
    got = b"".join(
        CODEC.decompress(
            blob[e["c_off"] : e["c_off"] + e["c_size"]],
            decompressed_size=e["d_size"],
            asbytes=True,
        )
        for e in tab
    )
    assert got == content
    # decompressed offsets are the content prefix sums
    assert [e["d_off"] for e in tab] == [
        sum(x["d_size"] for x in tab[:i]) for i in range(len(tab))
    ]


def test_seek_table_corrupt_shapes_raise():
    from core_spark.functions.zstdfile import (
        ZstdError as ZE,
        build_seekable,
        zstd_seek_table,
    )
    import struct

    blob = build_seekable(b"abc def ghi jkl mno", 2)
    with pytest.raises(ZE):
        zstd_seek_table(blob[:-1])          # magic gone
    with pytest.raises(ZE):
        zstd_seek_table(b"\x00" * 17)       # no magic at all
    # stale table: patch a c_size so sizes no longer sum to the body
    bad = bytearray(blob)
    entry0 = len(blob) - 9 - 2 * 8
    struct.pack_into("<I", bad, entry0, 999)
    with pytest.raises(ZE):
        zstd_seek_table(bytes(bad))
    # reserved descriptor bits
    bad = bytearray(blob)
    bad[-5] |= 0x01
    with pytest.raises(ZE):
        zstd_seek_table(bytes(bad))
