"""From-spec snappy raw-block decoder (functions/snappy.py), pinned
against pyarrow's codec — the bytes a real writer produces."""

import random

import pyarrow as pa
import pytest

from core_spark.functions.snappy import SnappyError, snappy_decompress

CODEC = pa.Codec("snappy")


def test_roundtrips_pyarrow_compressed_bytes():
    random.seed(11)
    cases = [
        b"",
        b"a",
        b"hello hello hello hello world world world",
        b"x" * 100_000,  # long runs => overlapping copies
        bytes(random.randrange(256) for _ in range(5_000)),  # literals
        b"abcdefgh" * 400,  # period-8 copies
    ]
    for raw in cases:
        comp = CODEC.compress(raw, asbytes=True)
        assert snappy_decompress(comp) == raw


def test_hand_built_elements_and_overlap():
    # literal 'ab' then an overlapping copy (offset 2, length 6):
    # spec says the decoded tail repeats -> 'abababab'
    # copy-1 length = 4 + ((tag>>2) & 7): length 6 -> tag 0x09
    blob = bytes([8]) + bytes([0x04]) + b"ab" + bytes([0x01 | (2 << 2), 2])
    assert snappy_decompress(blob) == b"abababab"
    # 2-byte-offset copy form of the same expansion
    blob = bytes([8]) + bytes([0x04]) + b"ab" + bytes(
        [0x02 | (5 << 2), 2, 0]
    )
    assert snappy_decompress(blob) == b"abababab"
    # 60-tag literal: length-1 in one extra byte
    blob = bytes([5]) + bytes([60 << 2, 4]) + b"hello"
    assert snappy_decompress(blob) == b"hello"


def test_corrupt_shapes_raise_named_error():
    good = CODEC.compress(b"hello hello hello hello", asbytes=True)
    cases = [
        b"",                          # no preamble
        b"\x80\x80\x80\x80\x80\x80",  # over-long varint
        bytes([10, 0x04]) + b"a",     # literal escapes input
        bytes([4]) + bytes([0x01 | (0 << 2), 9]),  # offset > output
        good[:-1],                    # truncated tail => wrong length
        bytes([1]) + bytes([0x0C]) + b"abcd",  # overruns preamble
    ]
    for blob in cases:
        with pytest.raises(SnappyError):
            snappy_decompress(blob)


def test_bit_flip_fuzz_never_hangs_or_underruns():
    random.seed(13)
    comp = CODEC.compress(b"the quick brown fox " * 40, asbytes=True)
    for _ in range(400):
        b = bytearray(comp)
        b[random.randrange(len(b))] ^= 1 << random.randrange(8)
        try:
            out = snappy_decompress(bytes(b))
        except SnappyError:
            continue
        # if it decodes, the length contract held
        assert len(out) == len(b"the quick brown fox " * 40)
