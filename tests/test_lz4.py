"""From-spec LZ4 block decoder (functions/lz4.py), pinned against
pyarrow's raw-block codec — the bytes a real writer produces."""

import random

import pyarrow as pa
import pytest

from core_spark.functions.lz4 import Lz4Error, lz4_block_decompress

CODEC = pa.Codec("lz4_raw")


def test_roundtrips_pyarrow_compressed_bytes():
    random.seed(21)
    cases = [
        b"",
        b"a",
        b"hello world hello world hello",
        b"x" * 100_000,  # long runs => overlapping matches
        bytes(random.randrange(256) for _ in range(5_000)),  # literals
        b"abcdefgh" * 400,  # period-8 matches
    ]
    for raw in cases:
        comp = CODEC.compress(raw, asbytes=True)
        assert lz4_block_decompress(comp) == raw
        assert lz4_block_decompress(comp, len(raw)) == raw


def test_hand_built_sequences_and_overlap():
    # literals 'ab', then an overlapping match (offset 2, len 6):
    # token = lit_len 2 | match_len (6-4)=2 -> 0x22, offset LE
    blob = bytes([0x22]) + b"ab" + bytes([2, 0]) + bytes([0x00])
    # trailing token 0x00 = final empty-literal sequence
    assert lz4_block_decompress(blob) == b"abababab"
    # 15+ literal extension: 17 literals = token 0xF0, ext byte 2
    lits = bytes(range(17))
    blob = bytes([0xF0, 2]) + lits
    assert lz4_block_decompress(blob) == lits


def test_corrupt_shapes_raise_named_error():
    good = CODEC.compress(b"hello hello hello hello", asbytes=True)
    cases = [
        b"",                        # empty
        bytes([0xF0]),              # truncated length extension
        bytes([0x40]) + b"abc",     # literals escape the input
        bytes([0x12]) + b"a" + bytes([9, 0]) + bytes([0x00]),  # offset > out
        bytes([0x12]) + b"a" + bytes([0, 0]) + bytes([0x00]),  # offset 0
        bytes([0x12]) + b"a" + bytes([1]),  # truncated offset
    ]
    for blob in cases:
        with pytest.raises(Lz4Error):
            lz4_block_decompress(blob)
    # wrong expected size
    with pytest.raises(Lz4Error):
        lz4_block_decompress(good, 7)


def test_bit_flip_fuzz_never_hangs_or_lies_about_size():
    random.seed(23)
    raw = b"the quick brown fox " * 40
    comp = CODEC.compress(raw, asbytes=True)
    for _ in range(400):
        b = bytearray(comp)
        b[random.randrange(len(b))] ^= 1 << random.randrange(8)
        try:
            out = lz4_block_decompress(bytes(b), len(raw))
        except Lz4Error:
            continue
        assert len(out) == len(raw)
