"""RFC 1952 member walker (functions/gzipfile.py): header field
surfacing, FHCRC/trailer verification, SL split-length subfield,
stock-tool interop, corrupt-input discipline."""

import gzip
import struct
import zlib

import pytest

from core_spark.functions.gzipfile import (
    GzipError,
    gz_member_len,
    gzip_members,
    parse_member_header,
    write_member,
)


def test_member_roundtrip_and_fields():
    m = write_member(b"hello world\n", name="doc-7", mtime=1234, hcrc=True)
    (w,) = gzip_members(m)
    assert w["name"] == "doc-7"
    assert w["mtime"] == 1234
    assert w["d_size"] == 12
    assert w["c_size"] == len(m)
    assert w["split_len"] == len(m)
    assert w["crc32"] == zlib.crc32(b"hello world\n")
    assert gzip.decompress(m) == b"hello world\n"


def test_multi_member_walk_is_exact():
    chunks = [b"a" * 100, b"b\n" * 37, b"", b"tail"]
    chunks = [c for c in chunks if c]  # empty member not written
    raw = b"".join(write_member(c) for c in chunks)
    ms = gzip_members(raw)
    assert [m["d_size"] for m in ms] == [len(c) for c in chunks]
    off = 0
    for m in ms:
        assert m["h_off"] == off
        off += m["c_size"]
    assert off == len(raw)
    assert gzip.decompress(raw) == b"".join(chunks)


def test_gz_member_len_reads_header_only():
    m = write_member(b"x" * 5000)
    # a 64-byte prefix is enough: no body bytes touched
    assert gz_member_len(m[:64]) == len(m)


def test_stock_member_walks_but_has_no_split_len():
    raw = gzip.compress(b"stock writer bytes", mtime=0)
    (m,) = gzip_members(raw)
    assert m["split_len"] is None
    with pytest.raises(GzipError, match="SL"):
        gz_member_len(raw)


def test_stdlib_written_multistream_walks():
    raw = gzip.compress(b"one", mtime=0) + gzip.compress(b"two", mtime=0)
    ms = gzip_members(raw)
    assert [m["d_size"] for m in ms] == [3, 3]


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b"\x1f\x8c" + b[2:], "magic"),
        (lambda b: b[:2] + b"\x07" + b[3:], "compression method"),
        (lambda b: b[:3] + bytes([b[3] | 0x80]) + b[4:], "reserved"),
        (lambda b: b[:-6] + b"\xff\xff" + b[-4:], "CRC32 mismatch"),
        (lambda b: b[:-2] + b"\xff\xff", "ISIZE"),
        (lambda b: b[:-3], "trailer|EOF"),
    ],
)
def test_corrupt_members_raise_named(mutate, msg):
    raw = mutate(write_member(b"payload bytes here"))
    with pytest.raises(GzipError, match=msg):
        gzip_members(raw)


def test_sl_lie_is_caught_by_the_walk():
    m = bytearray(write_member(b"z" * 64))
    # the SL subfield data sits at offset 16 (10 fixed + 2 XLEN + 4 id)
    (cur,) = struct.unpack_from("<I", m, 16)
    struct.pack_into("<I", m, 16, cur + 3)
    with pytest.raises(GzipError, match="disagrees"):
        gzip_members(bytes(m))


def test_header_crc_tamper_raises():
    m = bytearray(write_member(b"q", name="n", hcrc=True))
    m[4] ^= 1  # MTIME byte, covered by FHCRC
    with pytest.raises(GzipError, match="CRC16"):
        gzip_members(bytes(m))


def test_random_bytes_never_hang_or_fabricate():
    """Fuzz discipline: arbitrary bytes after the magic either parse
    to verified members or raise GzipError — never hang, never
    fabricate data."""
    import random

    rng = random.Random(1952)
    for _ in range(300):
        blob = b"\x1f\x8b" + bytes(
            rng.randrange(256) for _ in range(rng.randrange(96))
        )
        try:
            ms = gzip_members(blob)
        except GzipError:
            continue
        # anything that parsed must re-verify through stdlib gzip
        assert gzip.decompress(blob) == b"".join(
            gzip.decompress(blob[m["h_off"]:m["h_off"] + m["c_size"]])
            for m in ms
        )


def test_bitflip_fuzz_every_byte_is_caught_or_harmless():
    """Flip every byte of a real two-member file: each flip either
    raises GzipError or leaves a still-consistent parse whose
    re-inflated content stdlib agrees with (flips inside FNAME or
    the deflate stream's redundant bits can be semantically inert;
    what must never happen is fabricated silent output)."""
    base = write_member(b"alpha beta gamma\n" * 4, name="m0") + write_member(
        b"delta epsilon\n" * 3
    )
    ok = gzip.decompress(base)
    for i in range(len(base)):
        for bit in (0x01, 0x80):
            bad = bytearray(base)
            bad[i] ^= bit
            bad = bytes(bad)
            try:
                ms = gzip_members(bad)
            except GzipError:
                continue
            got = b"".join(
                gzip.decompress(bad[m["h_off"]:m["h_off"] + m["c_size"]])
                for m in ms
            )
            # a surviving parse must agree with stdlib end-to-end
            assert got == gzip.decompress(bad)
            # and CRC-verified content can only be the original
            assert got == ok
