"""ZIP walker pins. The stdlib ``zipfile`` module is the INDEPENDENT
writer/reader here — unlike the PDF tier (see COVERAGE.md's
remaining-fences table), the zip walker escapes the self-paired
class entirely: stdlib writes → our walker reads (stored, deflate,
bzip2, lzma, utf-8 names, zip64, data descriptors, comments), and
our from-spec writer's output → stdlib reads, across the
descriptor × zip64 grid. Method 93 (zstd) pairs our own RFC 8878
encoder/decoder, each of which carries its own zstd-jni cross-pins
(tests/test_zstd_encode.py / test_zstd_decode.py), so independence
is inherited one layer down. Hostile inputs must raise the named
ZipError — never a hang, never fabricated members."""

from __future__ import annotations

import io
import struct
import zipfile
import zlib

import pytest

from core_spark.functions.ziparchive import (
    M_BZIP2,
    M_DEFLATE,
    M_LZMA,
    M_STORED,
    M_ZSTD,
    ZipError,
    write_zip,
    zip_eocd,
    zip_extract,
    zip_members,
    zip_read_member,
)

ENTRIES = [
    ("p/q.txt", b"alpha " * 200),
    ("r.bin", bytes(range(256)) * 3),
    ("empty.txt", b""),
    ("s.txt", b"beta beta beta"),
]


def _stdlib_zip(members, methods=None, comment=b""):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for i, (name, data) in enumerate(members):
            m = (methods or [zipfile.ZIP_DEFLATED] * len(members))[i]
            z.writestr(name, data, m)
        if comment:
            z.comment = comment
    return buf.getvalue()


# ------------------------------------------ stdlib writes, we read


def test_stdlib_writer_all_methods_roundtrip():
    methods = [
        zipfile.ZIP_DEFLATED,
        zipfile.ZIP_STORED,
        zipfile.ZIP_BZIP2,
        zipfile.ZIP_LZMA,
    ]
    raw = _stdlib_zip(ENTRIES, methods)
    ms = zip_members(raw)
    assert [m["name"] for m in ms] == [n for n, _ in ENTRIES]
    assert [m["method_name"] for m in ms] == [
        "deflate",
        "stored",
        "bzip2",
        "lzma",
    ]
    for m, (_, data) in zip(ms, ENTRIES):
        assert zip_extract(raw, m) == data
        assert m["crc32"] == zlib.crc32(data)


def test_stdlib_utf8_names_flag_bit_11():
    raw = _stdlib_zip([("naïve-ünïcode.txt", b"x")])
    (m,) = zip_members(raw)
    assert m["utf8"] and m["name"] == "naïve-ünïcode.txt"


def test_stdlib_zip64_descriptor_and_comment():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        with z.open("big.txt", "w", force_zip64=True) as f:
            f.write(b"x" * 100_000)
        z.comment = b"trailing comment with PK\x05\x06 bytes inside"
    raw = buf.getvalue()
    eocd = zip_eocd(raw)
    assert eocd["comment"].startswith(b"trailing")
    (m,) = zip_members(raw)
    assert zip_extract(raw, m) == b"x" * 100_000


def test_stored_offsets_are_ranged_get_exact():
    """data_off/comp_size from the walk slice the archive to the
    member bytes exactly — the ranged-GET plan the walker exists
    for."""
    raw = _stdlib_zip(ENTRIES, [zipfile.ZIP_STORED] * 4)
    for m, (_, data) in zip(zip_members(raw), ENTRIES):
        assert raw[m["data_off"] : m["data_off"] + m["comp_size"]] == data


# ------------------------------------------ we write, stdlib reads


@pytest.mark.parametrize("dd", [False, True])
@pytest.mark.parametrize("z64", [False, True])
def test_our_writer_stdlib_reads(dd, z64):
    raw = write_zip(
        ENTRIES,
        methods=[M_DEFLATE, M_STORED, M_BZIP2, M_LZMA],
        data_descriptor=dd,
        force_zip64=z64,
        comment=b"hi",
    )
    with zipfile.ZipFile(io.BytesIO(raw)) as z:
        assert z.comment == b"hi"
        for name, data in ENTRIES:
            assert z.read(name) == data
    for m, (name, data) in zip(zip_members(raw), ENTRIES):
        assert m["name"] == name
        assert zip_extract(raw, m) == data


def test_method_93_zstd_roundtrip():
    raw = write_zip([("z.txt", b"zstd zstd " * 100)], method=M_ZSTD)
    assert zip_read_member(raw, "z.txt") == b"zstd zstd " * 100
    (m,) = zip_members(raw)
    assert m["method_name"] == "zstd"


def test_writer_utf8_flag():
    raw = write_zip([("héllo.txt", b"d")], method=M_STORED)
    (m,) = zip_members(raw)
    assert m["utf8"]
    with zipfile.ZipFile(io.BytesIO(raw)) as z:
        assert z.namelist() == ["héllo.txt"]


# ------------------------------------------------------- hostile


def test_truncated_refuses():
    raw = write_zip(ENTRIES[:2])
    for cut in (0, 10, 21, len(raw) - 1):
        with pytest.raises(ZipError):
            zip_members(raw[:cut])


def test_crc_flip_refuses_on_extract():
    raw = bytearray(write_zip(ENTRIES[:1], method=M_STORED))
    (m,) = zip_members(bytes(raw))
    raw[m["data_off"]] ^= 0xFF
    with pytest.raises(ZipError, match="CRC mismatch"):
        zip_extract(bytes(raw), zip_members(bytes(raw))[0])


def test_deflate_garbage_refuses():
    raw = bytearray(write_zip(ENTRIES[:1], method=M_DEFLATE))
    (m,) = zip_members(bytes(raw))
    raw[m["data_off"]] ^= 0xFF
    with pytest.raises(ZipError):
        zip_extract(bytes(raw), zip_members(bytes(raw))[0])


def test_encrypted_member_refuses():
    raw = bytearray(_stdlib_zip(ENTRIES[:1]))
    eocd = zip_eocd(bytes(raw))
    # set flag bit 0 in both central and local headers
    raw[eocd["cd_off"] + 8] |= 0x01
    lho = struct.unpack_from("<I", raw, eocd["cd_off"] + 42)[0]
    raw[lho + 6] |= 0x01
    with pytest.raises(ZipError, match="encrypted"):
        zip_members(bytes(raw))


def test_unknown_method_refuses():
    raw = bytearray(_stdlib_zip(ENTRIES[:1]))
    eocd = zip_eocd(bytes(raw))
    raw[eocd["cd_off"] + 10] = 97  # WavPack
    with pytest.raises(ZipError, match="method 97"):
        zip_members(bytes(raw))


def test_entry_count_mismatch_refuses():
    raw = bytearray(write_zip(ENTRIES[:2]))
    # EOCD total-entries field (no comment → fixed tail layout)
    off = len(raw) - 22
    assert bytes(raw[off : off + 4]) == b"PK\x05\x06"
    struct.pack_into("<HH", raw, off + 8, 3, 3)
    with pytest.raises(ZipError, match="declares 3"):
        zip_members(bytes(raw))


def test_eocd_magic_inside_comment_not_hijacked():
    """An EOCD-shaped byte run inside the comment whose declared
    comment length does NOT land on EOF must be skipped; the real
    record parses."""
    fake = b"PK\x05\x06" + b"\x00" * 16 + struct.pack("<H", 1)
    raw = write_zip(ENTRIES[:1], comment=fake + b" trailing pad")
    eocd = zip_eocd(raw)
    assert eocd["entries"] == 1
    assert eocd["comment"].startswith(fake)


def test_local_central_name_mismatch_refuses():
    raw = bytearray(write_zip([("abcd.txt", b"x")], method=M_STORED))
    (m,) = zip_members(bytes(raw))
    raw[m["header_off"] + 30] ^= 0x01  # flip a local-name byte
    with pytest.raises(ZipError, match="name mismatch"):
        zip_members(bytes(raw))


def test_data_escaping_directory_refuses():
    raw = bytearray(write_zip(ENTRIES[:1], method=M_STORED))
    eocd = zip_eocd(bytes(raw))
    # inflate the central comp_size so data would overrun cd_off
    struct.pack_into("<I", raw, eocd["cd_off"] + 20, 1 << 30)
    with pytest.raises(ZipError):
        zip_members(bytes(raw))


def test_multi_disk_refuses():
    raw = bytearray(write_zip(ENTRIES[:1]))
    off = len(raw) - 22
    struct.pack_into("<H", raw, off + 4, 1)  # disk number 1
    with pytest.raises(ZipError, match="multi-disk"):
        zip_members(bytes(raw))


def test_zip64_saturated_without_extra_refuses():
    raw = bytearray(_stdlib_zip(ENTRIES[:1]))
    eocd = zip_eocd(bytes(raw))
    struct.pack_into("<I", raw, eocd["cd_off"] + 24, 0xFFFFFFFF)
    with pytest.raises(ZipError, match="saturated"):
        zip_members(bytes(raw))


def test_descriptor_disagreement_refuses():
    raw = bytearray(
        write_zip(ENTRIES[:1], method=M_STORED, data_descriptor=True)
    )
    (m,) = zip_members(bytes(raw))
    dd = m["data_off"] + m["comp_size"]
    assert bytes(raw[dd : dd + 4]) == b"PK\x07\x08"
    raw[dd + 4] ^= 0xFF  # corrupt descriptor CRC
    with pytest.raises(ZipError, match="descriptor"):
        zip_extract(bytes(raw), zip_members(bytes(raw))[0])


# ---------------------------------------- Info-ZIP unicode path extra


def test_unicode_path_extra_override():
    """The Info-ZIP 0x7075 shape: cp437 standard name + UTF-8
    override keyed by the standard name's CRC-32; flag bit 11 stays
    clear, stdlib reads the archive (by its cp437 name), and our
    walker surfaces the UTF-8 name."""
    raw = write_zip(
        [("naïve-日本.txt", b"d1"), ("plain.txt", b"d2")],
        method=M_STORED,
        unicode_path_extra=True,
    )
    ms = zip_members(raw)
    assert ms[0]["name"] == "naïve-日本.txt" and ms[0]["utf8"]
    assert not (ms[0]["flag"] & 0x0800)
    assert zip_extract(raw, ms[0]) == b"d1"
    with zipfile.ZipFile(io.BytesIO(raw)) as z:
        assert len(z.namelist()) == 2  # container stays readable


def test_unicode_path_extra_stale_crc_ignored():
    """A 0x7075 whose CRC does not match the standard name is STALE
    (the spec's rename guard) and must be ignored, not honored and
    not an error."""
    raw = bytearray(
        write_zip(
            [("naïve.txt", b"d")],
            method=M_STORED,
            unicode_path_extra=True,
        )
    )
    eocd = zip_eocd(bytes(raw))
    i = raw.find(b"\x75\x70", eocd["cd_off"])  # the CENTRAL copy
    assert i > 0
    raw[i + 5] ^= 0xFF  # corrupt the embedded CRC
    (m,) = zip_members(bytes(raw))
    assert not m["utf8"]
    assert m["name"] == "naïve.txt"  # cp437 round-trips this one


# ----------------------------------------------- property fuzz


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_NAME = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters="\x00/\\",
        exclude_categories=("Cs", "Cc"),
    ),
    min_size=1,
    max_size=24,
)


@settings(max_examples=40, deadline=None)
@given(
    entries=st.lists(
        st.tuples(_NAME, st.binary(max_size=600)),
        min_size=1,
        max_size=5,
        unique_by=lambda e: e[0],
    ),
    methods=st.lists(
        st.sampled_from([M_STORED, M_DEFLATE, M_BZIP2, M_LZMA]),
        min_size=5,
        max_size=5,
    ),
    dd=st.booleans(),
    z64=st.booleans(),
    upe=st.booleans(),
    comment=st.binary(max_size=80),
)
def test_fuzz_writer_walker_stdlib_triangle(
    entries, methods, dd, z64, upe, comment
):
    """Any archive our writer can produce — any names (incl.
    unicode via flag-11 or the 0x7075 extra), any method mix,
    descriptor × zip64 × comment — must (a) round-trip through our
    walker byte-exactly and (b) open and read identically with the
    INDEPENDENT stdlib reader."""
    raw = write_zip(
        entries,
        methods=methods[: len(entries)],
        data_descriptor=dd,
        force_zip64=z64,
        comment=comment,
        unicode_path_extra=upe,
    )
    ms = zip_members(raw)
    assert len(ms) == len(entries)
    for m, (name, data) in zip(ms, entries):
        assert m["name"] == name
        assert zip_extract(raw, m) == data
    with zipfile.ZipFile(io.BytesIO(raw)) as z:
        infos = z.infolist()
        assert len(infos) == len(entries)
        for info, (name, data) in zip(infos, entries):
            assert z.read(info) == data
