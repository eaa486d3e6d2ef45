"""EXIF/TIFF walk discipline (multimodal/exif.py)."""

import struct

import numpy as np
import pytest

from core_spark.multimodal.exif import (
    ExifError,
    attach_exif_app1,
    build_tiff_exif,
    exif_from_jpeg,
    parse_tiff_exif,
)
from core_spark.multimodal.jpeg import jpeg_encode, jpeg_meta

ARGS = dict(
    width=800, height=600, orientation=6, make="CamAB", model="M-7f",
    datetime="2021:03:04 05:06:07", exposure=(1, 250), iso=400,
)


def _jpeg() -> bytes:
    img = (np.arange(64).reshape(8, 8) * 3 % 256).astype(np.uint8)
    return jpeg_encode(img)


def test_roundtrip_both_byte_orders():
    jp = _jpeg()
    for bo in ("II", "MM"):
        got = exif_from_jpeg(
            attach_exif_app1(jp, build_tiff_exif(bo, **ARGS))
        )
        assert got == {"byte_order": bo, **{
            "width": 800, "height": 600, "orientation": 6,
            "make": "CamAB", "model": "M-7f",
            "datetime": "2021:03:04 05:06:07",
            "exposure": (1, 250), "iso": 400,
        }}


def test_spliced_jpeg_still_decodes_as_jpeg():
    """APP1 insertion must leave the image stream intact."""
    jp = _jpeg()
    tagged = attach_exif_app1(jp, build_tiff_exif("II", **ARGS))
    assert jpeg_meta(tagged) == jpeg_meta(jp)


def test_absent_and_corrupt_exif_raise_named_error():
    jp = _jpeg()
    with pytest.raises(ExifError):
        exif_from_jpeg(jp)  # no APP1 at all
    with pytest.raises(ExifError):
        exif_from_jpeg(b"not a jpeg")
    tiff = build_tiff_exif("II", **ARGS)
    for bad in (
        b"XX" + tiff[2:],                 # bad byte-order mark
        tiff[:2] + struct.pack("<H", 43) + tiff[4:],  # bad magic
        tiff[:10],                        # truncated IFD
    ):
        with pytest.raises(ExifError):
            parse_tiff_exif(bad)
    # IFD0 offset pointing past EOF
    evil = tiff[:4] + struct.pack("<I", len(tiff) + 100) + tiff[8:]
    with pytest.raises(ExifError):
        parse_tiff_exif(evil)


def test_missing_tags_yield_none_not_raise():
    """A minimal IFD with only Orientation: every other field None —
    real phone JPEGs omit fields constantly."""
    e = "<"
    ifd = struct.pack(e + "H", 1)
    ifd += struct.pack(e + "HHI", 0x0112, 3, 1) + struct.pack(
        e + "H", 3
    ).ljust(4, b"\x00")
    ifd += struct.pack(e + "I", 0)
    raw = b"II" + struct.pack(e + "HI", 42, 8) + ifd
    got = parse_tiff_exif(raw)
    assert got["orientation"] == 3
    assert got["width"] is None and got["exposure"] is None
    assert got["iso"] is None


def test_unknown_tags_and_types_are_skipped():
    e = ">"
    # two entries: an unknown tag with an unsupported type (7 =
    # UNDEFINED), then Orientation — the walk must skip the first
    ifd = struct.pack(e + "H", 2)
    ifd += struct.pack(e + "HHI", 0x9286, 7, 4) + b"\x00\x00\x00\x00"
    ifd += struct.pack(e + "HHI", 0x0112, 3, 1) + struct.pack(
        e + "H", 8
    ).ljust(4, b"\x00")
    ifd += struct.pack(e + "I", 0)
    raw = b"MM" + struct.pack(e + "HI", 42, 8) + ifd
    assert parse_tiff_exif(raw)["orientation"] == 8


def test_value_escaping_buffer_raises():
    e = "<"
    # Make (ASCII, count 64) whose offset points past EOF
    ifd = struct.pack(e + "H", 1)
    ifd += struct.pack(e + "HHI", 0x010F, 2, 64) + struct.pack(e + "I", 9999)
    ifd += struct.pack(e + "I", 0)
    raw = b"II" + struct.pack(e + "HI", 42, 8) + ifd
    with pytest.raises(ExifError):
        parse_tiff_exif(raw)


def test_oversized_exif_block_raises_named_error():
    """A JPEG segment length field is 16-bit; an oversized TIFF block
    must raise ExifError, not struct.error (review finding r8)."""
    with pytest.raises(ExifError):
        attach_exif_app1(_jpeg(), b"II" + b"\x00" * 70_000)


def test_zero_count_rational_near_eof_does_not_escape_contract():
    """A RATIONAL entry with count=0 has size 0 — the bounds check
    passes while the unpack still reads 8 raw bytes; placed at the
    buffer end it must not raise struct.error (ADVICE r8). Zero-count
    entries carry no data and are skipped."""
    e = "<"
    ifd = struct.pack(e + "H", 2)
    # entry 1: ExposureTime as RATIONAL with count=0 (inline "value"
    # is the last 4 bytes of the buffer once next-IFD is appended)
    ifd += struct.pack(e + "HHI", 0x829A, 5, 0) + struct.pack(e + "I", 22)
    # entry 2: Orientation, so the walk provably continues past it
    ifd += struct.pack(e + "HHI", 0x0112, 3, 1) + struct.pack(
        e + "H", 7
    ).ljust(4, b"\x00")
    ifd += struct.pack(e + "I", 0)
    raw = b"II" + struct.pack(e + "HI", 42, 8) + ifd
    got = parse_tiff_exif(raw)
    assert got["orientation"] == 7
    assert got["exposure"] is None
