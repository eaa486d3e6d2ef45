"""EXIF metadata walking (the public TIFF 6.0 + EXIF 2.3x specs) —
the capture-metadata gate an image curation pass filters and
deduplicates on (orientation fixing, timestamp bucketing,
camera-model stats) without decoding a single pixel. Pure stdlib.

An EXIF block is a TIFF stream: a 2-byte byte-order mark (``II``
little-endian / ``MM`` big-endian — real corpora carry both, so the
fixture alternates them), the magic 42, an offset to IFD0; an IFD is
a 2-byte entry count, then 12-byte entries (tag, type, count,
value-or-offset — the value lives inline iff its encoded size fits
in 4 bytes), then a next-IFD offset. Tag 0x8769 points at the Exif
SubIFD (exposure, ISO, pixel dims), which this walk follows — the
pointer-chase is where naive parsers break. Inside a JPEG the TIFF
stream rides in an APP1 segment behind the ``Exif\\0\\0`` preamble,
and ALL offsets are relative to the TIFF header, not the file.

Corrupt-input discipline (the codec-suite rule): a wrong byte-order
mark or magic, an IFD or value escaping the buffer, or a missing
APP1 raises the named ExifError — never a hang, never fabricated
fields. Unknown tags are skipped (the spec requires readers to
tolerate them), and so is any entry whose value TYPE is outside the
supported set (ASCII/SHORT/LONG/RATIONAL) — an oddly-typed known
tag reads as absent rather than aborting the walk.

Reference parity: gazette/core moves opaque serializations only
(message/interfaces.go:121-124); metadata parsing happens in
executor-side Arrow kernels.
"""

from __future__ import annotations

import struct

PREAMBLE = b"Exif\x00\x00"
MAX_IFD_ENTRIES = 4096

# TIFF value types → (struct code, byte size)
_TYPES = {2: ("s", 1), 3: ("H", 2), 4: ("I", 4), 5: ("II", 8)}

TAG_WIDTH = 0x0100
TAG_HEIGHT = 0x0101
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_EXPOSURE = 0x829A
TAG_ISO = 0x8827


class ExifError(ValueError):
    """Named parse failure: corrupt or absent EXIF metadata."""


def _read_ifd(raw: bytes, off: int, e: str) -> dict[int, object]:
    """One IFD at `off` (TIFF-relative) → {tag: decoded value}."""
    if off + 2 > len(raw):
        raise ExifError("IFD offset escapes the buffer")
    (n,) = struct.unpack_from(e + "H", raw, off)
    if n > MAX_IFD_ENTRIES:
        raise ExifError("implausible IFD entry count")
    if off + 2 + 12 * n + 4 > len(raw):
        raise ExifError("IFD table escapes the buffer")
    out: dict[int, object] = {}
    for k in range(n):
        tag, typ, cnt = struct.unpack_from(
            e + "HHI", raw, off + 2 + 12 * k
        )
        voff = off + 2 + 12 * k + 8
        if typ not in _TYPES:
            continue  # unknown value type on an unknown tag: skip
        if cnt == 0:
            # a zero-count entry has size 0, which would pass the
            # bounds check below while RATIONAL still unpacks 8 raw
            # bytes — a crafted entry near the buffer end would raise
            # struct.error, escaping the ExifError contract; spec-less
            # empty values carry no data, so skip the tag
            continue
        code, unit = _TYPES[typ]
        size = unit * cnt
        if size > 4:
            (voff,) = struct.unpack_from(e + "I", raw, voff)
        if voff + size > len(raw):
            raise ExifError(f"tag 0x{tag:04X} value escapes the buffer")
        if typ == 2:  # ASCII, NUL-terminated per spec
            s = raw[voff : voff + cnt]
            out[tag] = s.split(b"\x00", 1)[0].decode(
                "ascii", errors="replace"
            )
        elif typ == 5:  # RATIONAL: two LONGs
            num, den = struct.unpack_from(e + "II", raw, voff)
            out[tag] = (num, den)
        else:
            vals = struct.unpack_from(e + code * cnt, raw, voff)
            out[tag] = vals[0] if cnt == 1 else list(vals)
    return out


def parse_tiff_exif(raw: bytes) -> dict:
    """TIFF-stream walk → {byte_order, width, height, orientation,
    make, model, datetime, exposure (num, den) | None, iso} with
    None for absent tags. Follows the Exif SubIFD pointer."""
    bom = raw[:2]
    if bom == b"II":
        e = "<"
    elif bom == b"MM":
        e = ">"
    else:
        raise ExifError("bad TIFF byte-order mark")
    if len(raw) < 8:
        raise ExifError("truncated TIFF header")
    magic, ifd0 = struct.unpack_from(e + "HI", raw, 2)
    if magic != 42:
        raise ExifError(f"bad TIFF magic {magic}")
    ifd = _read_ifd(raw, ifd0, e)
    sub: dict[int, object] = {}
    if isinstance(ifd.get(TAG_EXIF_IFD), int):
        sub = _read_ifd(raw, ifd[TAG_EXIF_IFD], e)
    exp = sub.get(TAG_EXPOSURE)
    return {
        "byte_order": bom.decode("ascii"),
        "width": ifd.get(TAG_WIDTH),
        "height": ifd.get(TAG_HEIGHT),
        "orientation": ifd.get(TAG_ORIENTATION),
        "make": ifd.get(TAG_MAKE),
        "model": ifd.get(TAG_MODEL),
        "datetime": ifd.get(TAG_DATETIME),
        "exposure": exp if isinstance(exp, tuple) else None,
        "iso": sub.get(TAG_ISO),
    }


def exif_from_jpeg(raw: bytes) -> dict:
    """Find the APP1 ``Exif\\0\\0`` segment in a JPEG and parse its
    TIFF stream. Raises ExifError when the JPEG carries none (a
    curation pass routes those to the no-metadata bucket) or when
    the JPEG structure itself is broken."""
    from core_spark.multimodal.jpeg import _segments

    try:
        for marker, payload, _off in _segments(raw):
            if marker == 0xE1 and payload[: len(PREAMBLE)] == PREAMBLE:
                return parse_tiff_exif(payload[len(PREAMBLE):])
    except ValueError as exc:  # jpeg walk's own malformed-JPEG raise
        raise ExifError(str(exc)) from None
    raise ExifError("no APP1 Exif segment")


# -------------------------------------------------------------- builder
def build_tiff_exif(
    byte_order: str,
    width: int,
    height: int,
    orientation: int,
    make: str,
    model: str,
    datetime: str,
    exposure: tuple[int, int],
    iso: int,
) -> bytes:
    """Assemble a real TIFF/EXIF stream: IFD0 (dims as SHORTs,
    orientation, Make/Model/DateTime as offset-stored ASCII, the
    Exif-SubIFD pointer) + value area + SubIFD (RATIONAL exposure,
    SHORT ISO) + its value area, in either byte order with exact
    offsets — the structure a conformance walk must really chase."""
    e = "<" if byte_order == "II" else ">"

    def entry(tag: int, typ: int, cnt: int, val: bytes) -> bytes:
        return struct.pack(e + "HHI", tag, typ, cnt) + val.ljust(
            4, b"\x00"
        )

    make_b = make.encode("ascii") + b"\x00"
    model_b = model.encode("ascii") + b"\x00"
    dt_b = datetime.encode("ascii") + b"\x00"
    # layout: header(8) IFD0(2+7*12+4) ascii values, SubIFD(2+2*12+4),
    # then the RATIONAL value — every offset exact by construction
    ifd0_off = 8
    make_off = ifd0_off + 2 + 7 * 12 + 4
    model_off = make_off + len(make_b)
    dt_off = model_off + len(model_b)
    sub_off = dt_off + len(dt_b)
    exp_off = sub_off + 2 + 2 * 12 + 4

    # entries ascending by tag within an IFD (TIFF 6.0 requirement);
    # 0x8769 sorts last of the seven
    ifd0 = struct.pack(e + "H", 7)
    ifd0 += entry(TAG_WIDTH, 3, 1, struct.pack(e + "H", width))
    ifd0 += entry(TAG_HEIGHT, 3, 1, struct.pack(e + "H", height))
    ifd0 += entry(TAG_MAKE, 2, len(make_b), struct.pack(e + "I", make_off))
    ifd0 += entry(
        TAG_MODEL, 2, len(model_b), struct.pack(e + "I", model_off)
    )
    ifd0 += entry(
        TAG_ORIENTATION, 3, 1, struct.pack(e + "H", orientation)
    )
    ifd0 += entry(TAG_DATETIME, 2, len(dt_b), struct.pack(e + "I", dt_off))
    ifd0 += entry(TAG_EXIF_IFD, 4, 1, struct.pack(e + "I", sub_off))
    ifd0 += struct.pack(e + "I", 0)  # next IFD: none

    sub = struct.pack(e + "H", 2)
    sub += entry(TAG_EXPOSURE, 5, 1, struct.pack(e + "I", exp_off))
    sub += entry(TAG_ISO, 3, 1, struct.pack(e + "H", iso))
    sub += struct.pack(e + "I", 0)
    exp_b = struct.pack(e + "II", *exposure)

    header = (
        byte_order.encode("ascii")
        + struct.pack(e + "H", 42)
        + struct.pack(e + "I", ifd0_off)
    )
    return header + ifd0 + make_b + model_b + dt_b + sub + exp_b


def attach_exif_app1(jpeg: bytes, tiff: bytes) -> bytes:
    """Splice an APP1 Exif segment right after SOI — where real
    cameras write it."""
    if jpeg[:2] != b"\xff\xd8":
        raise ExifError("not a JPEG (missing SOI)")
    payload = PREAMBLE + tiff
    if len(payload) + 2 > 0xFFFF:
        # a JPEG segment length field is 16-bit; real cameras split
        # oversized EXIF across segments — out of scope here
        raise ExifError("EXIF block exceeds the 65533-byte APP1 limit")
    seg = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return jpeg[:2] + seg + jpeg[2:]
