"""ZIP archive walking — the other container besides tar that crawled
corpora actually arrive in (and the substrate of DOCX/XLSX/ODT/EPUB/JAR).
Pure stdlib byte walking per the public PKWARE APPNOTE.TXT (6.3.x)
layout; the stdlib ``zipfile`` module is used only in tests, as the
INDEPENDENT writer/reader the walker is pinned against in both
directions.

Why a from-spec walker instead of ``zipfile.ZipFile``: the scale shape.
A ZIP's index — the central directory — lives at the END of the file,
so a planner over object storage lists members from a tail-KB ranged
GET (EOCD → central directory) and then fetches only the member byte
ranges it needs, exactly the parquet-footer discipline
(``parquetfile.py``). ``zipfile`` wants a seekable file and hides the
offsets; this walker RETURNS them, so the plan can be pure ranged
reads. Reference parity: gazette/core moves opaque serializations
only (message/interfaces.go:121-124); container parsing happens in
executor-side Arrow kernels.

Format per APPNOTE.TXT: local file header ``PK\\x03\\x04`` (sizes,
CRC-32, name) before each member's data; central directory of
``PK\\x01\\x02`` entries mirroring every local header plus the local
header offset; end-of-central-directory ``PK\\x05\\x06`` with entry
count, directory size/offset and a trailing comment; ZIP64 (EOCD64
``PK\\x06\\x06`` + locator ``PK\\x06\\x07`` and the 0x0001 extra
field) when any 32/16-bit field saturates; general-purpose flag bit 3
moves CRC/sizes into a data descriptor after the data; flag bit 11
marks UTF-8 names (else cp437, the spec's default).

Compression methods: 0 stored, 8 deflate (raw zlib), 12 bzip2
(stdlib), 14 LZMA (the zip framing: 2-byte version + 2-byte props
length + LZMA1 props; decoded via a synthesized lzma ALONE header,
all public stdlib), 93 zstd (this repo's own from-spec RFC 8878
decoder, ``zstd_decode.py``). Anything else — and any ENCRYPTED
member (flag bit 0) — raises the named ZipError: never a silent
wrong answer.

Corrupt-input discipline (the codec-suite rule): bad magics, counts
that disagree between EOCD and the walked directory, central/local
header mismatches, member data escaping the directory start, a
comment that does not reach EOF, CRC or size mismatches on extract —
every one raises ZipError with a position, never a hang, never
fabricated members. Multi-disk archives refuse loudly (nonzero disk
fields): spanning went out with floppies and a conservative refusal
beats a guessed merge.
"""

from __future__ import annotations

import struct
import zlib

_EOCD_MAGIC = b"PK\x05\x06"
_EOCD64_MAGIC = b"PK\x06\x06"
_EOCD64_LOC_MAGIC = b"PK\x06\x07"
_CDE_MAGIC = b"PK\x01\x02"
_LFH_MAGIC = b"PK\x03\x04"
_DD_MAGIC = b"PK\x07\x08"

_MAX_COMMENT = 0xFFFF
_FLAG_ENCRYPTED = 0x0001
_FLAG_DESCRIPTOR = 0x0008
_FLAG_UTF8 = 0x0800

M_STORED, M_DEFLATE, M_BZIP2, M_LZMA, M_ZSTD = 0, 8, 12, 14, 93
_METHOD_NAMES = {
    M_STORED: "stored",
    M_DEFLATE: "deflate",
    M_BZIP2: "bzip2",
    M_LZMA: "lzma",
    M_ZSTD: "zstd",
}


class ZipError(ValueError):
    """Named parse failure: corrupt, unsupported, or hostile input."""


def _u16(raw: bytes, i: int) -> int:
    return raw[i] | (raw[i + 1] << 8)


def _u32(raw: bytes, i: int) -> int:
    return struct.unpack_from("<I", raw, i)[0]


def _u64(raw: bytes, i: int) -> int:
    return struct.unpack_from("<Q", raw, i)[0]


# --------------------------------------------------------------- EOCD


def zip_eocd(raw: bytes) -> dict:
    """Locate and parse the end-of-central-directory record, following
    the ZIP64 locator when present. Returns {entries, cd_off, cd_size,
    comment, zip64, eocd_off} — everything a tail-KB ranged GET needs
    to plan the central-directory fetch.

    The scan walks BACKWARD from EOF over at most 64 KiB + 22 bytes
    (the spec's comment bound) and accepts only a magic whose declared
    comment length lands exactly on EOF — so an EOCD-shaped byte run
    INSIDE the comment text cannot hijack the parse (hostile-input
    pin in tests)."""
    n = len(raw)
    if n < 22:
        raise ZipError(f"too short for an EOCD record: {n} bytes")
    lo = max(0, n - 22 - _MAX_COMMENT)
    pos = -1
    i = n - 22
    while i >= lo:
        if raw[i : i + 4] == _EOCD_MAGIC:
            clen = _u16(raw, i + 20)
            if i + 22 + clen == n:
                pos = i
                break
        i -= 1
    if pos < 0:
        raise ZipError("no end-of-central-directory record found")
    disk, cd_disk = _u16(raw, pos + 4), _u16(raw, pos + 6)
    entries_disk, entries = _u16(raw, pos + 8), _u16(raw, pos + 10)
    cd_size, cd_off = _u32(raw, pos + 12), _u32(raw, pos + 16)
    clen = _u16(raw, pos + 20)
    comment = raw[pos + 22 : pos + 22 + clen]
    out = {
        "entries": entries,
        "cd_off": cd_off,
        "cd_size": cd_size,
        "comment": comment,
        "zip64": False,
        "eocd_off": pos,
    }
    if disk or cd_disk or entries_disk != entries:
        # Saturated fields mean "see ZIP64"; anything else is a
        # multi-disk archive, refused below after the zip64 probe.
        pass
    # ZIP64: locator sits immediately before the EOCD.
    loc = pos - 20
    if loc >= 0 and raw[loc : loc + 4] == _EOCD64_LOC_MAGIC:
        loc_disk = _u32(raw, loc + 4)
        e64_off = _u64(raw, loc + 8)
        total_disks = _u32(raw, loc + 16)
        if loc_disk != 0 or total_disks != 1:
            raise ZipError("multi-disk archives are not supported")
        if e64_off + 56 > loc:
            raise ZipError(
                f"zip64 EOCD offset {e64_off} escapes the locator"
            )
        if raw[e64_off : e64_off + 4] != _EOCD64_MAGIC:
            raise ZipError(f"bad zip64 EOCD magic at {e64_off}")
        rec_size = _u64(raw, e64_off + 4)
        if rec_size < 44:
            raise ZipError(f"zip64 EOCD record size {rec_size} < 44")
        d64, cdd64 = _u32(raw, e64_off + 16), _u32(raw, e64_off + 20)
        if d64 or cdd64:
            raise ZipError("multi-disk archives are not supported")
        ent_disk64 = _u64(raw, e64_off + 24)
        ent64 = _u64(raw, e64_off + 32)
        if ent_disk64 != ent64:
            raise ZipError("multi-disk archives are not supported")
        out.update(
            entries=ent64,
            cd_size=_u64(raw, e64_off + 40),
            cd_off=_u64(raw, e64_off + 48),
            zip64=True,
            eocd_off=e64_off,
        )
    elif disk or cd_disk or entries_disk != entries:
        raise ZipError("multi-disk archives are not supported")
    if out["cd_off"] + out["cd_size"] > out["eocd_off"]:
        raise ZipError(
            f"central directory [{out['cd_off']},"
            f" +{out['cd_size']}] escapes the EOCD at"
            f" {out['eocd_off']}"
        )
    return out


# --------------------------------------------- central directory walk


def _zip64_extra(extra: bytes, need: list[str], ent: dict, pos: int):
    """Apply the 0x0001 ZIP64 extra field: 8-byte replacements appear
    in spec order (size, comp_size, header_off) for exactly the
    fields whose 32-bit value saturated."""
    i = 0
    while i + 4 <= len(extra):
        fid, flen = _u16(extra, i), _u16(extra, i + 2)
        body = extra[i + 4 : i + 4 + flen]
        if len(body) != flen:
            raise ZipError(f"extra field at cd entry {pos} truncated")
        if fid == 0x0001:
            j = 0
            for field in need:
                if j + 8 > len(body):
                    raise ZipError(
                        f"zip64 extra too short for {field}"
                        f" at cd entry {pos}"
                    )
                ent[field] = _u64(body, j)
                j += 8
        i += 4 + flen
    for field in need:
        if ent[field] == 0xFFFFFFFF:
            raise ZipError(
                f"{field} saturated but no zip64 extra at entry {pos}"
            )


def zip_members(raw: bytes) -> list[dict]:
    """Walk the central directory into member dicts: one per member —
    {member_idx, name, method, method_name, flag, crc32, comp_size,
    size, header_off, data_off, utf8} — with every entry cross-checked
    against its local file header (magic, name, method; CRC/sizes too
    unless flag bit 3 moved them to the data descriptor). ``data_off``
    is the absolute offset of the member's compressed bytes, so a
    loader can plan ranged GETs without touching the local headers
    again. Encrypted members and unknown methods raise ZipError."""
    eocd = zip_eocd(raw)
    cd_off, cd_end = eocd["cd_off"], eocd["cd_off"] + eocd["cd_size"]
    out: list[dict] = []
    i = cd_off
    while i < cd_end:
        if raw[i : i + 4] != _CDE_MAGIC:
            raise ZipError(f"bad central directory magic at {i}")
        if i + 46 > cd_end:
            raise ZipError(f"central directory entry at {i} truncated")
        flag, method = _u16(raw, i + 8), _u16(raw, i + 10)
        crc = _u32(raw, i + 16)
        comp, size = _u32(raw, i + 20), _u32(raw, i + 24)
        nlen, xlen, clen = (
            _u16(raw, i + 28),
            _u16(raw, i + 30),
            _u16(raw, i + 32),
        )
        disk_start = _u16(raw, i + 34)
        lho = _u32(raw, i + 42)
        end = i + 46 + nlen + xlen + clen
        if end > cd_end:
            raise ZipError(f"central directory entry at {i} truncated")
        name_b = raw[i + 46 : i + 46 + nlen]
        extra = raw[i + 46 + nlen : i + 46 + nlen + xlen]
        if flag & _FLAG_ENCRYPTED:
            raise ZipError(
                f"member {len(out)} is encrypted (flag bit 0):"
                " refusing rather than extracting garbage"
            )
        if method not in _METHOD_NAMES:
            raise ZipError(
                f"unsupported compression method {method}"
                f" on member {len(out)}"
            )
        ent = {
            "member_idx": len(out),
            "flag": flag,
            "method": method,
            "method_name": _METHOD_NAMES[method],
            "crc32": crc,
            "comp_size": comp,
            "size": size,
            "header_off": lho,
            "utf8": bool(flag & _FLAG_UTF8),
        }
        need = [
            f
            for f in ("size", "comp_size", "header_off")
            if ent[f] == 0xFFFFFFFF
        ]
        if disk_start == 0xFFFF:
            raise ZipError("multi-disk archives are not supported")
        if extra or need:
            _zip64_extra(extra, need, ent, i)
        if disk_start not in (0, 0xFFFF) or ent["header_off"] >= cd_off:
            raise ZipError(
                f"member {len(out)} local header offset"
                f" {ent['header_off']} escapes the directory"
            )
        try:
            ent["name"] = name_b.decode(
                "utf-8" if ent["utf8"] else "cp437"
            )
        except UnicodeDecodeError:
            raise ZipError(
                f"member {len(out)} name is not valid"
                f" {'utf-8' if ent['utf8'] else 'cp437'}"
            )
        # Info-ZIP Unicode Path extra (0x7075): a UTF-8 override for
        # a cp437 standard name — honored only when its embedded
        # CRC-32 of the STANDARD name matches (the spec's staleness
        # guard: after a plain rename the extra no longer applies).
        j = 0
        while j + 4 <= len(extra):
            fid, flen = _u16(extra, j), _u16(extra, j + 2)
            body = extra[j + 4 : j + 4 + flen]
            if fid == 0x7075 and len(body) >= 5 and body[0] == 1:
                if _u32(body, 1) == zlib.crc32(name_b):
                    try:
                        ent["name"] = body[5:].decode("utf-8")
                        ent["utf8"] = True
                    except UnicodeDecodeError:
                        raise ZipError(
                            f"member {len(out)} unicode-path extra"
                            " is not valid utf-8"
                        )
            j += 4 + flen
        # Cross-check the local header and derive the data offset.
        lho_i = ent["header_off"]
        if raw[lho_i : lho_i + 4] != _LFH_MAGIC:
            raise ZipError(
                f"bad local header magic at {lho_i}"
                f" (member {len(out)})"
            )
        lflag, lmethod = _u16(raw, lho_i + 6), _u16(raw, lho_i + 8)
        lcrc = _u32(raw, lho_i + 14)
        lcomp, lsize = _u32(raw, lho_i + 18), _u32(raw, lho_i + 22)
        lnlen, lxlen = _u16(raw, lho_i + 26), _u16(raw, lho_i + 28)
        if raw[lho_i + 30 : lho_i + 30 + lnlen] != name_b:
            raise ZipError(
                f"local/central name mismatch for member {len(out)}"
            )
        if lmethod != method or (lflag & 0x0809) != (flag & 0x0809):
            raise ZipError(
                f"local/central method or flag mismatch for"
                f" member {len(out)}"
            )
        if not (flag & _FLAG_DESCRIPTOR):
            if (lcrc, lcomp, lsize) != (
                ent["crc32"],
                ent["comp_size"] & 0xFFFFFFFF,
                ent["size"] & 0xFFFFFFFF,
            ) and (lcrc, lcomp, lsize) != (
                ent["crc32"],
                0xFFFFFFFF,
                0xFFFFFFFF,
            ):
                raise ZipError(
                    f"local/central CRC or size mismatch for"
                    f" member {len(out)}"
                )
        ent["data_off"] = lho_i + 30 + lnlen + lxlen
        if ent["data_off"] + ent["comp_size"] > cd_off:
            raise ZipError(
                f"member {len(out)} data [{ent['data_off']},"
                f" +{ent['comp_size']}] escapes the directory"
                f" start {cd_off}"
            )
        out.append(ent)
        i = end
    if i != cd_end:
        raise ZipError(
            f"central directory walk overran: {i} != {cd_end}"
        )
    if len(out) != eocd["entries"]:
        raise ZipError(
            f"EOCD declares {eocd['entries']} entries,"
            f" directory holds {len(out)}"
        )
    return out


# ------------------------------------------------------------ extract


def _lzma_zip_decompress(comp: bytes, size: int) -> bytes:
    """Method 14: zip's LZMA framing is 2-byte version + 2-byte
    properties length + the LZMA1 properties, then the raw stream.
    Decoded by synthesizing the lzma_alone container header
    (props + 8-byte uncompressed size) for the stdlib decoder —
    public framing only, no private APIs."""
    import lzma

    if len(comp) < 4:
        raise ZipError("lzma member too short for the zip header")
    plen = _u16(comp, 2)
    props = comp[4 : 4 + plen]
    if len(props) != plen or plen < 5:
        raise ZipError(f"lzma properties truncated ({plen} declared)")
    alone = props[:5] + struct.pack("<Q", size) + comp[4 + plen :]
    try:
        return lzma.decompress(alone, format=lzma.FORMAT_ALONE)
    except lzma.LZMAError as e:
        raise ZipError(f"lzma member failed to decode: {e}")


def zip_extract(raw: bytes, member: dict) -> bytes:
    """Extract one member (a dict from zip_members) and verify it:
    exact compressed-size consumption, exact uncompressed size, and
    the CRC-32 from the central directory. When flag bit 3 is set the
    trailing data descriptor is also located and cross-checked (both
    the signed ``PK\\x07\\x08`` and the bare legacy form). Any
    disagreement raises ZipError — a wrong byte never leaves this
    function silently."""
    comp = raw[member["data_off"] : member["data_off"] + member["comp_size"]]
    if len(comp) != member["comp_size"]:
        raise ZipError(
            f"member {member['member_idx']} compressed bytes truncated"
        )
    method = member["method"]
    if method == M_STORED:
        if member["comp_size"] != member["size"]:
            raise ZipError(
                f"stored member {member['member_idx']} sizes disagree"
            )
        data = comp
    elif method == M_DEFLATE:
        d = zlib.decompressobj(-15)
        try:
            data = d.decompress(comp)
            data += d.flush()
        except zlib.error as e:
            raise ZipError(
                f"deflate member {member['member_idx']} failed: {e}"
            )
        if not d.eof or d.unused_data:
            raise ZipError(
                f"deflate member {member['member_idx']} did not"
                " consume exactly its compressed bytes"
            )
    elif method == M_BZIP2:
        import bz2

        try:
            data = bz2.decompress(comp)
        except (OSError, ValueError) as e:
            raise ZipError(
                f"bzip2 member {member['member_idx']} failed: {e}"
            )
    elif method == M_LZMA:
        data = _lzma_zip_decompress(comp, member["size"])
    elif method == M_ZSTD:
        from core_spark.functions.zstd_decode import (
            ZstdDecodeError,
            zstd_decompress,
        )

        try:
            data = zstd_decompress(comp)
        except ZstdDecodeError as e:
            raise ZipError(
                f"zstd member {member['member_idx']} failed: {e}"
            )
    else:  # pragma: no cover - zip_members already refused
        raise ZipError(f"unsupported compression method {method}")
    if len(data) != member["size"]:
        raise ZipError(
            f"member {member['member_idx']} inflated to {len(data)}"
            f" bytes, directory declares {member['size']}"
        )
    crc = zlib.crc32(data)
    if crc != member["crc32"]:
        raise ZipError(
            f"member {member['member_idx']} CRC mismatch:"
            f" 0x{crc:08x} != 0x{member['crc32']:08x}"
        )
    if member["flag"] & _FLAG_DESCRIPTOR:
        dd = member["data_off"] + member["comp_size"]
        if raw[dd : dd + 4] == _DD_MAGIC:
            dd += 4
        # APPNOTE 4.3.9.2: sizes are 8 bytes when ZIP64 is in effect
        # for the member, else 4; accept either width (writers in the
        # wild disagree), but the values must match the directory.
        ok = False
        if dd + 12 <= len(raw):
            ok = (
                _u32(raw, dd),
                _u32(raw, dd + 4),
                _u32(raw, dd + 8),
            ) == (
                member["crc32"],
                member["comp_size"] & 0xFFFFFFFF,
                member["size"] & 0xFFFFFFFF,
            )
        if not ok and dd + 20 <= len(raw):
            ok = (
                _u32(raw, dd),
                _u64(raw, dd + 4),
                _u64(raw, dd + 12),
            ) == (member["crc32"], member["comp_size"], member["size"])
        if not ok:
            raise ZipError(
                f"member {member['member_idx']} data descriptor"
                " disagrees with the central directory"
            )
    return data


def zip_read_member(raw: bytes, name: str) -> bytes:
    """Convenience: extract the named member or raise ZipError."""
    for m in zip_members(raw):
        if m["name"] == name:
            return zip_extract(raw, m)
    raise ZipError(f"no member named {name!r}")


# ------------------------------------------------------------ fixture


def build_zip_bundle_fixture(text: str, digest: str) -> bytes:
    """Deterministic ZIP bundle for q_bundle_zip: `2 + digest%3`
    STORED sample members ``s<i:04d>.txt`` (the q_bundle_tar 8-word
    wrapping slices, so the oracle reuses that proven reconstruction),
    then ONE DEFLATED ``body.txt`` holding the whole document, with
    the archive comment set to the digest. The layout FORM rotates on
    md5 nibble 3 (`digest[2]` % 4): plain / data-descriptor / forced
    ZIP64 / descriptor+ZIP64 — each changes the byte layout by a
    CONSTANT per-member amount (local header 30+name+{0|20} zip64
    extra; post-data descriptor {0|16|24}), so a SQL oracle recomputes
    every stored member's absolute data offset from the APPNOTE
    arithmetic alone and a wrong walk slices garbage and fails the
    content hash."""
    words = text.split(" ")
    nsamp = 2 + int(digest[0:2], 16) % 3
    form = int(digest[2], 16) % 4
    entries: list[tuple[str, bytes]] = []
    methods: list[int] = []
    for i in range(nsamp):
        chunk = [words[(i * 8 + k) % len(words)] for k in range(8)]
        entries.append((f"s{i:04d}.txt", " ".join(chunk).encode()))
        methods.append(M_STORED)
    entries.append(("body.txt", text.encode("utf-8")))
    methods.append(M_DEFLATE)
    return write_zip(
        entries,
        methods=methods,
        data_descriptor=form % 2 == 1,
        force_zip64=form >= 2,
        comment=digest.encode("ascii"),
    )


# ------------------------------------------------------------- writer


def write_zip(
    entries: list[tuple[str, bytes]],
    *,
    method: int = M_DEFLATE,
    methods: list[int] | None = None,
    data_descriptor: bool = False,
    comment: bytes = b"",
    force_zip64: bool = False,
    level: int = 6,
    unicode_path_extra: bool = False,
) -> bytes:
    """From-spec ZIP writer for fixtures and sinks: local headers,
    optional data descriptors, central directory, EOCD (+ ZIP64
    record/locator when forced or when any field saturates). Names
    encode UTF-8 with flag bit 11 when non-ASCII. The walker above is
    pinned against the stdlib ``zipfile`` in BOTH directions in
    tests; this writer gives fixtures the shapes stdlib won't emit
    (descriptors on stored members, forced ZIP64, method 93)."""
    if len(comment) > _MAX_COMMENT:
        raise ZipError("comment exceeds the 64 KiB field")
    per = methods if methods is not None else [method] * len(entries)
    if len(per) != len(entries):
        raise ZipError("methods list length mismatch")
    body = bytearray()
    central = bytearray()
    for idx, ((name, data), m) in enumerate(zip(entries, per)):
        name_b = name.encode("utf-8")
        flag = 0
        path_extra = b""
        if any(b >= 0x80 for b in name_b):
            if unicode_path_extra:
                # the Info-ZIP shape: cp437(-lossy) standard name +
                # 0x7075 UTF-8 override keyed by the standard name's
                # CRC-32 (flag bit 11 stays clear)
                name_b = name.encode("cp437", errors="replace")
                pe_body = b"\x01" + struct.pack(
                    "<I", zlib.crc32(name_b)
                ) + name.encode("utf-8")
                path_extra = struct.pack(
                    "<HH", 0x7075, len(pe_body)
                ) + pe_body
            else:
                flag |= _FLAG_UTF8
        if data_descriptor:
            flag |= _FLAG_DESCRIPTOR
        crc = zlib.crc32(data)
        if m == M_STORED:
            comp = data
        elif m == M_DEFLATE:
            c = zlib.compressobj(level, zlib.DEFLATED, -15)
            comp = c.compress(data) + c.flush()
        elif m == M_BZIP2:
            import bz2

            comp = bz2.compress(data)
        elif m == M_LZMA:
            import lzma

            filt = [{"id": lzma.FILTER_LZMA1, "preset": 6}]
            alone = lzma.compress(data, format=lzma.FORMAT_ALONE, filters=filt)
            # alone = 5 props + 8 size + raw stream → zip framing
            comp = struct.pack("<HH", 0x0914, 5) + alone[:5] + alone[13:]
        elif m == M_ZSTD:
            from core_spark.functions.zstd_encode import zstd_compress

            comp = zstd_compress(data)
        else:
            raise ZipError(f"writer does not support method {m}")
        lho = len(body)
        zip64 = force_zip64 or len(data) >= 0xFFFFFFFF or lho >= 0xFFFFFFFF
        if zip64:
            extra = struct.pack(
                "<HHQQ", 0x0001, 16, len(data), len(comp)
            )
            lsize = lcomp = 0xFFFFFFFF
        else:
            extra = b""
            lsize, lcomp = len(data), len(comp)
        extra += path_extra
        body += struct.pack(
            "<4sHHHHHIIIHH",
            _LFH_MAGIC,
            45 if zip64 else 20,
            flag,
            m,
            0,
            0x21,  # fixed DOS time/date: fixtures are deterministic
            0 if data_descriptor else crc,
            0 if data_descriptor and not zip64 else lcomp,
            0 if data_descriptor and not zip64 else lsize,
            len(name_b),
            len(extra),
        )
        body += name_b + extra
        body += comp
        if data_descriptor:
            # 8-byte sizes when the member is ZIP64 (APPNOTE 4.3.9.2)
            if zip64:
                body += _DD_MAGIC + struct.pack(
                    "<IQQ", crc, len(comp), len(data)
                )
            else:
                body += _DD_MAGIC + struct.pack(
                    "<III", crc, len(comp), len(data)
                )
        cextra = path_extra
        csize, ccomp, clho = len(data), len(comp), lho
        if zip64:
            cextra = struct.pack(
                "<HHQQQ", 0x0001, 24, len(data), len(comp), lho
            ) + path_extra
            csize = ccomp = clho = 0xFFFFFFFF
        central += struct.pack(
            "<4sHHHHHHIIIHHHHHII",
            _CDE_MAGIC,
            45,
            45 if zip64 else 20,
            flag,
            m,
            0,
            0x21,
            crc,
            ccomp,
            csize,
            len(name_b),
            len(cextra),
            0,
            0,
            0,
            0,
            clho,
        )
        central += name_b + cextra
    cd_off = len(body)
    out = body + central
    n = len(entries)
    need64 = (
        force_zip64
        or n >= 0xFFFF
        or cd_off >= 0xFFFFFFFF
        or len(central) >= 0xFFFFFFFF
    )
    if need64:
        e64 = len(out)
        out += struct.pack(
            "<4sQHHIIQQQQ",
            _EOCD64_MAGIC,
            44,
            45,
            45,
            0,
            0,
            n,
            n,
            len(central),
            cd_off,
        )
        out += struct.pack("<4sIQI", _EOCD64_LOC_MAGIC, 0, e64, 1)
    out += struct.pack(
        "<4sHHHHIIH",
        _EOCD_MAGIC,
        0,
        0,
        min(n, 0xFFFF),
        min(n, 0xFFFF),
        min(len(central), 0xFFFFFFFF),
        min(cd_off, 0xFFFFFFFF),
        len(comment),
    )
    out += comment
    return bytes(out)
