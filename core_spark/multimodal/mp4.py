"""MP4 / ISO-BMFF container metadata — the video sibling of wav.py's
`mp3_meta`: a box walk yielding the fields a video-curation pipeline
gates on (duration, track dimensions, codec fourcc, brand) WITHOUT
decoding any frame. Structure per the public ISO/IEC 14496-12 spec:

- box = u32 size + 4-char type; size==1 -> u64 largesize follows;
  size==0 -> box extends to the end of its enclosure.
- `ftyp` carries the major brand; `moov` is the metadata container:
  `mvhd` (movie timescale + duration), per-`trak` `tkhd` (16.16
  fixed-point width/height), `mdia/hdlr` (handler: 'vide'/'soun'),
  `mdia/minf/stbl/stsd` (sample-entry codec fourcc, e.g. avc1/hvc1/
  mp4a).

Frame decode (H.264/HEVC/AAC) stays behind the columns.py stub
discipline naming the real library (pyav); the walk here is complete
for curation gates — it is what lets `examples/media_pipeline.py`
route an mp4 corpus through its duration/dimension gates exactly as
the MP3 header walk does for audio.

Corrupt-input discipline (the codec-suite rule, property-fuzzed in
tests): any malformed size/offset raises a named ValueError — never a
hang, never a giant allocation, never fabricated fields.

Reference parity: gazette/core moves opaque serializations only
(message/interfaces.go:121-124); container parsing happens in
executor-side Arrow kernels, never in the engine.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts"}
# A sane box is at least its own header; caps below guard against
# corrupt sizes demanding absurd recursion or allocation.
_MAX_DEPTH = 8


class Mp4Error(ValueError):
    """Named parse failure: corrupt or non-BMFF input."""


def _boxes(raw: memoryview, start: int, end: int, depth: int = 0):
    """Yield (type, body_start, body_end) for each box in [start,
    end) — bounds-checked so corrupt sizes raise instead of scanning
    past the buffer or looping forever."""
    if depth > _MAX_DEPTH:
        raise Mp4Error("box nesting exceeds ISO-BMFF sanity depth")
    off = start
    while off < end:
        if off + 8 > end:
            raise Mp4Error(f"truncated box header at {off}")
        size = struct.unpack_from(">I", raw, off)[0]
        btype = bytes(raw[off + 4 : off + 8])
        body = off + 8
        if size == 1:
            if off + 16 > end:
                raise Mp4Error(f"truncated largesize at {off}")
            size = struct.unpack_from(">Q", raw, off + 8)[0]
            body = off + 16
        elif size == 0:
            size = end - off  # extends to the end of the enclosure
        if size < body - off or off + size > end:
            raise Mp4Error(
                f"box {btype!r} size {size} escapes [{off}, {end})"
            )
        yield btype, body, off + size
        off += size


def _full_box(raw: memoryview, start: int, end: int) -> tuple[int, int]:
    """FullBox header: (version, body offset past version+flags)."""
    if start + 4 > end:
        raise Mp4Error("truncated FullBox header")
    return raw[start], start + 4


def _fixed_16_16(raw: memoryview, off: int) -> int:
    return struct.unpack_from(">I", raw, off)[0] >> 16


def _parse_mvhd(
    raw: memoryview, start: int, end: int
) -> tuple[int, int | None]:
    v, off = _full_box(raw, start, end)
    if v == 1:
        if off + 28 > end:
            raise Mp4Error("truncated mvhd v1")
        timescale = struct.unpack_from(">I", raw, off + 16)[0]
        duration = struct.unpack_from(">Q", raw, off + 20)[0]
        unknown = duration == 0xFFFFFFFFFFFFFFFF
    else:
        if off + 16 > end:
            raise Mp4Error("truncated mvhd v0")
        timescale = struct.unpack_from(">I", raw, off + 8)[0]
        duration = struct.unpack_from(">I", raw, off + 12)[0]
        unknown = duration == 0xFFFFFFFF
    if timescale == 0:
        raise Mp4Error("mvhd timescale 0")
    # All-ones duration is ISO 14496-12's "unknown" sentinel.
    return timescale, (None if unknown else duration)


def _parse_tkhd(raw: memoryview, start: int, end: int) -> tuple[int, int]:
    v, off = _full_box(raw, start, end)
    # v0: creation+modification+track_ID+reserved+duration = 20;
    # v1 widens creation/modification/duration to u64 -> 32. Then
    # reserved u32[2], layer/alt-group/volume/reserved i16[4],
    # matrix[36]; width/height sit at the tail.
    tail = off + (20 if v == 0 else 32) + 8 + 2 + 2 + 2 + 2 + 36
    if tail + 8 > end:
        raise Mp4Error("truncated tkhd")
    return _fixed_16_16(raw, tail), _fixed_16_16(raw, tail + 4)


def _parse_hdlr(raw: memoryview, start: int, end: int) -> bytes:
    _v, off = _full_box(raw, start, end)
    if off + 8 > end:
        raise Mp4Error("truncated hdlr")
    return bytes(raw[off + 4 : off + 8])


def _parse_stsd_fourcc(raw: memoryview, start: int, end: int) -> str | None:
    _v, off = _full_box(raw, start, end)
    if off + 4 > end:
        raise Mp4Error("truncated stsd")
    n = struct.unpack_from(">I", raw, off)[0]
    if n == 0:
        return None
    if off + 12 > end:
        raise Mp4Error("truncated stsd entry")
    return bytes(raw[off + 8 : off + 12]).decode("latin-1")


def mp4_meta(raw: bytes) -> dict:
    """Walk an ISO-BMFF stream -> metadata dict: {brand, timescale,
    duration_ms, n_tracks, width, height, video_codec, audio_codec}.
    width/height/video_codec come from the first video ('vide')
    track; audio_codec from the first 'soun' track; either may be
    None when the movie lacks that modality. has_video/has_audio
    report handler presence even when the track's tkhd/stsd are
    absent; duration_ms is None when the container declares it
    unknown (all-ones sentinel, or a fragmented movie's mvhd 0 +
    mvex)."""
    mv = memoryview(raw)
    brand = None
    timescale = duration = None
    n_tracks = 0
    width = height = None
    video_codec = audio_codec = None
    saw_moov = False
    saw_mvex = False
    has_video = has_audio = False

    def walk_trak(body: int, bend: int) -> None:
        nonlocal width, height, video_codec, audio_codec
        nonlocal has_video, has_audio
        handler = None
        dims = None
        fourcc = None

        def walk(b0: int, b1: int, depth: int) -> None:
            nonlocal handler, dims, fourcc
            for t, s, e in _boxes(mv, b0, b1, depth):
                if t == b"tkhd":
                    w, h = _parse_tkhd(mv, s, e)
                    if dims is None:
                        dims = (w, h)
                elif t == b"hdlr":
                    handler = _parse_hdlr(mv, s, e)
                elif t == b"stsd":
                    fc = _parse_stsd_fourcc(mv, s, e)
                    if fourcc is None:
                        fourcc = fc
                elif t in _CONTAINERS:
                    walk(s, e, depth + 1)

        walk(body, bend, 2)
        if handler == b"vide":
            has_video = True
            if video_codec is None:
                video_codec = fourcc
            if width is None and dims is not None:
                width, height = dims
        elif handler == b"soun":
            has_audio = True
            if audio_codec is None:
                audio_codec = fourcc

    for btype, body, bend in _boxes(mv, 0, len(raw)):
        if btype == b"ftyp":
            if body + 4 > bend:
                raise Mp4Error("truncated ftyp")
            brand = bytes(mv[body : body + 4]).decode("latin-1")
        elif btype == b"moov":
            saw_moov = True
            for t, s, e in _boxes(mv, body, bend, 1):
                if t == b"mvhd":
                    timescale, duration = _parse_mvhd(mv, s, e)
                elif t == b"trak":
                    n_tracks += 1
                    walk_trak(s, e)
                elif t == b"mvex":
                    saw_mvex = True
    if brand is None and not saw_moov:
        raise Mp4Error("no ftyp or moov box: not ISO-BMFF")
    if timescale is None:
        raise Mp4Error("moov without mvhd")
    # Fragmented MP4 (DASH/streaming packaging): mvhd carries duration
    # 0 and the real samples live in moof fragments signalled by mvex.
    # Report duration as unknown (None) rather than a false 0 — the
    # media pipeline's gates treat NULL as "can't judge", the same
    # honest-NULL convention as kept_no_energy.
    if duration == 0 and saw_mvex:
        duration = None
    return {
        "brand": brand,
        "timescale": timescale,
        "duration_ms": (
            None if duration is None else duration * 1000 // timescale
        ),
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
        "video_codec": video_codec,
        "audio_codec": audio_codec,
        "has_video": has_video,
        "has_audio": has_audio,
    }


# ----------------------------------------------------- sample tables


def _parse_mdhd_timescale(raw: memoryview, start: int, end: int) -> int:
    v, off = _full_box(raw, start, end)
    pos = off + (16 if v == 1 else 8)
    if pos + 4 > end:
        raise Mp4Error("truncated mdhd")
    ts = struct.unpack_from(">I", raw, pos)[0]
    if ts == 0:
        raise Mp4Error("mdhd timescale 0")
    return ts


def _entry_count(raw: memoryview, off: int, end: int, width: int) -> int:
    """Read a sample-table entry count and verify the declared
    entries actually fit inside the box — a corrupt count can demand
    at most O(box) work, never a giant allocation."""
    if off + 4 > end:
        raise Mp4Error("truncated sample-table count")
    n = struct.unpack_from(">I", raw, off)[0]
    if off + 4 + width * n > end:
        raise Mp4Error(
            f"sample table declares {n} entries beyond its box"
        )
    return n


def _parse_stts(raw: memoryview, s: int, e: int) -> list[tuple[int, int]]:
    _v, off = _full_box(raw, s, e)
    n = _entry_count(raw, off, e, 8)
    return [
        struct.unpack_from(">II", raw, off + 4 + 8 * i) for i in range(n)
    ]


def _parse_u32_table(raw: memoryview, s: int, e: int) -> list[int]:
    _v, off = _full_box(raw, s, e)
    n = _entry_count(raw, off, e, 4)
    return list(struct.unpack_from(f">{n}I", raw, off + 4)) if n else []


def _parse_stsz(raw: memoryview, s: int, e: int) -> list[int]:
    _v, off = _full_box(raw, s, e)
    if off + 8 > e:
        raise Mp4Error("truncated stsz")
    uniform, n = struct.unpack_from(">II", raw, off)
    if uniform:
        if n > (e - s) * 4096:  # still bound fabricated counts
            raise Mp4Error("stsz uniform count implausible")
        return [uniform] * n
    if off + 8 + 4 * n > e:
        raise Mp4Error(f"stsz declares {n} sizes beyond its box")
    return list(struct.unpack_from(f">{n}I", raw, off + 8)) if n else []


def _parse_stsc(
    raw: memoryview, s: int, e: int
) -> list[tuple[int, int, int]]:
    _v, off = _full_box(raw, s, e)
    n = _entry_count(raw, off, e, 12)
    return [
        struct.unpack_from(">III", raw, off + 4 + 12 * i)
        for i in range(n)
    ]


def _parse_co(raw: memoryview, s: int, e: int, wide: bool) -> list[int]:
    _v, off = _full_box(raw, s, e)
    width = 8 if wide else 4
    n = _entry_count(raw, off, e, width)
    fmt = f">{n}Q" if wide else f">{n}I"
    return list(struct.unpack_from(fmt, raw, off + 4)) if n else []


def mp4_keyframes(raw: bytes) -> list[dict]:
    """Keyframe fetch plan for the first video track: one dict per
    sync sample — {sample_idx (0-based), t_ms, off (absolute byte
    offset of the sample in the file), size, chunk_off (its chunk's
    base)}. This is the 100 TB video-curation move the sample tables
    exist for: decide WHICH byte ranges to fetch (ranged GETs against
    object storage) without touching a single frame — stts gives each
    sample's timestamp, stss marks the sync samples, stsc/stco place
    samples in chunks, stsz sizes them. A movie without sample tables
    (fragmented, audio-only, metadata-only) yields [] — nothing to
    plan — while corrupt tables raise the named Mp4Error.

    Reference parity: the engine moves opaque serializations only
    (message/interfaces.go:121-124); planning which bytes to fetch
    from a container is executor-side kernel work."""
    mv = memoryview(raw)
    tables: dict[bytes, tuple[int, int]] = {}
    media_ts = None
    found = False

    for btype, body, bend in _boxes(mv, 0, len(raw)):
        if btype != b"moov" or found:
            continue
        for t, s, e in _boxes(mv, body, bend, 1):
            if t != b"trak" or found:
                continue
            cur: dict[bytes, tuple[int, int]] = {}
            handler = None
            ts = None

            def walk(b0: int, b1: int, depth: int) -> None:
                nonlocal handler, ts
                for tt, ss, ee in _boxes(mv, b0, b1, depth):
                    if tt == b"hdlr":
                        handler = _parse_hdlr(mv, ss, ee)
                    elif tt == b"mdhd":
                        ts = _parse_mdhd_timescale(mv, ss, ee)
                    elif tt in (
                        b"stts", b"stss", b"stsz", b"stsc", b"stco",
                        b"co64",
                    ):
                        cur[tt] = (ss, ee)
                    elif tt in _CONTAINERS:
                        walk(ss, ee, depth + 1)

            walk(s, e, 2)
            if handler == b"vide":
                tables, media_ts, found = cur, ts, True

    if not found or media_ts is None:
        return []
    needed = (b"stts", b"stsz", b"stsc")
    if any(k not in tables for k in needed) or (
        b"stco" not in tables and b"co64" not in tables
    ):
        return []  # valid but sample-less (e.g. fragmented) movie

    stts = _parse_stts(mv, *tables[b"stts"])
    sizes = _parse_stsz(mv, *tables[b"stsz"])
    stsc = _parse_stsc(mv, *tables[b"stsc"])
    offsets = (
        _parse_co(mv, *tables[b"co64"], wide=True)
        if b"co64" in tables
        else _parse_co(mv, *tables[b"stco"], wide=False)
    )
    n = len(sizes)
    if sum(c for c, _d in stts) != n:
        raise Mp4Error("stts/stsz sample count mismatch")
    # absent stss means every sample is a sync sample (ISO 14496-12)
    sync = (
        set(_parse_u32_table(mv, *tables[b"stss"]))
        if b"stss" in tables
        else None
    )

    # per-sample start times from the stts run-lengths
    t_ticks = []
    t = 0
    for count, delta in stts:
        for _ in range(count):
            t_ticks.append(t)
            t += delta

    # expand stsc runs over the stco chunk list; the last run extends
    # to the final chunk, and a table that strands samples is corrupt
    plan: list[dict] = []
    si = 0
    n_chunks = len(offsets)
    for ei, (first, per_chunk, _desc) in enumerate(stsc):
        last = (
            stsc[ei + 1][0] - 1 if ei + 1 < len(stsc) else n_chunks
        )
        if first < 1 or last > n_chunks:
            raise Mp4Error("stsc chunk range escapes stco")
        for chunk in range(first, last + 1):
            base = offsets[chunk - 1]
            within = 0
            for _ in range(per_chunk):
                if si >= n:
                    break
                if sync is None or (si + 1) in sync:
                    plan.append(
                        {
                            "sample_idx": si,
                            "t_ms": t_ticks[si] * 1000 // media_ts,
                            "off": base + within,
                            "size": sizes[si],
                            "chunk_off": base,
                        }
                    )
                within += sizes[si]
                si += 1
    if si < n:
        raise Mp4Error("sample-to-chunk table strands samples")
    return plan


# ----------------------------------------------- movie fragments (fMP4)


def _boxes4(raw: memoryview, start: int, end: int, depth: int = 0):
    """Like _boxes but also yields the box's own start offset —
    fragment walking needs it because default-base-is-moof anchors
    sample data to the enclosing moof's first byte."""
    if depth > _MAX_DEPTH:
        raise Mp4Error("box nesting exceeds ISO-BMFF sanity depth")
    off = start
    while off < end:
        if off + 8 > end:
            raise Mp4Error(f"truncated box header at {off}")
        size = struct.unpack_from(">I", raw, off)[0]
        btype = bytes(raw[off + 4 : off + 8])
        body = off + 8
        if size == 1:
            if off + 16 > end:
                raise Mp4Error(f"truncated largesize at {off}")
            size = struct.unpack_from(">Q", raw, off + 8)[0]
            body = off + 16
        elif size == 0:
            size = end - off
        if size < body - off or off + size > end:
            raise Mp4Error(
                f"box {btype!r} size {size} escapes [{off}, {end})"
            )
        yield btype, off, body, off + size
        off += size


def _flags_box(raw: memoryview, start: int, end: int) -> tuple[int, int, int]:
    """FullBox header returning (version, 24-bit flags, body offset) —
    tfhd/trun semantics live in the flag bits, not just the version."""
    if start + 4 > end:
        raise Mp4Error("truncated FullBox header")
    flags = (raw[start + 1] << 16) | (raw[start + 2] << 8) | raw[start + 3]
    return raw[start], flags, start + 4


_NON_SYNC_BIT = 0x00010000  # sample_is_non_sync_sample (14496-12 8.8.3)


def _parse_trex(
    raw: memoryview, start: int, end: int
) -> tuple[int, int, int, int]:
    _v, off = _full_box(raw, start, end)
    if off + 20 > end:
        raise Mp4Error("truncated trex")
    track_id, _desc, dur, size, flags = struct.unpack_from(
        ">IIIII", raw, off
    )
    return track_id, dur, size, flags


def _parse_tkhd_track_id(raw: memoryview, start: int, end: int) -> int:
    v, off = _full_box(raw, start, end)
    pos = off + (16 if v == 1 else 8)
    if pos + 4 > end:
        raise Mp4Error("truncated tkhd track_ID")
    return struct.unpack_from(">I", raw, pos)[0]


def _first_video_track_and_trex(
    mv: memoryview, n: int
) -> tuple[int | None, int | None, dict[int, tuple[int, int, int]]]:
    """moov prelude shared by the two fragment walks: the first
    video track's (track_id, media timescale) plus the mvex/trex
    defaults {track_id: (dur, size, flags)}. One definition so the
    track-selection tie-break and container recursion can't drift
    between the keyframe and duration walks (they had already
    become byte-identical twins)."""
    video_track = None
    media_ts = None
    trex: dict[int, tuple[int, int, int]] = {}
    for btype, _bs, body, bend in _boxes4(mv, 0, n):
        if btype != b"moov":
            continue
        for t, _s0, s, e in _boxes4(mv, body, bend, 1):
            if t == b"trak":
                track_id = handler = ts = None

                def walk(b0: int, b1: int, depth: int) -> None:
                    nonlocal track_id, handler, ts
                    for tt, _t0, ss, ee in _boxes4(mv, b0, b1, depth):
                        if tt == b"tkhd":
                            track_id = _parse_tkhd_track_id(mv, ss, ee)
                        elif tt == b"hdlr":
                            handler = _parse_hdlr(mv, ss, ee)
                        elif tt == b"mdhd":
                            ts = _parse_mdhd_timescale(mv, ss, ee)
                        elif tt in _CONTAINERS:
                            walk(ss, ee, depth + 1)

                walk(s, e, 2)
                if handler == b"vide" and video_track is None:
                    video_track, media_ts = track_id, ts
            elif t == b"mvex":
                for tt, _t0, ss, ee in _boxes4(mv, s, e, 2):
                    if tt == b"trex":
                        tid, ddur, dsize, dflags = _parse_trex(mv, ss, ee)
                        trex[tid] = (ddur, dsize, dflags)
    return video_track, media_ts, trex


def mp4_fragment_keyframes(raw: bytes) -> list[dict]:
    """Keyframe fetch plan for a FRAGMENTED movie (the CMAF/DASH
    packaging mp4_keyframes honestly declines): walk every top-level
    `moof` — mfhd sequence, per-traf tfhd (defaults +
    default-base-is-moof), tfdt (base decode time), trun (data
    offset, per-sample sizes/durations/flags) — and emit one dict per
    SYNC sample of the first video track: {frag_seq, sample_idx
    (global, 0-based), t_ms, off (absolute file offset), size}.
    Streaming-packaged video is the dominant shape of a real video
    corpus, and its fetch planning is strictly harder than the stbl
    walk: sample placement is relative to each fragment, so the plan
    must carry the moof positions through. Sync detection follows the
    flag cascade of 14496-12 8.8.8: per-sample flags, else trun
    first-sample-flags (sample 0), else tfhd default, else trex
    default. A movie with no moof yields []; corrupt tables, runs
    escaping their box, plans pointing outside the file, or samples
    whose duration/size/flags are underivable raise the named
    Mp4Error. Reference parity: the engine moves opaque
    serializations only (message/interfaces.go:121-124); byte-range
    planning is executor-side kernel work."""
    mv = memoryview(raw)
    video_track, media_ts, trex = _first_video_track_and_trex(
        mv, len(raw)
    )
    if video_track is None or media_ts is None:
        return []

    plan: list[dict] = []
    sample_idx = 0
    decode_time = 0  # running track time when tfdt is absent
    for btype, box_start, body, bend in _boxes4(mv, 0, len(raw)):
        if btype != b"moof":
            continue
        seq = None
        prev_traf_end = None
        boxes = list(_boxes4(mv, body, bend, 1))
        for t, _ts0, s, e in boxes:
            if t == b"mfhd":
                _v, off = _full_box(mv, s, e)
                if off + 4 > e:
                    raise Mp4Error("truncated mfhd")
                seq = struct.unpack_from(">I", mv, off)[0]
                break
        if seq is None:
            raise Mp4Error("moof without mfhd")
        for t, _ts0, s, e in boxes:
            if t != b"traf":
                continue
            # ---- tfhd
            tfhd = None
            tfdt_time = None
            truns = []
            for tt, _tt0, ss, ee in _boxes4(mv, s, e, 2):
                if tt == b"tfhd":
                    v_fl = _flags_box(mv, ss, ee)
                    _v, flags, off = v_fl
                    if off + 4 > ee:
                        raise Mp4Error("truncated tfhd")
                    tid = struct.unpack_from(">I", mv, off)[0]
                    off += 4
                    base = None
                    if flags & 0x000001:  # base-data-offset
                        if off + 8 > ee:
                            raise Mp4Error("truncated tfhd base offset")
                        base = struct.unpack_from(">Q", mv, off)[0]
                        off += 8
                    if flags & 0x000002:  # sample-description-index
                        off += 4
                    d_dur = d_size = d_flags = None
                    if flags & 0x000008:
                        if off + 4 > ee:
                            raise Mp4Error("truncated tfhd defaults")
                        d_dur = struct.unpack_from(">I", mv, off)[0]
                        off += 4
                    if flags & 0x000010:
                        if off + 4 > ee:
                            raise Mp4Error("truncated tfhd defaults")
                        d_size = struct.unpack_from(">I", mv, off)[0]
                        off += 4
                    if flags & 0x000020:
                        if off + 4 > ee:
                            raise Mp4Error("truncated tfhd defaults")
                        d_flags = struct.unpack_from(">I", mv, off)[0]
                        off += 4
                    tfhd = {
                        "track": tid,
                        "base": base,
                        "base_is_moof": bool(flags & 0x020000),
                        "dur": d_dur,
                        "size": d_size,
                        "flags": d_flags,
                    }
                elif tt == b"tfdt":
                    v, _fl, off = _flags_box(mv, ss, ee)
                    w = 8 if v == 1 else 4
                    if off + w > ee:
                        raise Mp4Error("truncated tfdt")
                    tfdt_time = struct.unpack_from(
                        ">Q" if v == 1 else ">I", mv, off
                    )[0]
                elif tt == b"trun":
                    truns.append((ss, ee))
            if tfhd is None:
                raise Mp4Error("traf without tfhd")
            is_video = tfhd["track"] == video_track
            tx = trex.get(tfhd["track"], (None, None, None))
            d_dur = tfhd["dur"] if tfhd["dur"] is not None else tx[0]
            d_size = tfhd["size"] if tfhd["size"] is not None else tx[1]
            d_flags = tfhd["flags"] if tfhd["flags"] is not None else tx[2]
            # base-data-offset cascade (8.8.7.1): explicit, else moof
            # start when default-base-is-moof, else first traf anchors
            # at moof start and later trafs continue where the
            # previous one's data ended.
            if tfhd["base"] is not None:
                base = tfhd["base"]
            elif tfhd["base_is_moof"] or prev_traf_end is None:
                base = box_start
            else:
                base = prev_traf_end
            if is_video and tfdt_time is not None:
                decode_time = tfdt_time
            cur = base
            t_ticks = decode_time
            for ss, ee in truns:
                v, flags, off = _flags_box(mv, ss, ee)
                if off + 4 > ee:
                    raise Mp4Error("truncated trun")
                count = struct.unpack_from(">I", mv, off)[0]
                off += 4
                if flags & 0x000001:
                    if off + 4 > ee:
                        raise Mp4Error("truncated trun data offset")
                    cur = base + struct.unpack_from(">i", mv, off)[0]
                    off += 4
                first_flags = None
                if flags & 0x000004:
                    if off + 4 > ee:
                        raise Mp4Error("truncated trun first flags")
                    first_flags = struct.unpack_from(">I", mv, off)[0]
                    off += 4
                per = (
                    (4 if flags & 0x000100 else 0)
                    + (4 if flags & 0x000200 else 0)
                    + (4 if flags & 0x000400 else 0)
                    + (4 if flags & 0x000800 else 0)
                )
                if off + per * count > ee:
                    raise Mp4Error(
                        f"trun declares {count} samples beyond its box"
                    )
                if per == 0 and count > max(1, len(raw)) * 16:
                    # all-defaults trun: entries cost no box bytes, so
                    # bound fabricated counts the way stsz does
                    raise Mp4Error("trun sample count implausible")
                for i in range(count):
                    dur = size = sflags = None
                    if flags & 0x000100:
                        dur = struct.unpack_from(">I", mv, off)[0]
                        off += 4
                    if flags & 0x000200:
                        size = struct.unpack_from(">I", mv, off)[0]
                        off += 4
                    if flags & 0x000400:
                        sflags = struct.unpack_from(">I", mv, off)[0]
                        off += 4
                    if flags & 0x000800:
                        off += 4  # composition offset: not needed
                    if dur is None:
                        dur = d_dur
                    if size is None:
                        size = d_size
                    if sflags is None:
                        sflags = (
                            first_flags
                            if i == 0 and first_flags is not None
                            else d_flags
                        )
                    if dur is None or size is None:
                        raise Mp4Error(
                            "sample duration/size underivable (no trun "
                            "entry, tfhd default, or trex default)"
                        )
                    if is_video:
                        if sflags is None:
                            raise Mp4Error(
                                "sample sync flags underivable"
                            )
                        if not sflags & _NON_SYNC_BIT:
                            if cur + size > len(raw):
                                raise Mp4Error(
                                    "fragment sample escapes the file"
                                )
                            plan.append(
                                {
                                    "frag_seq": seq,
                                    "sample_idx": sample_idx,
                                    "t_ms": t_ticks * 1000 // media_ts,
                                    "off": cur,
                                    "size": size,
                                }
                            )
                        sample_idx += 1
                        t_ticks += dur
                    cur += size
            prev_traf_end = cur
            if is_video:
                decode_time = t_ticks
    return plan


def fmp4_duration_ms(raw: bytes) -> int | None:
    """Exact duration of a FRAGMENTED movie's first video track by
    summing trun sample durations across every moof — the number
    mvhd cannot carry (a streaming-packaged movie declares duration
    0/unknown up front because fragments arrive over time). Lets a
    curation duration gate judge CMAF/DASH content instead of
    passing NULL. Returns None when there is no video track or no
    moof (nothing to sum); corrupt boxes raise Mp4Error. Much
    lighter than the keyframe walk: no offset/size/flag resolution,
    just the duration cascade (trun per-sample → tfhd default →
    trex default)."""
    mv = memoryview(raw)
    video_track, media_ts, trex = _first_video_track_and_trex(
        mv, len(raw)
    )
    trex_dur = {tid: t3[0] for tid, t3 in trex.items()}
    if video_track is None or media_ts is None:
        return None

    total = 0
    saw_moof = False
    for btype, _bs, body, bend in _boxes4(mv, 0, len(raw)):
        if btype != b"moof":
            continue
        saw_moof = True
        for t, _s0, s, e in _boxes4(mv, body, bend, 1):
            if t != b"traf":
                continue
            tid = None
            tfhd_dur = None
            truns = []
            for tt, _t0, ss, ee in _boxes4(mv, s, e, 2):
                if tt == b"tfhd":
                    _v, flags, off = _flags_box(mv, ss, ee)
                    if off + 4 > ee:
                        raise Mp4Error("truncated tfhd")
                    tid = struct.unpack_from(">I", mv, off)[0]
                    off += 4
                    if flags & 0x000001:
                        off += 8
                    if flags & 0x000002:
                        off += 4
                    if flags & 0x000008:
                        if off + 4 > ee:
                            raise Mp4Error("truncated tfhd defaults")
                        tfhd_dur = struct.unpack_from(">I", mv, off)[0]
                elif tt == b"trun":
                    truns.append((ss, ee))
            if tid != video_track:
                continue
            default = (
                tfhd_dur
                if tfhd_dur is not None
                else trex_dur.get(tid)
            )
            for ss, ee in truns:
                _v, flags, off = _flags_box(mv, ss, ee)
                if off + 4 > ee:
                    raise Mp4Error("truncated trun")
                count = struct.unpack_from(">I", mv, off)[0]
                off += 4
                if flags & 0x000001:
                    off += 4
                if flags & 0x000004:
                    off += 4
                per = (
                    (4 if flags & 0x000100 else 0)
                    + (4 if flags & 0x000200 else 0)
                    + (4 if flags & 0x000400 else 0)
                    + (4 if flags & 0x000800 else 0)
                )
                if off + per * count > ee:
                    raise Mp4Error(
                        f"trun declares {count} samples beyond its box"
                    )
                if flags & 0x000100:
                    for _i in range(count):
                        total += struct.unpack_from(">I", mv, off)[0]
                        off += per
                else:
                    if default is None:
                        raise Mp4Error(
                            "sample duration underivable (no trun "
                            "entry, tfhd default, or trex default)"
                        )
                    if per == 0 and count > max(1, len(raw)) * 16:
                        raise Mp4Error("trun sample count implausible")
                    total += count * default
    if not saw_moof:
        return None
    return total * 1000 // media_ts


# ------------------------------------------------------------- builder


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, version: int, body: bytes) -> bytes:
    return _box(btype, struct.pack(">B", version) + b"\x00\x00\x00" + body)


_UNITY_MATRIX = struct.pack(
    ">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
)


def build_mp4(
    duration_ms: int,
    timescale: int = 1000,
    video: tuple[int, int, str] | None = None,
    audio: str | None = None,
    brand: str = "isom",
    mdat: bytes = b"",
    fragmented: bool = False,
    samples: tuple[list[int], int, int] | None = None,
) -> bytes:
    """Deterministic minimal ISO-BMFF: ftyp + moov(mvhd, trak per
    modality) + mdat. `video` = (width, height, fourcc); `audio` =
    fourcc. Sample tables are empty (metadata-only fixture — exactly
    what the walk reads) unless `samples` = (sizes, delta_ticks,
    sync_every) populates the video track's stts/stss/stsc/stsz/stco
    with one chunk holding every sample — sample i's mdat bytes are
    the fill byte (i*7+13)%256 so a fetch plan can be verified by
    slicing; durations use v1 (64-bit) boxes when they overflow u32,
    exercising both parser paths. `fragmented` writes the DASH/
    streaming shape — mvhd duration 0 plus an mvex box — where the
    walk must report duration as unknown, not 0."""
    dur = 0 if fragmented else duration_ms * timescale // 1000
    v = 1 if dur > 0xFFFFFFFF else 0
    if v:
        mvhd_body = (
            struct.pack(">QQIQ", 0, 0, timescale, dur)
            + struct.pack(">ihhq", 0x10000, 0x0100, 0, 0)
            + _UNITY_MATRIX
            + b"\x00" * 24
            + struct.pack(">I", 99)
        )
    else:
        mvhd_body = (
            struct.pack(">IIII", 0, 0, timescale, dur)
            + struct.pack(">ihhq", 0x10000, 0x0100, 0, 0)
            + _UNITY_MATRIX
            + b"\x00" * 24
            + struct.pack(">I", 99)
        )
    def trak(
        idx: int, handler: bytes, fourcc: str, w: int, h: int,
        stco_off: int = 0,
    ) -> bytes:
        if v:
            tkhd_body = (
                struct.pack(">QQIIQ", 0, 0, idx, 0, dur)
                + b"\x00" * 8
                + struct.pack(">hhhh", 0, 0, 0, 0)
                + _UNITY_MATRIX
                + struct.pack(">II", w << 16, h << 16)
            )
        else:
            tkhd_body = (
                struct.pack(">IIIII", 0, 0, idx, 0, dur)
                + b"\x00" * 8
                + struct.pack(">hhhh", 0, 0, 0, 0)
                + _UNITY_MATRIX
                + struct.pack(">II", w << 16, h << 16)
            )
        entry = (
            struct.pack(">I", 16)
            + fourcc.encode("latin-1")
            + b"\x00" * 6
            + struct.pack(">H", 1)
        )
        stsd = _full(b"stsd", 0, struct.pack(">I", 1) + entry)
        stbl_body = stsd
        if handler == b"vide" and samples is not None:
            sizes, delta, sync_every = samples
            n = len(sizes)
            syncs = list(range(1, n + 1, max(1, sync_every)))
            stbl_body += _full(
                b"stts", 0, struct.pack(">III", 1, n, delta)
            )
            stbl_body += _full(
                b"stss",
                0,
                struct.pack(">I", len(syncs))
                + struct.pack(f">{len(syncs)}I", *syncs),
            )
            stbl_body += _full(
                b"stsc", 0, struct.pack(">IIII", 1, 1, n, 1)
            )
            stbl_body += _full(
                b"stsz",
                0,
                struct.pack(">II", 0, n)
                + struct.pack(f">{n}I", *sizes),
            )
            stbl_body += _full(
                b"stco", 0, struct.pack(">II", 1, stco_off)
            )
        stbl = _box(b"stbl", stbl_body)
        minf = _box(b"minf", stbl)
        mdhd = _full(
            b"mdhd",
            0,
            struct.pack(">IIII", 0, 0, timescale, min(dur, 0xFFFFFFFF))
            + struct.pack(">HH", 0x55C4, 0),  # language 'und'
        )
        hdlr = _full(
            b"hdlr",
            0,
            struct.pack(">I", 0) + handler + b"\x00" * 12 + b"\x00",
        )
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", _full(b"tkhd", v, tkhd_body) + mdia)

    def make_moov(stco_off: int) -> bytes:
        traks = []
        if video is not None:
            w, h, fc = video
            traks.append(
                trak(len(traks) + 1, b"vide", fc, w, h, stco_off)
            )
        if audio is not None:
            traks.append(trak(len(traks) + 1, b"soun", audio, 0, 0))
        mvex = _box(b"mvex", b"") if fragmented else b""
        return _box(
            b"moov", _full(b"mvhd", v, mvhd_body) + b"".join(traks) + mvex
        )

    ftyp = _box(
        b"ftyp", brand.encode("latin-1") + struct.pack(">I", 0) + b"isom"
    )
    if samples is not None:
        sizes = samples[0]
        mdat = b"".join(
            bytes([(i * 7 + 13) % 256]) * sz for i, sz in enumerate(sizes)
        )
    # stco needs the absolute mdat body position, which depends on
    # moov's own length — build once with a placeholder, then rebuild
    # with the real offset (the u32 field keeps the length identical).
    mdat_off = len(ftyp) + len(make_moov(0)) + 8
    return ftyp + make_moov(mdat_off) + _box(b"mdat", mdat)


def build_fmp4(
    frag_sizes: list[list[int]],
    delta: int,
    timescale: int = 1000,
    video: tuple[int, int, str] = (640, 360, "avc1"),
    brand: str = "cmfc",
) -> bytes:
    """Deterministic minimal FRAGMENTED ISO-BMFF in the CMAF shape:
    ftyp + moov(mvhd dur 0, video trak with empty stbl, mvex/trex)
    then per fragment moof(mfhd, traf(tfhd default-base-is-moof,
    tfdt v1, trun data-offset + first-sample-flags + per-sample
    sizes)) + mdat actually holding the samples. Each fragment is one
    GOP: its first sample is sync (trun first_sample_flags clears the
    non-sync bit), the rest inherit trex's non-sync default — so the
    keyframe plan is exactly the fragment heads. Sample i's mdat
    bytes are the fill byte (i*7+13)%256 (global i) so a fetch plan
    is verifiable by slicing. Every sample lasts `delta` ticks via
    trex default_sample_duration; tfdt carries the accumulated decode
    time. Layout is closed-form — moof_j = 92 + 4*k_j bytes — so a
    SQL oracle can prefix-sum the exact byte positions."""
    w, h, fourcc = video
    mvhd_body = (
        struct.pack(">IIII", 0, 0, timescale, 0)
        + struct.pack(">ihhq", 0x10000, 0x0100, 0, 0)
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 99)
    )
    tkhd_body = (
        struct.pack(">IIIII", 0, 0, 1, 0, 0)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + _UNITY_MATRIX
        + struct.pack(">II", w << 16, h << 16)
    )
    entry = (
        struct.pack(">I", 16)
        + fourcc.encode("latin-1")
        + b"\x00" * 6
        + struct.pack(">H", 1)
    )
    stsd = _full(b"stsd", 0, struct.pack(">I", 1) + entry)
    # empty sample tables: the legal fragmented-movie stbl
    stbl = _box(b"stbl", stsd)
    minf = _box(b"minf", stbl)
    mdhd = _full(
        b"mdhd",
        0,
        struct.pack(">IIII", 0, 0, timescale, 0)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"\x00"
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", _full(b"tkhd", 0, tkhd_body) + mdia)
    # trex: track 1, desc 1, default duration = delta, size 0,
    # default flags = non-sync (0x010000) — fragment heads override
    # via trun first_sample_flags.
    trex = _full(
        b"trex", 0, struct.pack(">IIIII", 1, 1, delta, 0, _NON_SYNC_BIT)
    )
    moov = _box(b"moov", _full(b"mvhd", 0, mvhd_body) + trak + _box(b"mvex", trex))
    ftyp = _box(
        b"ftyp", brand.encode("latin-1") + struct.pack(">I", 0) + b"isom"
    )
    out = [ftyp, moov]
    g = 0  # global sample index
    t = 0  # decode time in ticks
    for j, sizes in enumerate(frag_sizes):
        k = len(sizes)
        mfhd = _full(b"mfhd", 0, struct.pack(">I", j + 1))
        tfhd = _box(
            b"tfhd",
            struct.pack(">B", 0) + b"\x02\x00\x00" + struct.pack(">I", 1),
        )  # flags 0x020000 default-base-is-moof, track 1
        tfdt = _full(b"tfdt", 1, struct.pack(">Q", t))
        # trun flags: 0x000001 data-offset | 0x000004 first-sample-
        # flags | 0x000200 per-sample size
        trun_body = (
            struct.pack(">I", k)
            + struct.pack(">i", 100 + 4 * k)  # data offset: see below
            + struct.pack(">I", 0x02000000)  # sync: non-sync bit clear
            + struct.pack(f">{k}I", *sizes)
        )
        trun = _box(
            b"trun", struct.pack(">B", 0) + b"\x00\x02\x05" + trun_body
        )
        traf = _box(b"traf", tfhd + tfdt + trun)
        moof = _box(b"moof", mfhd + traf)
        # data offset points at the first mdat payload byte, relative
        # to moof start: len(moof) + 8. Closed form 100 + 4k, pinned
        # here so the oracle's arithmetic can never drift from the
        # real builder.
        assert len(moof) + 8 == 100 + 4 * k, len(moof)
        mdat = b"".join(
            bytes([((g + i) * 7 + 13) % 256]) * sz
            for i, sz in enumerate(sizes)
        )
        out.append(moof)
        out.append(_box(b"mdat", mdat))
        g += k
        t += k * delta
    return b"".join(out)
