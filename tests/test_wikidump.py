"""Multistream-bz2 dump walk discipline (functions/wikidump.py)."""

import bz2
import hashlib

import pytest

from core_spark.functions.wikidump import (
    PAGES_PER_STREAM,
    WikidumpError,
    build_wikidump_fixture,
    wikidump_pages,
    wikidump_streams,
)

TEXT = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lam mu nu xi omicron pi rho sigma tau upsilon"
)
DIGEST = hashlib.md5(TEXT.encode()).hexdigest()


def test_stream_offsets_slice_standalone_streams():
    """The index contract: each (off, length) range must inflate
    independently — the ranged-GET property the companion index
    file exists for."""
    raw = build_wikidump_fixture(TEXT, DIGEST)
    streams = wikidump_streams(raw)
    assert sum(s["length"] for s in streams) == len(raw)
    assert streams[0]["off"] == 0
    words = TEXT.split(" ")
    wpp = 6 + int(DIGEST[0], 16) % 5
    npages = (len(words) + wpp - 1) // wpp
    assert len(streams) == (npages + PAGES_PER_STREAM - 1) // PAGES_PER_STREAM
    recovered = []
    for s in streams:
        chunk = raw[s["off"]: s["off"] + s["length"]]
        # standalone inflate must succeed on exactly this slice
        bz2.decompress(chunk)
        recovered += wikidump_pages(chunk)
    assert " ".join(p["text"] for p in recovered) == TEXT
    for i, p in enumerate(recovered):
        assert p["page_id"] == 1000 + i
        assert p["title"] == f"Page {DIGEST[:6]}-{i}"
        assert p["ns"] == 0


def test_corrupt_inputs_raise_named_error():
    raw = build_wikidump_fixture(TEXT, DIGEST)
    for bad in (b"junk bytes", raw[: len(raw) // 2], b"BZh9oops"):
        with pytest.raises(WikidumpError):
            wikidump_streams(bad)
    with pytest.raises(WikidumpError):
        wikidump_pages(b"\x00not xml")
    assert wikidump_streams(b"") == []


def test_partial_pages_skipped_and_decoys_ignored():
    frag = (
        b"<page><title>ok</title><ns>2</ns><id>7</id>"
        b"<revision><text>body</text><sha1>zz</sha1></revision></page>"
        b"<page><title>no id</title></page>"
        b"<page><id>9</id></page>"
        b"<siteinfo>ignored</siteinfo>"
        b"<page><title>bad id</title><id>seven</id></page>"
    )
    pages = wikidump_pages(frag)
    assert pages == [
        {"page_id": 7, "ns": 2, "title": "ok", "text": "body"}
    ]


def test_junk_ns_tolerated_as_zero():
    """ns is metadata, not identity: junk ns must not abort the
    stream parse (review finding r8)."""
    frag = (
        b"<page><title>t</title><ns>junk</ns><id>3</id>"
        b"<revision><text>x</text></revision></page>"
    )
    assert wikidump_pages(frag) == [
        {"page_id": 3, "ns": 0, "title": "t", "text": "x"}
    ]


def test_index_build_is_single_pass_over_each_stream():
    """The splitter feeds the decompressor bounded chunks and discards
    output incrementally (ADVICE r8): splitting many streams must cost
    O(total), not O(streams x total). Guarded behaviorally — offsets
    and lengths must be identical to the per-stream compressed sizes —
    and with a coarse time bound on a many-stream file."""
    import bz2 as _bz2
    import time

    streams = [
        _bz2.compress(("<page><title>t%d</title><id>%d</id>"
                       "<revision><text>x</text></revision></page>"
                       % (i, i)).encode() * 3)
        for i in range(200)
    ]
    blob = b"".join(streams)
    t0 = time.perf_counter()
    idx = wikidump_streams(blob)
    dt = time.perf_counter() - t0
    assert [s["length"] for s in idx] == [len(s) for s in streams]
    offs = [s["off"] for s in idx]
    assert offs == [sum(len(x) for x in streams[:i]) for i in range(200)]
    assert dt < 5.0
