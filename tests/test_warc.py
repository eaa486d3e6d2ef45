"""WARC walk kernel (functions/warc.py): fixture round trip with
byte-range pinning (every walked offset sliced and verified), the
full crawl chain, and corrupt-input discipline."""

import hashlib
import random

import pytest

from core_spark.functions.html import build_html_fixture, html_to_text
from core_spark.functions.warc import (
    WarcError, build_warc_fixture, warc_records,
)


def _fixture(text):
    digest = hashlib.md5(text.encode("utf-8")).hexdigest()
    return build_warc_fixture(text, digest), digest


def test_warc_walk_offsets_are_real():
    text = ("the quick brown fox jumps over the lazy dog " * 5).strip()
    raw, digest = _fixture(text)
    recs = warc_records(raw)
    nrec = 2 + int(digest[0:2], 16) % 3
    assert len(recs) == 1 + nrec
    assert recs[0]["rec_type"] == "warcinfo"
    page = build_html_fixture(text, digest).encode("utf-8")
    for i, r in enumerate(recs[1:]):
        assert r["rec_type"] == "response"
        assert r["rec_idx"] == i + 1
        assert (
            r["target_uri"] == f"https://example.com/{digest[:8]}/{i}"
        )
        # the version line really sits at rec_off
        assert raw[r["rec_off"] : r["rec_off"] + 5] == b"WARC/"
        # the block really starts with the HTTP status line
        blk = raw[r["block_off"] : r["block_off"] + r["block_len"]]
        assert blk.startswith(b"HTTP/1.1 200 OK")
        # the payload slice is exactly the HTML page bytes
        pay = raw[
            r["payload_off"] : r["payload_off"] + r["payload_len"]
        ]
        assert pay == page
        # and the chain recovers the document text verbatim
        assert html_to_text(pay.decode("utf-8"))["text"] == text


def test_warc_non_http_block_payload_is_block():
    raw = (
        b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 5\r\n"
        b"\r\nhello\r\n\r\n"
    )
    (r,) = warc_records(raw)
    assert r["payload_off"] == r["block_off"]
    assert raw[r["payload_off"] : r["payload_off"] + 5] == b"hello"


def test_warc_corrupt_inputs_raise_named():
    good, _ = _fixture("some words here")
    # not WARC at all
    with pytest.raises(WarcError):
        warc_records(b"HTTP/1.1 200 OK\r\n\r\n")
    # Content-Length escaping the buffer
    with pytest.raises(WarcError):
        warc_records(good[:-30])
    # missing Content-Length
    with pytest.raises(WarcError):
        warc_records(b"WARC/1.0\r\nWARC-Type: x\r\n\r\nbody")
    # unterminated headers
    with pytest.raises(WarcError):
        warc_records(b"WARC/1.0\r\nWARC-Type: x")
    # empty input: no records, no error
    assert warc_records(b"") == []
    # fuzz: random junk and bit-flips either walk or raise named
    rnd = random.Random(53)
    for _ in range(300):
        b = bytearray(good)
        for _k in range(rnd.randrange(1, 6)):
            b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
        try:
            warc_records(bytes(b))
        except WarcError:
            pass
    for _ in range(300):
        junk = bytes(
            rnd.randrange(256) for _ in range(rnd.randrange(0, 150))
        )
        try:
            warc_records(junk)
        except WarcError:
            pass


def test_warc_gz_members_slice_and_reinflate():
    """.warc.gz discipline: one gzip member per record, member
    offsets slice out of the file and re-inflate independently (the
    Common Crawl index contract), concatenated member data equals
    the plain fixture, bytes are deterministic (mtime pinned), and
    corrupt/truncated/garbage-joined input raises the named error."""
    import gzip
    import hashlib

    from core_spark.functions.warc import (
        WarcError,
        build_warc_fixture,
        build_warc_gz_fixture,
        warc_gz_members,
        warc_records,
    )

    text = "the fast key order sort table scan merge part window"
    dig = hashlib.md5(text.encode()).hexdigest()
    gz = build_warc_gz_fixture(text, dig)
    plain = build_warc_fixture(text, dig)

    members = warc_gz_members(gz)
    assert len(members) == len(warc_records(plain))
    assert b"".join(m["data"] for m in members) == plain
    for m in members:
        sliced = gz[m["member_off"] : m["member_off"] + m["member_len"]]
        assert gzip.decompress(sliced) == m["data"]
        assert len(warc_records(m["data"])) == 1  # one record/member
    assert build_warc_gz_fixture(text, dig) == gz  # deterministic

    for junk in (
        b"\x00\x01",                 # not gzip
        gz[: len(gz) // 2],          # truncated member
        gz + b"garbage",             # trailing non-member bytes
        gz[:10],                     # header-only
    ):
        try:
            warc_gz_members(junk)
            raise AssertionError(f"corrupt gz accepted: {junk[:8]!r}")
        except WarcError:
            pass


def test_revisit_records_walk_and_link():
    """Revisit fixture: revisit records surface refers_to and
    payload_digest; the claimed digest verifies against the original
    payload's sha256 (WARC 1.1 §6.7.2 identical-payload-digest)."""
    import hashlib

    from core_spark.functions.warc import build_warc_revisit_fixture

    text = "alpha beta gamma delta " * 30
    digest = hashlib.md5(text.encode()).hexdigest()
    raw = build_warc_revisit_fixture(text, digest)
    recs = warc_records(raw)
    responses = {r["target_uri"]: r for r in recs if r["rec_type"] == "response"}
    revisits = [r for r in recs if r["rec_type"] == "revisit"]
    nrec = 2 + int(digest[0:2], 16) % 3
    assert len(responses) == nrec
    assert len(revisits) == (nrec + 1) // 2
    for rv in revisits:
        assert rv["target_uri"].endswith("?recheck")
        orig = responses[rv["refers_to"]]
        payload = raw[orig["payload_off"]: orig["payload_off"] + orig["payload_len"]]
        algo, _, claimed = rv["payload_digest"].partition(":")
        assert algo == "sha256"
        assert hashlib.sha256(payload).hexdigest() == claimed
        assert rv["block_len"] == 0  # bodyless pointer: the dedup
    # non-revisit records carry empty linkage fields
    assert all(r["refers_to"] == "" for r in recs if r["rec_type"] != "revisit")
