"""Sniffer/dispatcher pins: every format detects from magic bytes
(never extension), zip-family disambiguation looks inside the
container, unit counts match each format's arithmetic, and unknown
payloads are reported — never guessed into a fake success."""

from __future__ import annotations

import hashlib
import math

import pytest

from core_spark.multimodal.sniff import (
    build_mixed_payload,
    detect_format,
    dispatch_extract,
)


def test_all_formats_detect_and_dispatch():
    seen = {}
    for i in range(240):
        t = " ".join(f"w{i}x{k}" for k in range(5 + i % 43))
        h = hashlib.md5(t.encode()).hexdigest()
        fmt, raw = build_mixed_payload(t, h)
        assert detect_format(raw) == fmt
        n = dispatch_extract(raw, fmt)
        w = len(t.split(" "))
        exp = {
            "pdf": max(1, math.ceil(w / (5 + int(h[0], 16) % 4))),
            "docx": (2 if int(h[3], 16) % 4 == 3 else 1)
            * math.ceil(w / 13),
            "xlsx": w,
            "odt": math.ceil(w / 11),
            "epub": math.ceil(w / 21),
            "rtf": math.ceil(w / 9),
            "eml": 2 if int(h[14], 16) % 4 == 1 else 1,
            "html": math.ceil(w / 20),
        }[fmt]
        assert n == exp, (fmt, n, exp)
        seen[fmt] = seen.get(fmt, 0) + 1
    assert set(seen) == {
        "pdf", "docx", "xlsx", "odt", "epub", "rtf", "eml", "html",
    }


def test_zip_family_disambiguation_by_content():
    from core_spark.functions.mail import build_mbox_fixture
    from core_spark.functions.ziparchive import write_zip

    t = "alpha bravo charlie delta echo"
    h = hashlib.md5(t.encode()).hexdigest()
    assert detect_format(write_zip([("a.txt", b"x")])) == "zip"
    assert detect_format(build_mbox_fixture(t, h)) == "mbox"


def test_feed_detection():
    from core_spark.functions.feeds import build_feed_fixture

    t = "alpha bravo charlie delta echo"
    for i in range(40):
        h = hashlib.md5(f"{t}{i}".encode()).hexdigest()
        raw = build_feed_fixture(f"{t}{i}".replace(" ", "x") or t, h)
        assert detect_format(raw.encode()) == "feed"


def test_unknown_reported_never_guessed():
    for raw in (
        b"\x89PNG\r\n\x1a\n....",
        b"GIF89a....",
        b"PK\x03\x04 truncated zip junk",
        b"plain prose with no structure at all",
        b"",
    ):
        fmt = detect_format(raw)
        assert fmt in ("unknown",), (raw[:10], fmt)
    with pytest.raises(ValueError, match="no extractor"):
        dispatch_extract(b"....", "unknown")


def test_eml_heuristic_requires_header_block():
    good = (
        b"From: a@example.com\nSubject: s\n"
        b"Date: Mon, 02 Jan 2006 15:04:05 GMT\n\nbody\n"
    )
    assert detect_format(good) == "eml"
    # prose with a colon is not a header block
    assert detect_format(b"Note: this is prose\nmore prose\n") == (
        "unknown"
    )


def test_ipynb_and_latex_detection():
    from core_spark.functions.latex import build_latex_fixture
    from core_spark.functions.notebook import build_ipynb_fixture

    t = "alpha bravo charlie delta echo foxtrot golf hotel india"
    h = hashlib.md5(t.encode()).hexdigest()
    nb = build_ipynb_fixture(t, h)
    assert detect_format(nb) == "ipynb"
    assert dispatch_extract(nb, "ipynb") >= 1
    tex = build_latex_fixture(t, h).encode()
    assert detect_format(tex) == "latex"
    assert dispatch_extract(tex, "latex") >= 3
    # latex behind leading comments still detects
    assert detect_format(b"% arXiv header\n\\documentclass{article}\n") == "latex"
    # a random JSON object is NOT a notebook
    assert detect_format(b'{"key": "value"}') == "unknown"
