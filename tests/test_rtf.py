"""RTF extraction pins: the token-grammar semantics real extractors
get wrong (destination skipping, \\uc-scoped fallback swallowing,
code-page escapes, control symbols), form round-trips, and the
magic-check/forgiving-truncation split."""

from __future__ import annotations

import hashlib

import pytest

from core_spark.functions.rtf import (
    RtfError,
    _expected_text,
    build_rtf_fixture,
    rtf_to_text,
)


def test_all_forms_round_trip():
    seen = set()
    for i in range(140):
        t = " ".join(f"w{i}x{k}" for k in range(1 + i % 33))
        h = hashlib.md5(t.encode()).hexdigest()
        seen.add(int(h[13], 16) % 4)
        got = rtf_to_text(build_rtf_fixture(t, h))
        assert got == "".join(c + "\n" for c in _expected_text(t))
    assert seen == {0, 1, 2, 3}


def test_destinations_contribute_no_text():
    assert (
        rtf_to_text(
            "{\\rtf1 {\\fonttbl{\\f0\\froman Times;}}"
            "{\\colortbl;\\red1\\green2\\blue3;}"
            "{\\info{\\author Nobody}}body}"
        )
        == "body"
    )


def test_star_unknown_destination_skipped():
    assert rtf_to_text("{\\rtf1 {\\*\\weirddest junk 123}ok}") == "ok"


def test_unicode_fallback_swallowing():
    assert rtf_to_text("{\\rtf1 \\u8217?x}") == "’x"
    # Word's own shape: the fallback is a hex escape, not '?'
    assert rtf_to_text("{\\rtf1 \\u8217\\'92x}") == "’x"
    # \uc2 swallows two fallback chars
    assert rtf_to_text("{\\rtf1 \\uc2\\u8217??x}") == "’x"
    # negative scalars wrap mod 65536 (the signed-16-bit rule)
    assert rtf_to_text("{\\rtf1 \\u-10179?}") == chr(65536 - 10179)


def test_uc_state_is_group_scoped():
    assert (
        rtf_to_text("{\\rtf1 {\\uc2 \\u65??}\\u66?x}") == "ABx"
    )


def test_codepage_and_control_symbols():
    assert rtf_to_text("{\\rtf1 a\\'e9b}") == "a\xe9b"
    assert rtf_to_text("{\\rtf1 \\{x\\}\\\\}") == "{x}\\"
    assert rtf_to_text("{\\rtf1 a\\~b}") == "a b"
    assert rtf_to_text("{\\rtf1 a\\-b}") == "ab"  # soft hyphen drops


def test_par_line_tab():
    assert rtf_to_text("{\\rtf1 a\\par b\\line c\\tab d}") == (
        "a\nb\nc\td"
    )


def test_raw_newlines_insignificant():
    assert rtf_to_text("{\\rtf1 a\nb\r\nc}") == "abc"


def test_magic_check_and_truncation():
    with pytest.raises(RtfError, match="does not start"):
        rtf_to_text("plain text, no rtf")
    # truncated mid-group: prefix extracted, never a raise
    assert rtf_to_text("{\\rtf1 hello wor") == "hello wor"


def test_bad_hex_escape_replacement_char():
    assert rtf_to_text("{\\rtf1 a\\'zzb}") == "a�b"
