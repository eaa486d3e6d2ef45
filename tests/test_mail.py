"""Email (RFC 5322 + MIME) pins. The stdlib ``email`` package is
the INDEPENDENT implementation here (the zip-walker situation, not
the PDF one): our fixture messages must parse identically under
both parsers, and stdlib-BUILT messages must parse identically
under ours — covering folding, encoded words, multipart nesting,
transfer encodings and body selection."""

from __future__ import annotations

import email
import email.policy
import email.utils
import hashlib
from email.message import EmailMessage

import pytest

from core_spark.functions.mail import (
    MailError,
    build_eml_fixture,
    decode_encoded_words,
    parse_eml,
)


def test_all_forms_round_trip():
    seen = set()
    for i in range(160):
        t = " ".join(f"w{i}x{k}" for k in range(5 + i % 41))
        h = hashlib.md5(t.encode()).hexdigest()
        form = int(h[14], 16) % 4
        seen.add(form)
        m = parse_eml(build_eml_fixture(t, h))
        words = t.split(" ")
        lines = [
            " ".join(words[j : j + 15])
            for j in range(0, len(words), 15)
        ]
        assert m["subject"] == " ".join(words[:5])
        assert m["n_parts"] == (2 if form == 1 else 1)
        assert m["body_source"] == ("html" if form == 3 else "plain")
        assert m["body_text"] == (
            " ".join(lines) if form == 3 else "\n".join(lines)
        )
    assert seen == {0, 1, 2, 3}


def test_fixtures_parse_identically_under_stdlib():
    for i in range(60):
        t = " ".join(f"p{i}q{k}" for k in range(5 + i % 41))
        h = hashlib.md5(t.encode()).hexdigest()
        raw = build_eml_fixture(t, h)
        ours = parse_eml(raw)
        std = email.message_from_bytes(raw, policy=email.policy.default)
        assert std["Subject"] == ours["subject"]
        body = std.get_body(preferencelist=("plain", "html"))
        if body.get_content_type() == "text/plain":
            assert body.get_content().rstrip("\n") == ours["body_text"]
        assert (
            int(
                email.utils.parsedate_to_datetime(
                    std["Date"]
                ).timestamp()
            )
            == ours["date_epoch"]
        )


def test_stdlib_built_message_parses_under_ours():
    msg = EmailMessage()
    msg["From"] = "sender@example.com"
    msg["To"] = "rcpt@example.com"
    msg["Subject"] = "naïve — unicode subject"
    msg["Date"] = "Mon, 02 Jan 2006 15:04:05 GMT"
    msg.set_content("plain body line one\nline two")
    msg.add_attachment(
        b"\x00\x01\x02" * 100,
        maintype="application",
        subtype="octet-stream",
        filename="blob.bin",
    )
    ours = parse_eml(bytes(msg))
    assert ours["subject"] == "naïve — unicode subject"
    assert ours["body_text"] == "plain body line one\nline two"
    assert ours["body_source"] == "plain"
    assert ours["n_parts"] == 2
    assert ours["date_epoch"] == 1136214245


def test_encoded_word_semantics():
    assert decode_encoded_words("=?utf-8?B?aGVsbG8=?=") == "hello"
    assert decode_encoded_words("=?utf-8?Q?a_b?=") == "a b"
    # space BETWEEN encoded words vanishes; elsewhere it stays
    assert (
        decode_encoded_words("=?utf-8?Q?ab?= =?utf-8?Q?cd?=") == "abcd"
    )
    assert decode_encoded_words("x =?utf-8?Q?y?= z") == "x y z"
    # undecodable words stay visible, never vanish
    assert (
        decode_encoded_words("=?utf-8?B?!!notb64!!?=")
        == "=?utf-8?B?!!notb64!!?="
    )


def test_folded_headers_unfold():
    raw = (
        b"From: a@example.com\nTo: one@example.com,\n"
        b"\ttwo@example.com\nSubject: s\n"
        b"Date: Mon, 02 Jan 2006 15:04:05 GMT\n"
        b"Content-Type: text/plain\n\nbody\n"
    )
    m = parse_eml(raw)
    assert m["to_addr"] == "one@example.com, two@example.com"


def test_quoted_printable_soft_breaks():
    raw = (
        b"From: a@example.com\nSubject: s\n"
        b"Date: Mon, 02 Jan 2006 15:04:05 GMT\n"
        b"Content-Type: text/plain\n"
        b"Content-Transfer-Encoding: quoted-printable\n\n"
        b"hel=\nlo=20world\n"
    )
    assert parse_eml(raw)["body_text"] == "hello world"


def test_attachment_never_body_html_fallback():
    raw = (
        b"From: a@example.com\nSubject: s\n"
        b"Date: Mon, 02 Jan 2006 15:04:05 GMT\n"
        b'Content-Type: multipart/mixed; boundary="B"\n\n'
        b"--B\n"
        b"Content-Type: text/plain\n"
        b"Content-Disposition: attachment; "
        b'filename="notes.txt"\n\nATTACHED\n'
        b"--B\nContent-Type: text/html\n\n"
        b"<p>real body</p>\n"
        b"--B--\n"
    )
    m = parse_eml(raw)
    assert m["body_text"] == "real body"
    assert m["body_source"] == "html"


def test_hostile_refusals():
    with pytest.raises(MailError, match="no header/body separator"):
        parse_eml(b"From: a@example.com\nSubject: s")
    with pytest.raises(MailError, match="unterminated multipart"):
        parse_eml(
            b"From: a@e\nSubject: s\n"
            b"Date: Mon, 02 Jan 2006 15:04:05 GMT\n"
            b'Content-Type: multipart/mixed; boundary="B"\n\n'
            b"--B\nContent-Type: text/plain\n\nx\n"
        )
    with pytest.raises(MailError, match="bad base64"):
        parse_eml(
            b"From: a@e\nSubject: s\n"
            b"Date: Mon, 02 Jan 2006 15:04:05 GMT\n"
            b"Content-Type: text/plain\n"
            b"Content-Transfer-Encoding: base64\n\n!!!\n"
        )
    with pytest.raises(MailError, match="unknown transfer encoding"):
        parse_eml(
            b"From: a@e\nSubject: s\n"
            b"Date: Mon, 02 Jan 2006 15:04:05 GMT\n"
            b"Content-Type: text/plain\n"
            b"Content-Transfer-Encoding: uuencode\n\nx\n"
        )
    with pytest.raises(MailError, match="no Date header"):
        parse_eml(b"From: a@e\nSubject: s\n\nbody\n")


# --------------------------------------------------------------- mbox


def test_mbox_round_trip_with_from_quoting():
    import hashlib

    from core_spark.functions.mail import (
        build_mbox_fixture,
        mbox_messages,
    )

    for i in range(60):
        t = " ".join(f"m{i}w{k}" for k in range(3 + i % 37))
        h = hashlib.md5(t.encode()).hexdigest()
        msgs = mbox_messages(build_mbox_fixture(t, h))
        assert len(msgs) == 2 + int(h[0:2], 16) % 3
        for j, msg in enumerate(msgs):
            m = parse_eml(msg)
            # the quoted "From " body line round-trips unquoted
            assert m["body_text"].split("\n")[1].startswith("From ")


def test_mbox_quoting_levels():
    from core_spark.functions.mail import mbox_messages

    raw = (
        b"From a@e Thu Jan  1 00:00:00 1970\n"
        b"From: a@e\nSubject: s\n"
        b"Date: Mon, 02 Jan 2006 15:04:05 GMT\n"
        b"Content-Type: text/plain\n\n"
        b">From level1\n>>From level2\nplain\n"
    )
    (msg,) = mbox_messages(raw)
    body = parse_eml(msg)["body_text"]
    assert body == "From level1\n>From level2\nplain"


def test_mbox_stdlib_cross_pin():
    """Our mbox fixtures parse identically under stdlib mailbox
    semantics: message count and subjects via the email package
    applied to our own split."""
    import hashlib

    from core_spark.functions.mail import (
        build_mbox_fixture,
        mbox_messages,
    )

    t = "alpha bravo charlie delta echo foxtrot golf hotel"
    h = hashlib.md5(t.encode()).hexdigest()
    raw = build_mbox_fixture(t, h)
    for msg in mbox_messages(raw):
        std = email.message_from_bytes(
            msg, policy=email.policy.default
        )
        ours = parse_eml(msg)
        assert std["Subject"] == ours["subject"]
        assert std.get_content().rstrip("\n") == ours["body_text"]


def test_mbox_not_mbox_refuses():
    from core_spark.functions.mail import mbox_messages

    with pytest.raises(MailError, match="does not start"):
        mbox_messages(b"Subject: no envelope\n\nbody\n")
