"""RFC 5322 + MIME email parsing (.eml) — mail archives are a
standing slice of real training corpora and crawl datasets, and the
MIME grammar (folding, encoded words, multipart nesting, transfer
encodings) is exactly the kind of surface a pipeline silently
corrupts. From the public specs: RFC 5322 (header folding:
CRLF+WSP unfolds to a single space-joined logical line), RFC 2047
(encoded words ``=?charset?B|Q?…?=`` in Subject/display names,
adjacent words joined WITHOUT intervening space), RFC 2045/2046
(Content-Type parameters with quoted strings, multipart boundaries
``--boundary`` / ``--boundary--``, nested multiparts), RFC 2045 §6.7
(quoted-printable: ``=HH`` bytes and soft line breaks ``=CRLF``)
and base64 transfer encoding.

Body selection (the mail-archive convention): depth-first over the
MIME tree, first ``text/plain`` leaf wins; otherwise the first
``text/html`` leaf reduced by the crawl tier's html_to_text;
attachments (Content-Disposition: attachment) never become body.

The stdlib ``email`` package is the INDEPENDENT implementation this
walker is pinned against in tests — both directions: stdlib-built
messages parse identically, and our fixture messages parse the same
under stdlib.

Corrupt-input discipline: no header/body separator, an unterminated
multipart, an undecodable transfer encoding raise the named
MailError — never a silently truncated body.

Reference parity: gazette/core moves opaque serializations only
(message/interfaces.go:121-124); parsing happens in executor-side
Arrow kernels.
"""

from __future__ import annotations

import base64
import binascii
import quopri
import re

from core_spark.functions.feeds import _rfc822_epoch
from core_spark.functions.html import html_to_text


class MailError(ValueError):
    """Named parse failure: corrupt or non-RFC-5322 input."""


_ENC_WORD = re.compile(
    r"=\?([^?]+)\?([bBqQ])\?([^?]*)\?="
)
_ADJACENT = re.compile(
    r"(=\?[^?]+\?[bBqQ]\?[^?]*\?=)\s+(?==\?)"
)


def decode_encoded_words(s: str) -> str:
    """RFC 2047: decode every encoded word; whitespace BETWEEN two
    encoded words is removed (§6.2), elsewhere preserved."""
    s = _ADJACENT.sub(r"\1", s)

    def _one(m: re.Match) -> str:
        charset, kind, payload = m.group(1), m.group(2), m.group(3)
        try:
            if kind in "bB":
                raw = base64.b64decode(payload, validate=True)
            else:
                raw = quopri.decodestring(
                    payload.replace("_", " "), header=False
                )
            return raw.decode(charset, errors="replace")
        except (binascii.Error, LookupError):
            return m.group(0)  # leave an undecodable word visible

    return _ENC_WORD.sub(_one, s)


def _split_headers(raw: bytes) -> tuple[dict, list[tuple[str, str]], bytes]:
    """Split header block from body at the first empty line and
    unfold per RFC 5322 §2.2.3. Returns (first-value map, all
    headers in order, body bytes)."""
    raw = raw.replace(b"\r\n", b"\n")
    sep = raw.find(b"\n\n")
    if sep < 0:
        raise MailError("no header/body separator (empty line)")
    head, body = raw[:sep], raw[sep + 2 :]
    lines = head.decode("utf-8", errors="replace").split("\n")
    headers: list[tuple[str, str]] = []
    for line in lines:
        if line[:1] in (" ", "\t") and headers:
            name, val = headers[-1]
            headers[-1] = (name, val + " " + line.strip())
        elif ":" in line:
            name, _, val = line.partition(":")
            headers.append((name.strip().lower(), val.strip()))
        elif line:
            raise MailError(f"malformed header line {line!r}")
    first: dict[str, str] = {}
    for name, val in headers:
        first.setdefault(name, val)
    return first, headers, body


def _ct_params(value: str) -> tuple[str, dict[str, str]]:
    """Content-Type value → (type/subtype lowercased, params with
    RFC 2045 quoted-string values unquoted)."""
    parts = value.split(";")
    ctype = parts[0].strip().lower()
    params: dict[str, str] = {}
    for p in parts[1:]:
        if "=" not in p:
            continue
        k, _, v = p.partition("=")
        v = v.strip()
        if v[:1] == '"' and v[-1:] == '"':
            v = v[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        params[k.strip().lower()] = v
    return ctype, params


def _decode_transfer(body: bytes, cte: str, where: str) -> bytes:
    cte = cte.strip().lower()
    if cte in ("", "7bit", "8bit", "binary"):
        return body
    if cte == "base64":
        try:
            return base64.b64decode(
                re.sub(rb"\s+", b"", body), validate=True
            )
        except binascii.Error as e:
            raise MailError(f"bad base64 body in {where}: {e}")
    if cte == "quoted-printable":
        return quopri.decodestring(body)
    raise MailError(f"unknown transfer encoding {cte!r} in {where}")


def _walk_parts(
    body: bytes, ctype: str, params: dict, cte: str, headers: dict,
    out: list, where: str,
) -> None:
    if ctype.startswith("multipart/"):
        boundary = params.get("boundary")
        if not boundary:
            raise MailError(f"multipart without boundary in {where}")
        delim = b"--" + boundary.encode()
        chunks = body.split(b"\n" + delim)
        # also allow the delimiter at the very start
        if chunks[0].startswith(delim):
            chunks[0] = chunks[0][len(delim):]
            chunks.insert(0, b"")
        closed = False
        parts = []
        for c in chunks[1:]:
            if c.startswith(b"--"):
                closed = True
                break
            parts.append(c.lstrip(b"\n"))
        if not closed:
            raise MailError(f"unterminated multipart in {where}")
        for i, part in enumerate(parts):
            first, _, pbody = _split_headers(part + b"\n\n" if b"\n\n" not in part else part)
            pct, pparams = _ct_params(
                first.get("content-type", "text/plain")
            )
            _walk_parts(
                pbody,
                pct,
                pparams,
                first.get("content-transfer-encoding", ""),
                first,
                out,
                f"{where}.part{i}",
            )
        return
    data = _decode_transfer(body, cte, where)
    out.append(
        {
            "ctype": ctype,
            "charset": params.get("charset", "us-ascii"),
            "disposition": headers.get(
                "content-disposition", ""
            ).split(";")[0].strip().lower(),
            "data": data,
        }
    )


def parse_eml(raw: bytes) -> dict:
    """Parse one RFC 5322 message into {subject, from_addr, to_addr,
    date_epoch, n_parts, body_text, body_source ('plain'|'html'|'')}
    — headers unfolded and RFC-2047-decoded, the MIME tree walked
    depth-first, transfer encodings decoded, body chosen by the
    first-text/plain-else-html rule with attachments excluded."""
    first, _headers, body = _split_headers(raw)
    subject = decode_encoded_words(first.get("subject", ""))
    date = first.get("date")
    if date is None:
        raise MailError("message has no Date header")
    ctype, params = _ct_params(
        first.get("content-type", "text/plain")
    )
    parts: list[dict] = []
    _walk_parts(
        body,
        ctype,
        params,
        first.get("content-transfer-encoding", ""),
        first,
        parts,
        "root",
    )
    body_text, source = "", ""
    for p in parts:
        if p["ctype"] == "text/plain" and p["disposition"] != "attachment":
            body_text = p["data"].decode(p["charset"], errors="replace")
            source = "plain"
            break
    if not source:
        for p in parts:
            if p["ctype"] == "text/html" and p["disposition"] != "attachment":
                body_text = html_to_text(
                    p["data"].decode(p["charset"], errors="replace")
                )["text"]
                source = "html"
                break
    return {
        "subject": subject,
        "from_addr": first.get("from", ""),
        "to_addr": first.get("to", ""),
        "date_epoch": _rfc822_epoch(date),
        "n_parts": len(parts),
        "body_text": body_text.rstrip("\n"),
        "body_source": source,
    }


# ------------------------------------------------------------ fixture

from datetime import datetime, timezone  # noqa: E402

_DAYS = ("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
_MONTHS = (
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
)


def build_eml_fixture(text: str, digest: str) -> bytes:
    """Deterministic message for q_cc_eml: body = the document text
    in 15-word lines, subject = first 5 words, the MIME form
    rotating on md5 nibble 15 (`digest[14]` % 4):

    - 0 plain 7bit text/plain;
    - 1 base64 text/plain inside multipart/mixed with a base64
      application/octet-stream ATTACHMENT (never the body) —
      n_parts 2;
    - 2 quoted-printable text/plain (every space of the first line
      written =20, soft breaks inserted), subject as an RFC 2047
      ?B? encoded word, folded To: header;
    - 3 multipart/alternative whose text/plain is ABSENT: body
      falls back to the text/html part (the crawl-tier reduction),
      subject as TWO adjacent ?Q? words whose separating space must
      vanish — n_parts 1."""
    words = text.split(" ")
    form = int(digest[14], 16) % 4
    lines = [
        " ".join(words[i : i + 15])
        for i in range(0, len(words), 15)
    ]
    body = "\n".join(lines)
    subject = " ".join(words[:5])
    yy = 2000 + int(digest[1:3], 16) % 26
    mm = 1 + int(digest[3], 16) % 12
    dd = 1 + int(digest[4], 16) % 28
    hh = int(digest[5], 16) % 24
    mi = int(digest[11:13], 16) % 60
    ss = int(digest[13:15], 16) % 60
    dt = datetime(yy, mm, dd, hh, mi, ss, tzinfo=timezone.utc)
    date = (
        f"{_DAYS[dt.weekday()]}, {dd:02d} {_MONTHS[mm - 1]} "
        f"{yy:04d} {hh:02d}:{mi:02d}:{ss:02d} +0000"
    )
    frm = f"a.{digest[:6]}@example.com"
    to = f"list-{digest[6:10]}@example.com"
    if form == 0:
        msg = (
            f"From: {frm}\nTo: {to}\nSubject: {subject}\n"
            f"Date: {date}\nContent-Type: text/plain;"
            ' charset="utf-8"\n\n' + body + "\n"
        )
    elif form == 1:
        b64 = base64.encodebytes(body.encode()).decode()
        att = base64.encodebytes(
            bytes.fromhex(digest) * 4
        ).decode()
        bnd = "b-" + digest[:8]
        msg = (
            f"From: {frm}\nTo: {to}\nSubject: {subject}\n"
            f"Date: {date}\n"
            f'Content-Type: multipart/mixed; boundary="{bnd}"\n\n'
            f"--{bnd}\n"
            'Content-Type: text/plain; charset="utf-8"\n'
            "Content-Transfer-Encoding: base64\n\n"
            + b64
            + f"--{bnd}\n"
            "Content-Type: application/octet-stream\n"
            'Content-Disposition: attachment; filename="d.bin"\n'
            "Content-Transfer-Encoding: base64\n\n"
            + att
            + f"--{bnd}--\n"
        )
    elif form == 2:
        qp_lines = []
        for j, ln in enumerate(lines):
            enc = ln.replace(" ", "=20") if j == 0 else ln
            # soft break mid-line to prove =\n reassembly — never
            # inside an =HH escape
            cut = max(len(enc) // 2, 1)
            while cut < len(enc) and "=" in enc[max(cut - 2, 0) : cut + 1]:
                cut += 1
            qp_lines.append(enc[:cut] + "=\n" + enc[cut:])
        sub_b64 = base64.b64encode(subject.encode()).decode()
        msg = (
            f"From: {frm}\nTo: {to},\n\t{to}\n"
            f"Subject: =?utf-8?B?{sub_b64}?=\n"
            f"Date: {date}\n"
            'Content-Type: text/plain; charset="utf-8"\n'
            "Content-Transfer-Encoding: quoted-printable\n\n"
            + "\n".join(qp_lines)
            + "\n"
        )
    else:
        half = len(subject) // 2
        q1 = subject[:half].replace(" ", "_")
        q2 = subject[half:].replace(" ", "_")
        html = (
            "<html><body>"
            + "".join(f"<p>{ln}</p>" for ln in lines)
            + "</body></html>"
        )
        bnd = "alt-" + digest[:8]
        msg = (
            f"From: {frm}\nTo: {to}\n"
            f"Subject: =?utf-8?Q?{q1}?= =?utf-8?Q?{q2}?=\n"
            f"Date: {date}\n"
            f'Content-Type: multipart/alternative; boundary="{bnd}"\n'
            f"\n--{bnd}\n"
            'Content-Type: text/html; charset="utf-8"\n\n'
            + html
            + f"\n--{bnd}--\n"
        )
    return msg.encode("utf-8")


# -------------------------------------------------------------- mbox

_FROM_LINE = re.compile(rb"^From .*$", re.M)
_QUOTED_FROM = re.compile(rb"^(>+)From ", re.M)


def mbox_messages(raw: bytes) -> list[bytes]:
    """Split an mbox (RFC 4155) into raw RFC 5322 messages: a
    message starts at each unquoted ``From `` separator line (the
    line itself is envelope metadata, not part of the message), and
    mboxrd body quoting is REVERSED — every ``>*From `` line loses
    exactly one ``>``. A payload that does not start with a
    separator line raises MailError."""
    if not raw.startswith(b"From "):
        raise MailError("mbox does not start with a 'From ' line")
    msgs: list[bytes] = []
    # split at separator lines: unquoted "From " at start of line
    starts = [
        m.start()
        for m in re.finditer(rb"(?:^|\n)From [^\n]*\n", raw)
    ]
    starts.append(len(raw))
    for a, b in zip(starts, starts[1:]):
        chunk = raw[a:b]
        if chunk.startswith(b"\n"):
            chunk = chunk[1:]
        # drop the envelope line itself
        nl = chunk.find(b"\n")
        body = chunk[nl + 1 :]
        # mboxrd unquote: ">From " -> "From ", ">>From " -> ">From "
        body = _QUOTED_FROM.sub(
            lambda m: m.group(1)[1:] + b"From ", body
        )
        msgs.append(body.rstrip(b"\n") + b"\n")
    return msgs


def build_mbox_fixture(text: str, digest: str) -> bytes:
    """Deterministic mbox for q_bundle_mbox: `2 + digest%3` plain
    messages whose facts are wrapping word slices (the
    q_bundle_tar rule), each with a SECOND body line that STARTS
    WITH ``From `` — so the container must mboxrd-quote it and the
    reader must unquote it back, the round-trip the oracle's body
    hash proves. Message i's date is the doc's md5 date plus i
    hours."""
    words = text.split(" ")
    n = 2 + int(digest[0:2], 16) % 3
    yy = 2000 + int(digest[1:3], 16) % 26
    mm = 1 + int(digest[3], 16) % 12
    dd = 1 + int(digest[4], 16) % 28
    mi = int(digest[11:13], 16) % 60
    ss = int(digest[13:15], 16) % 60
    frm = f"a.{digest[:6]}@example.com"
    out: list[bytes] = []
    for i in range(n):
        subject = " ".join(
            words[(i * 4 + k) % len(words)] for k in range(4)
        )
        line1 = " ".join(
            words[(i * 8 + k) % len(words)] for k in range(8)
        )
        line2 = "From " + " ".join(
            words[(i * 3 + k) % len(words)] for k in range(3)
        )
        hh = i % 24
        dt = datetime(yy, mm, dd, hh, mi, ss, tzinfo=timezone.utc)
        date = (
            f"{_DAYS[dt.weekday()]}, {dd:02d} {_MONTHS[mm - 1]} "
            f"{yy:04d} {hh:02d}:{mi:02d}:{ss:02d} +0000"
        )
        msg = (
            f"From: {frm}\nTo: list@example.com\n"
            f"Subject: {subject}\nDate: {date}\n"
            'Content-Type: text/plain; charset="utf-8"\n\n'
            + line1 + "\n" + line2 + "\n"
        )
        # mboxrd quoting on the way IN
        body = re.sub(
            r"^(>*)From ", r">\1From ", msg, flags=re.M
        )
        out.append(
            f"From {frm} Thu Jan  1 00:00:00 1970\n".encode()
            + body.encode()
        )
    return b"".join(out)
