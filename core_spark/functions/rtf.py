"""RTF text extraction — the legacy word-processor shape still
abundant in crawled corpora (old Word exports, email attachments,
.doc-adjacent archives). From the public Microsoft RTF 1.9
specification: a token stream of groups (``{``/``}``), control
words (``\\word`` with an optional signed numeric parameter and one
swallowed delimiter space), control symbols, and plain text.

The parts real extractors get wrong, all implemented and pinned:
- DESTINATIONS: ``\\fonttbl``, ``\\colortbl``, ``\\stylesheet``,
  ``\\info``, ``\\pict``, headers/footers and every ``{\\*`` …``}``
  unknown destination contribute NO text — a naive tokenizer leaks
  font names and hex-encoded images into the document body;
- ESCAPES: ``\\'hh`` is a code-page byte (cp1252 here, the ANSI
  default), ``\\uN`` is a signed 16-bit Unicode scalar whose
  FOLLOWING ``\\ucN``-many characters are a legacy fallback that
  must be SKIPPED (default 1) — double-emission is the classic bug;
- symbols: ``\\{`` ``\\}`` ``\\\\`` literal, ``\\~`` no-break
  space, ``\\_`` non-breaking hyphen, ``\\-`` soft hyphen (zero
  width — dropped);
- ``\\par``/``\\line`` → ``\\n``, ``\\tab`` → ``\\t``; ``\\uc``
  state is GROUP-SCOPED (restored on ``}``), like the spec says.

Corrupt-input discipline: input not starting ``{\\rtf`` raises the
named RtfError; within a real RTF the tokenizer is forgiving (the
HTML convention — truncated files extract their prefix), because
real crawled RTF is routinely truncated mid-group.

Reference parity: gazette/core moves opaque serializations only
(message/interfaces.go:121-124); parsing happens in executor-side
Arrow kernels.
"""

from __future__ import annotations

import re

_CW = re.compile(r"\\([a-zA-Z]+)(-?[0-9]+)? ?")

_DESTINATIONS = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict",
    "header", "footer", "headerl", "headerr", "headerf",
    "footerl", "footerr", "footerf", "footnote", "annotation",
    "themedata", "colorschememapping", "listtable",
    "listoverridetable", "generator", "operator", "author",
    "title",
}


class RtfError(ValueError):
    """Named parse failure: not an RTF payload."""


def rtf_to_text(raw: str) -> str:
    """Extract document text per the RTF 1.9 token grammar. Group
    state (skip-destination flag, \\uc count) is a real stack;
    \\uN fallback skipping crosses token boundaries the way Word
    writes them (``\\u8217\\'92`` — the hex escape IS the fallback
    and must vanish)."""
    if not raw.startswith("{\\rtf"):
        raise RtfError("payload does not start with {\\rtf")
    out: list[str] = []
    stack: list[tuple[bool, int]] = []
    skip_dest = False
    uc = 1
    pending_skip = 0  # chars of \u fallback left to swallow
    i, n = 0, len(raw)
    while i < n:
        ch = raw[i]
        if ch == "{":
            stack.append((skip_dest, uc))
            i += 1
            # {\* — everything in this group is an (unknown)
            # destination unless a reader understands it; we skip.
            if raw[i : i + 2] == "\\*":
                skip_dest = True
                i += 2
            continue
        if ch == "}":
            if stack:
                skip_dest, uc = stack.pop()
            i += 1
            continue
        if ch == "\\":
            nxt = raw[i + 1 : i + 2]
            if nxt == "'":
                code = raw[i + 2 : i + 4]
                i += 4
                try:
                    c = bytes([int(code, 16)]).decode("cp1252")
                except (ValueError, UnicodeDecodeError):
                    c = "�"
                if pending_skip:
                    pending_skip -= 1
                elif not skip_dest:
                    out.append(c)
                continue
            if nxt in "{}\\":
                if pending_skip:
                    pending_skip -= 1
                elif not skip_dest:
                    out.append(nxt)
                i += 2
                continue
            if nxt == "~":
                if not skip_dest:
                    out.append("\u00a0")  # no-break space
                i += 2
                continue
            if nxt == "_":
                if not skip_dest:
                    out.append("‑")
                i += 2
                continue
            if nxt == "-":
                i += 2  # soft hyphen: zero width
                continue
            m = _CW.match(raw, i)
            if not m:
                i += 2  # unknown control symbol: ignore
                continue
            word, param = m.group(1), m.group(2)
            i = m.end()
            if word in _DESTINATIONS:
                skip_dest = True
            elif word == "uc":
                uc = int(param or "1")
            elif word == "u":
                cp = int(param or "0")
                if cp < 0:
                    cp += 65536
                if not skip_dest:
                    out.append(chr(cp))
                pending_skip = uc
            elif word in ("par", "line"):
                if not skip_dest:
                    out.append("\n")
            elif word == "tab":
                if not skip_dest:
                    out.append("\t")
            # all other control words are formatting: no text
            continue
        if ch in "\r\n":
            i += 1  # raw newlines are insignificant in RTF
            continue
        if pending_skip:
            pending_skip -= 1
            i += 1
            continue
        if not skip_dest:
            out.append(ch)
        i += 1
    return "".join(out)


# ------------------------------------------------------------ fixture

_PARA_WORDS = 9


def build_rtf_fixture(text: str, digest: str) -> str:
    """Deterministic RTF for q_cc_rtf: the text in 9-word
    paragraphs, the ENCODING form rotating on md5 nibble 14
    (`digest[13]` % 4) while the extracted text stays IDENTICAL —
    the q_cc_xlsx representation-rotation convention, so one chunk
    oracle covers every form:

    - 0 plain: one ``\\par``-terminated paragraph per chunk after a
      real preamble (fonttbl/colortbl/info destinations that must
      vanish);
    - 1 formatting noise: words wrapped in ``{\\b …}``/``{\\i …}``
      groups, ``\\fs`` churn, a ``{\\*\\generator …}`` unknown
      destination mid-body;
    - 2 hex escapes: every space written ``\\'20`` and each chunk's
      first character ``\\'hh`` (cp1252);
    - 3 unicode escapes: each word's first character ``\\uN`` with
      a ``?`` fallback that must be swallowed (``\\uc1``)."""
    words = text.split(" ")
    form = int(digest[13], 16) % 4
    chunks = [
        words[i : i + _PARA_WORDS]
        for i in range(0, len(words), _PARA_WORDS)
    ]
    preamble = (
        "{\\fonttbl{\\f0\\froman Times New Roman;}"
        "{\\f1\\fswiss Arial;}}"
        "{\\colortbl;\\red255\\green0\\blue0;}"
        "{\\info{\\author A. " + digest[8:12] + "}"
        "{\\title Doc " + digest[:8] + "}}"
    )
    paras = []
    for k, cw in enumerate(chunks):
        if form == 1:
            deco = []
            for j, w in enumerate(cw):
                if j % 3 == 0:
                    deco.append("{\\b " + w + "}")
                elif j % 3 == 1:
                    deco.append("{\\i\\fs24 " + w + "}")
                else:
                    deco.append(w)
            body = " ".join(deco)
            if k == 0:
                body = (
                    "{\\*\\generator fixture 1.0;}" + body
                )
        elif form == 2:
            joined = " ".join(cw)
            first = f"\\'{ord(joined[0]):02x}"
            body = first + joined[1:].replace(" ", "\\'20")
        elif form == 3:
            deco = [
                f"\\uc1\\u{ord(w[0])}?" + w[1:] for w in cw
            ]
            body = " ".join(deco)
        else:
            body = " ".join(cw)
        # \par delimited by a raw newline (insignificant in RTF) —
        # an undelimited \par would absorb the next chunk's leading
        # letters into the control word, per the token grammar
        paras.append(body + "\\par\n")
    return (
        "{\\rtf1\\ansi\\ansicpg1252\\deff0 "
        + preamble
        + "".join(paras)
        + "}"
    )


def _expected_text(text: str) -> list[str]:
    """Every form extracts the same 9-word chunks (+ trailing
    newline per \\par)."""
    words = text.split(" ")
    return [
        " ".join(words[i : i + _PARA_WORDS])
        for i in range(0, len(words), _PARA_WORDS)
    ]
