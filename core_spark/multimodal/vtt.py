"""WebVTT caption parsing — the transcript-mining step that turns a
video corpus into (clip, text) training pairs. Pure stdlib, per the
public W3C WebVTT spec: a `WEBVTT` signature line, then blocks
separated by blank lines — NOTE/STYLE/REGION blocks are skipped, a
cue block is an optional identifier line, a timing line
`HH:MM:SS.mmm --> HH:MM:SS.mmm` (hours optional) with optional cue
settings after the end time, then payload lines whose inline markup
(<b>, <i>, <c.class>, <v Speaker>, cue timestamps <00:00:01.000>)
is stripped to plain text.

Corrupt-input discipline, tuned to the format: WebVTT is a text
format whose spec tells players to SKIP invalid blocks, so a
malformed cue inside a valid file is skipped (never fabricated);
but a stream that is not WebVTT at all (missing signature) raises
the named VttError — the magic-routing contract the other codecs
follow.

Reference parity: gazette/core ships opaque serializations only
(message/interfaces.go:121-124); caption parsing happens in
executor-side Arrow kernels.
"""

from __future__ import annotations

import re

_TS = re.compile(
    r"^(?:(\d+):)?([0-5]\d):([0-5]\d)\.(\d{3})$"
)
_TAG = re.compile(r"<[^>]*>")
# Cue timings per the W3C grammar: start, one-or-more SPACE/TAB,
# "-->", one-or-more SPACE/TAB, end [settings]. A single-space
# literal match would silently drop tab-separated cues — data loss,
# not an error — so the separator is matched structurally.
_ARROW = "-->"
_TIMING = re.compile(
    r"^(\S+)[ \t]+-->[ \t]+(\S+)(?:[ \t]+.*)?$"
)


class VttError(ValueError):
    """Named parse failure: not a WebVTT stream."""


def _parse_ts(s: str) -> int | None:
    m = _TS.match(s)
    if not m:
        return None
    h, mi, se, ms = m.groups()
    return (
        (int(h or 0) * 3600 + int(mi) * 60 + int(se)) * 1000 + int(ms)
    )


def vtt_cues(raw: str) -> list[dict]:
    """Parse a WebVTT document into cues: one dict per valid cue —
    {cue_idx (0-based over VALID cues), t0_ms, t1_ms, text (payload
    lines joined by a single space, inline markup stripped,
    whitespace collapsed)}. Invalid blocks are skipped per spec;
    a missing WEBVTT signature raises VttError."""
    if raw.startswith("﻿"):
        raw = raw[1:]
    lines = raw.split("\n")
    first = lines[0].rstrip("\r") if lines else ""
    if not (first == "WEBVTT" or first.startswith(("WEBVTT ", "WEBVTT\t"))):
        raise VttError("missing WEBVTT signature")

    # split into blank-line-separated blocks
    blocks: list[list[str]] = []
    cur: list[str] = []
    for ln in lines[1:]:
        ln = ln.rstrip("\r")
        if ln.strip() == "":
            if cur:
                blocks.append(cur)
                cur = []
        else:
            cur.append(ln)
    if cur:
        blocks.append(cur)

    cues: list[dict] = []
    for blk in blocks:
        if blk[0].startswith(("NOTE", "STYLE", "REGION")):
            continue
        # timing line is the first line containing " --> "; at most
        # one identifier line may precede it
        ti = next(
            (i for i, ln in enumerate(blk[:2]) if _ARROW in ln), None
        )
        if ti is None:
            continue  # invalid block: skip per spec
        timing = _TIMING.match(blk[ti])
        if timing is None:
            continue  # malformed timing line: skip per spec
        t0 = _parse_ts(timing.group(1))
        t1 = _parse_ts(timing.group(2))
        if t0 is None or t1 is None or t1 < t0:
            continue  # invalid timing: skip per spec
        payload = " ".join(blk[ti + 1 :])
        text = " ".join(_TAG.sub("", payload).split())
        cues.append(
            {
                "cue_idx": len(cues),
                "t0_ms": t0,
                "t1_ms": t1,
                "text": text,
            }
        )
    return cues


def build_vtt_fixture(text: str, digest: str) -> str:
    """Deterministic WebVTT fixture: the document's words tiled 8 per
    cue (last cue short), cue duration `1800 + digest%1700` ms, each
    cue carrying the real decorations a parser must handle —
    identifier lines, settings on odd cues, the first word of every
    cue wrapped in <b>, a leading NOTE block. `digest` is
    md5(text).hexdigest() so a SQL oracle recomputes the cue
    boundaries and timing; stripping recovers the original words."""
    words = text.split(" ")
    dur = 1800 + int(digest[0:4], 16) % 1700
    out = ["WEBVTT", "", "NOTE generated fixture", ""]

    def ts(ms: int) -> str:
        h, rem = divmod(ms, 3600000)
        mi, rem = divmod(rem, 60000)
        se, msec = divmod(rem, 1000)
        return f"{h:02d}:{mi:02d}:{se:02d}.{msec:03d}"

    n = (len(words) + 7) // 8
    for i in range(n):
        chunk = words[i * 8 : i * 8 + 8]
        chunk = [f"<b>{chunk[0]}</b>", *chunk[1:]]
        t0 = i * dur
        settings = " align:start" if i % 2 else ""
        out.append(f"c{i}")
        out.append(f"{ts(t0)} --> {ts(t0 + dur)}{settings}")
        out.append(" ".join(chunk))
        out.append("")
    return "\n".join(out)
