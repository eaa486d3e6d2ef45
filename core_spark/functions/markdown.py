"""Markdown → text extraction — the dominant README/docs/forum
shape in code-adjacent corpora. A pragmatic CommonMark subset, from
the public spec: ATX (``#``) and setext (``===``/``---`` underline)
headings, fenced code blocks (``` / ~~~, excluded from prose and
counted — code goes to a code pipeline, not the text corpus),
indented code blocks (4-space rule, likewise), inline code spans
(content kept, backticks stripped), emphasis markers stripped,
inline links ``[text](url)`` reduced to their text with the URL
collected, reference links ``[text][id]`` resolved against
``[id]: url`` definitions, images reduced to their alt text, list
markers (``-``/``*``/``+``/``1.``) and blockquote ``>`` prefixes
stripped, paragraphs joined by single newlines.

Like HTML, markdown is forgiving by design: there is no parse
error — malformed constructs degrade to their literal text. The
fidelity pins live in the fixture forms: markup must STRIP (a
corpus full of ``**`` and ``](`` litter is the classic quality-gate
failure) while code must VANISH from prose and be counted.

Reference parity: gazette/core moves opaque serializations only
(message/interfaces.go:121-124); parsing happens in executor-side
Arrow kernels.
"""

from __future__ import annotations

import re

_REF_DEF = re.compile(r"^\s{0,3}\[([^\]]+)\]:\s*(\S+)\s*$")
_ATX = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_SETEXT = re.compile(r"^(=+|-+)\s*$")
_FENCE = re.compile(r"^(```|~~~)")
_LIST = re.compile(r"^\s{0,3}(?:[-*+]|\d{1,9}[.)])\s+")
_QUOTE = re.compile(r"^\s{0,3}>\s?")
_IMG = re.compile(r"!\[([^\]]*)\]\(([^)]*)\)")
_LINK = re.compile(r"\[([^\]]+)\]\(([^)\s]+)(?:\s+\"[^\"]*\")?\)")
_REF_LINK = re.compile(r"\[([^\]]+)\]\[([^\]]*)\]")
_AUTO = re.compile(r"<(https?://[^>]+)>")
_CODE_SPAN = re.compile(r"`([^`]*)`")
_EMPH = re.compile(r"(\*\*|__|\*|_)(?=\S)(.+?)(?<=\S)\1")


_FM_SCALAR = re.compile(r"^([A-Za-z0-9_-]+):\s*(.*)$")


def _parse_front_matter(lines: list[str]) -> tuple[dict, int]:
    """YAML front matter (the Jekyll/Hugo/Obsidian convention): a
    document whose FIRST line is ``---`` opens a metadata block
    closed by the next ``---``/``...`` line. Parsed as the flat
    subset real static-site metadata actually uses — scalar
    ``key: value`` pairs (quotes stripped), inline lists
    ``[a, b]``, and indented ``- item`` lists — with no YAML
    library (none exists in this environment; anchors/nesting
    degrade to their raw strings rather than failing). Returns
    (mapping, lines consumed); (empty, 0) when there is no block,
    including the unterminated case (then it's prose, per the
    forgiving-markdown rule)."""
    if not lines or lines[0].strip() != "---":
        return {}, 0
    end = None
    for i in range(1, len(lines)):
        if lines[i].strip() in ("---", "..."):
            end = i
            break
    if end is None:
        return {}, 0
    fm: dict[str, object] = {}
    key = None
    for ln in lines[1:end]:
        if ln.lstrip().startswith("- ") and key is not None:
            cur = fm.get(key)
            if not isinstance(cur, list):
                cur = [] if cur in ("", None) else [cur]
            cur.append(ln.lstrip()[2:].strip().strip("'\""))
            fm[key] = cur
            continue
        m = _FM_SCALAR.match(ln)
        if not m:
            continue
        key, val = m.group(1), m.group(2).strip()
        if val.startswith("[") and val.endswith("]"):
            fm[key] = [
                v.strip().strip("'\"")
                for v in val[1:-1].split(",")
                if v.strip()
            ]
        else:
            fm[key] = val.strip("'\"")
    return fm, end + 1


def md_to_text(raw: str) -> dict:
    """Extract {text, title (first heading), headings
    [(level, text)], n_code_blocks, n_links, front_matter} from a
    markdown document. A leading YAML front-matter block is parsed
    into ``front_matter`` and excluded from prose (metadata keys in
    the corpus text are the static-site-scrape failure mode); prose
    joins with single newlines per block; code blocks are excluded
    and counted; heading text participates in both the heading list
    and the prose flow (the corpus-text convention)."""
    lines = raw.split("\n")
    front_matter, consumed = _parse_front_matter(lines)
    lines = lines[consumed:]
    blocks: list[str] = []
    headings: list[tuple[int, str]] = []
    refs: dict[str, str] = {}
    n_code = 0
    links: list[str] = []

    # pass 1: collect reference definitions
    for ln in lines:
        m = _REF_DEF.match(ln)
        if m:
            refs[m.group(1).lower()] = m.group(2)

    def inline(s: str) -> str:
        s = _IMG.sub(lambda m: m.group(1), s)

        def _link(m: re.Match) -> str:
            links.append(m.group(2))
            return m.group(1)

        s = _LINK.sub(_link, s)

        def _ref(m: re.Match) -> str:
            key = (m.group(2) or m.group(1)).lower()
            if key in refs:
                links.append(refs[key])
                return m.group(1)
            return m.group(0)  # unresolved: literal, per spec

        s = _REF_LINK.sub(_ref, s)

        def _auto(m: re.Match) -> str:
            links.append(m.group(1))
            return m.group(1)

        s = _AUTO.sub(_auto, s)
        s = _CODE_SPAN.sub(lambda m: m.group(1), s)
        prev = None
        while prev != s:  # nested emphasis strips iteratively
            prev = s
            s = _EMPH.sub(lambda m: m.group(2), s)
        return s

    para: list[str] = []
    in_fence = False
    fence_mark = ""

    def flush() -> None:
        if para:
            blocks.append(" ".join(para))
            para.clear()

    i = 0
    while i < len(lines):
        ln = lines[i]
        if in_fence:
            if ln.startswith(fence_mark):
                in_fence = False
            i += 1
            continue
        m = _FENCE.match(ln)
        if m:
            flush()
            in_fence = True
            fence_mark = m.group(1)
            n_code += 1
            i += 1
            continue
        if ln.startswith("    ") and not para:
            # indented code block: consume the run
            flush()
            n_code += 1
            while i < len(lines) and (
                lines[i].startswith("    ") or not lines[i].strip()
            ):
                i += 1
            continue
        if _REF_DEF.match(ln):
            i += 1
            continue
        m = _ATX.match(ln)
        if m:
            flush()
            text = inline(m.group(2))
            headings.append((len(m.group(1)), text))
            blocks.append(text)
            i += 1
            continue
        if (
            para
            and _SETEXT.match(ln)
            and not _LIST.match(ln)
        ):
            text = inline(" ".join(para))
            para.clear()
            level = 1 if ln.lstrip().startswith("=") else 2
            headings.append((level, text))
            blocks.append(text)
            i += 1
            continue
        if not ln.strip():
            flush()
            i += 1
            continue
        s = ln
        s = _QUOTE.sub("", s)
        s = _LIST.sub("", s)
        para.append(inline(s.strip()))
        i += 1
    flush()
    return {
        "text": "\n".join(b for b in blocks if b),
        "title": headings[0][1] if headings else "",
        "headings": headings,
        "n_code_blocks": n_code,
        "n_links": len(links),
        "front_matter": front_matter,
    }


# ------------------------------------------------------------ fixture

_PARA_WORDS = 16


def build_md_fixture(text: str, digest: str) -> str:
    """Deterministic markdown for q_cc_markdown: heading = first 4
    words, body = remaining words in 16-word paragraphs, ONE link
    per document (url https://example.com/l/<digest6>, anchored on
    the first body paragraph's first word) and ONE code block of
    non-corpus content that must VANISH from prose. The markup FORM
    rotates on md5 nibble 16 of the reversed digest
    (`digest[-2]` % 4) while extracted prose stays IDENTICAL:

    - 0 ATX heading, inline link, fenced ``` code, ``**``/``*``
      emphasis on the first paragraph words;
    - 1 setext heading, REFERENCE link + definition, ~~~ fence,
      ``__``/``_`` emphasis;
    - 2 ATX with trailing ###, inline code spans wrapping the
      second paragraph's first word, indented (4-space) code block,
      image-with-alt preceding the link;
    - 3 list + blockquote framing: every body paragraph rides as a
      ``- `` list item or ``> `` quote line alternately; fenced
      code with a language info string."""
    words = text.split(" ")
    form = int(digest[-2], 16) % 4
    head = " ".join(words[:4])
    rest = words[4:] or words  # tiny docs: reuse
    paras = [
        " ".join(rest[i : i + _PARA_WORDS])
        for i in range(0, len(rest), _PARA_WORDS)
    ]
    url = f"https://example.com/l/{digest[:6]}"
    code = "    x = 1\n    y = 2" if form == 2 else "x = 1\ny = 2"
    out: list[str] = []
    if form == 1:
        out.append(head)
        out.append("=" * max(len(head), 3))
    elif form == 2:
        out.append(f"## {head} ##")
    else:
        out.append(f"# {head}")
    out.append("")
    for k, p in enumerate(paras):
        pw = p.split(" ")
        if k == 0:
            if form == 0:
                pw[0] = f"[{pw[0]}]({url})"
                if len(pw) > 1:
                    pw[1] = f"**{pw[1]}**"
                if len(pw) > 2:
                    pw[2] = f"*{pw[2]}*"
            elif form == 1:
                pw[0] = f"[{pw[0]}][ref1]"
                if len(pw) > 1:
                    pw[1] = f"__{pw[1]}__"
                if len(pw) > 2:
                    pw[2] = f"_{pw[2]}_"
            elif form == 2:
                pw[0] = f"![]({url}/img.png)[{pw[0]}]({url})"
            else:
                pw[0] = f"[{pw[0]}]({url})"
        if k == 1 and form == 2:
            pw[0] = f"`{pw[0]}`"
        p2 = " ".join(pw)
        if form == 3:
            p2 = ("- " if k % 2 == 0 else "> ") + p2
        out.append(p2)
        out.append("")
    if form == 0:
        out.append("```\n" + code + "\n```")
    elif form == 1:
        out.append("~~~\n" + code + "\n~~~")
        out.append("")
        out.append(f"[ref1]: {url}")
    elif form == 2:
        out.append(code)
    else:
        out.append("```python\n" + code + "\n```")
    return "\n".join(out) + "\n"


def _expected_md(text: str, digest: str) -> dict:
    """Test-side twin: what md_to_text must return for a fixture
    built from (text, digest) — prose identical across forms."""
    words = text.split(" ")
    head = " ".join(words[:4])
    rest = words[4:] or words
    paras = [
        " ".join(rest[i : i + _PARA_WORDS])
        for i in range(0, len(rest), _PARA_WORDS)
    ]
    form = int(digest[-2], 16) % 4
    del form  # prose and counts are form-independent by design
    return {
        "text": "\n".join([head] + paras),
        "title": head,
        "n_code_blocks": 1,
        "n_links": 1,
    }
