"""LaTeX → text extraction — the scientific-paper shape (arXiv-style
corpora ship TeX sources, and the published pipelines detex them
before quality gating). A pragmatic subset of the public TeX/LaTeX
grammar, the detex convention:

- comments strip (``%`` to end of line; ``\\%`` is a literal
  percent and stays);
- math is NOT prose: inline ``$…$``/``\\(…\\)`` and display
  ``$$…$$``/``\\[…\\]``/``equation``/``align`` environments are
  removed and COUNTED (a corpus full of half-tokenized formulas is
  the classic arXiv-extraction failure);
- sectioning commands (``\\section``, ``\\subsection``, …) and
  ``\\title`` keep their argument as prose (title also captured);
- formatting commands (``\\textbf``/``\\emph``/``\\textit``/
  ``\\texttt``/``\\underline``/``\\mbox``) keep their argument;
- reference machinery (``\\cite``/``\\ref``/``\\eqref``/
  ``\\label``/``\\includegraphics``) drops argument and all, with
  citations counted; ``\\footnote`` bodies are excluded (margin
  material, the ODT-annotation convention);
- ``figure``/``table`` environments skip wholesale (captions are
  labels, not body prose — counted as figures);
- ``itemize``/``enumerate`` keep their items (``\\item`` strips);
  ``abstract`` keeps its body; ``document`` is transparent;
- escapes ``\\%``/``\\&``/``\\_``/``\\#``/``\\$`` → their literal,
  ``~`` → space, ``\\\\`` → newline; other unknown ``\\commands``
  drop their name and keep any brace argument (detex).

Forgiving like HTML/markdown: malformed input degrades to
best-effort text, never an exception.

Reference parity: gazette/core moves opaque serializations only
(message/interfaces.go:121-124); parsing happens in executor-side
Arrow kernels.
"""

from __future__ import annotations

import re

_KEEP_ARG = {
    "section", "subsection", "subsubsection", "paragraph",
    "chapter", "title", "textbf", "emph", "textit", "texttt",
    "underline", "mbox", "author",
}
_DROP_ARG = {
    "cite", "citep", "citet", "ref", "eqref", "label",
    "includegraphics", "footnote", "usepackage", "documentclass",
    "bibliography", "bibliographystyle", "input", "include",
}
_SKIP_ENVS = {"figure", "figure*", "table", "table*", "tikzpicture"}
_MATH_ENVS = {
    "equation", "equation*", "align", "align*", "eqnarray",
    "displaymath", "math",
}

_CMD = re.compile(r"\\([a-zA-Z]+)\s*(\*)?")


def _strip_comments(raw: str) -> str:
    out = []
    for line in raw.split("\n"):
        buf = []
        i = 0
        while i < len(line):
            c = line[i]
            if c == "\\" and i + 1 < len(line):
                buf.append(line[i : i + 2])
                i += 2
                continue
            if c == "%":
                break
            buf.append(c)
            i += 1
        out.append("".join(buf))
    return "\n".join(out)


def _read_group(s: str, i: int) -> tuple[str, int]:
    """Read a {...} group starting at s[i] == '{'; returns (content,
    index past the closing brace), brace-balanced."""
    depth = 0
    j = i
    while j < len(s):
        if s[j] == "\\" and j + 1 < len(s):
            j += 2
            continue
        if s[j] == "{":
            depth += 1
        elif s[j] == "}":
            depth -= 1
            if depth == 0:
                return s[i + 1 : j], j + 1
        j += 1
    return s[i + 1 :], len(s)  # unbalanced: forgiving


def latex_to_text(raw: str) -> dict:
    """Extract {text, title, n_math, n_figures, n_cites} per the
    detex conventions above. Paragraphs (blank-line separated)
    join with single newlines; intra-paragraph whitespace
    collapses."""
    s = _strip_comments(raw)
    out: list[str] = []
    state = {"math": 0, "figs": 0, "cites": 0, "title": ""}

    def walk(s: str) -> str:
        buf: list[str] = []
        i, n = 0, len(s)
        while i < n:
            c = s[i]
            if c == "$":
                if s[i + 1 : i + 2] == "$":
                    j = s.find("$$", i + 2)
                    i = (j + 2) if j >= 0 else n
                else:
                    j = s.find("$", i + 1)
                    i = (j + 1) if j >= 0 else n
                state["math"] += 1
                continue
            if c == "\\":
                nxt = s[i + 1 : i + 2]
                if nxt in "%&_#$":
                    buf.append(nxt)
                    i += 2
                    continue
                if nxt == "\\":
                    buf.append("\n")
                    i += 2
                    continue
                if nxt == "(":
                    j = s.find("\\)", i + 2)
                    i = (j + 2) if j >= 0 else n
                    state["math"] += 1
                    continue
                if nxt == "[":
                    j = s.find("\\]", i + 2)
                    i = (j + 2) if j >= 0 else n
                    state["math"] += 1
                    continue
                m = _CMD.match(s, i)
                if not m:
                    i += 2
                    continue
                name = m.group(1)
                i = m.end()
                if name == "begin":
                    if i < n and s[i] == "{":
                        env, i = _read_group(s, i)
                        endtok = "\\end{" + env + "}"
                        if env in _SKIP_ENVS or env in _MATH_ENVS:
                            j = s.find(endtok, i)
                            i = (j + len(endtok)) if j >= 0 else n
                            if env in _SKIP_ENVS:
                                state["figs"] += 1
                            else:
                                state["math"] += 1
                    continue
                if name == "end":
                    if i < n and s[i] == "{":
                        _env, i = _read_group(s, i)
                    continue
                if name == "item":
                    buf.append("\n")
                    continue
                # optional [...] argument
                if i < n and s[i] == "[":
                    j = s.find("]", i)
                    i = (j + 1) if j >= 0 else n
                arg = None
                if i < n and s[i] == "{":
                    arg, i = _read_group(s, i)
                if name in _DROP_ARG:
                    if name.startswith("cite"):
                        state["cites"] += 1
                    continue
                if arg is not None:
                    inner = walk(arg)
                    if name == "title":
                        state["title"] = " ".join(inner.split())
                    if name in _KEEP_ARG or name not in _DROP_ARG:
                        buf.append(inner)
                continue
            if c == "~":
                buf.append(" ")
                i += 1
                continue
            if c in "{}":
                i += 1
                continue
            buf.append(c)
            i += 1
        return "".join(buf)

    flat = walk(s)
    paras = [
        " ".join(p.split())
        for p in re.split(r"\n\s*\n", flat)
    ]
    out = [p for p in paras if p]
    return {
        "text": "\n".join(out),
        "title": state["title"],
        "n_math": state["math"],
        "n_figures": state["figs"],
        "n_cites": state["cites"],
    }


# ------------------------------------------------------------ fixture

_PARA_WORDS = 14


def build_latex_fixture(text: str, digest: str) -> str:
    """Deterministic LaTeX for q_cc_latex: \\title = first 4 words,
    one \\section = next 3 words (wrapping), body = remaining words
    in 14-word paragraphs; ONE math fragment, ONE figure
    environment and ONE \\cite that must all VANISH from prose. The
    markup FORM rotates on md5 nibble (`digest[-3]` % 4) while
    extracted prose stays IDENTICAL:

    - 0 plain: \\textbf/\\emph on the first paragraph's words,
      inline ``$…$`` math, figure env, \\cite;
    - 1 comments-and-escapes: every paragraph followed by a
      ``% comment`` line, ``~`` ties in the section arg, display
      ``\\[…\\]`` math;
    - 2 environments: body paragraphs inside abstract/itemize
      (\\item per paragraph), ``equation`` env math, \\footnote
      junk that must vanish;
    - 3 nesting: \\mbox{\\textit{…}} nesting on first words,
      ``$$…$$`` math, a starred figure* env."""
    words = text.split(" ")
    form = int(digest[-3], 16) % 4
    title = " ".join(words[:4])
    sec = " ".join(words[k % len(words)] for k in range(4, 7))
    rest = words[4:] or words
    paras = [
        " ".join(rest[i : i + _PARA_WORDS])
        for i in range(0, len(rest), _PARA_WORDS)
    ]
    fig = (
        "\\begin{figure}\\includegraphics{x.pdf}"
        "\\caption{NOT PROSE}\\end{figure}"
    )
    cite = "\\cite{key" + digest[:4] + "}"
    body: list[str] = []
    for k, p in enumerate(paras):
        pw = p.split(" ")
        if k == 0:
            if form == 0:
                pw[0] = "\\textbf{" + pw[0] + "}"
                if len(pw) > 1:
                    pw[1] = "\\emph{" + pw[1] + "}"
            elif form == 3:
                pw[0] = "\\mbox{\\textit{" + pw[0] + "}}"
        p2 = " ".join(pw)
        if form == 2:
            p2 = "\\item " + p2
        body.append(p2)
        if form == 1:
            body.append("% a comment line that must vanish")
        body.append("")
    math = {
        0: "$e = mc^2$",
        1: "\\[ \\int_0^1 x\\,dx \\]",
        2: "\\begin{equation}a^2+b^2=c^2\\end{equation}",
        3: "$$\\sum_i x_i$$",
    }[form]
    sec_arg = sec.replace(" ", "~") if form == 1 else sec
    fig_env = fig.replace("figure", "figure*") if form == 3 else fig
    parts = [
        "\\documentclass{article}",
        "\\title{" + title + "}",
        "\\begin{document}",
        "\\maketitle",
        "",
        "\\section{" + sec_arg + "}",
        "",
    ]
    if form == 2:
        parts.append("\\begin{abstract}")
    if form == 2:
        parts.append("\\begin{itemize}")
    parts.extend(body)
    if form == 2:
        parts.append("\\end{itemize}")
        parts.append("\\end{abstract}")
        parts.append(
            "\\footnote{margin junk that must vanish}%"
        )
    parts.append(math + " " + cite)
    parts.append("")
    parts.append(fig_env)
    parts.append("\\end{document}")
    return "\n".join(parts) + "\n"


def _expected_latex(text: str, digest: str) -> dict:
    words = text.split(" ")
    title = " ".join(words[:4])
    sec = " ".join(words[k % len(words)] for k in range(4, 7))
    rest = words[4:] or words
    paras = [
        " ".join(rest[i : i + _PARA_WORDS])
        for i in range(0, len(rest), _PARA_WORDS)
    ]
    return {
        "text": "\n".join([title, sec] + paras),
        "title": title,
        "n_math": 1,
        "n_figures": 1,
        "n_cites": 1,
    }
