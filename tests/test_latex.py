"""LaTeX extraction pins: form round-trips plus the individual
detex semantics — comment stripping with escaped percents, all four
math grammars, argument keep/drop classes, footnote and
figure-environment exclusion, nesting, escapes — and the
forgiving-input convention."""

from __future__ import annotations

import hashlib

from core_spark.functions.latex import (
    _expected_latex,
    build_latex_fixture,
    latex_to_text,
)


def test_all_forms_round_trip():
    seen = set()
    for i in range(160):
        t = " ".join(f"w{i}x{k}" for k in range(1 + i % 45))
        h = hashlib.md5(t.encode()).hexdigest()
        seen.add(int(h[-3], 16) % 4)
        got = latex_to_text(build_latex_fixture(t, h))
        want = _expected_latex(t, h)
        for key in ("text", "title", "n_math", "n_figures", "n_cites"):
            assert got[key] == want[key], key
    assert seen == {0, 1, 2, 3}


def test_comments_strip_escaped_percent_stays():
    m = latex_to_text("50\\% of text % the rest vanishes\nnext\n")
    assert m["text"] == "50% of text next"


def test_math_grammars_counted_and_removed():
    m = latex_to_text(
        "a $x+y$ b \\(z\\) c \\[ w \\] d $$v$$ e "
        "\\begin{equation}u\\end{equation} f\n"
    )
    assert m["text"] == "a b c d e f"
    assert m["n_math"] == 5


def test_keep_and_drop_argument_classes():
    m = latex_to_text(
        "\\section{Intro} \\textbf{bold} \\emph{it} "
        "\\cite{k1} \\ref{fig:1} \\label{s:1} body\n"
    )
    assert m["text"] == "Intro bold it body"
    assert m["n_cites"] == 1


def test_footnote_and_figure_excluded():
    m = latex_to_text(
        "keep\\footnote{GONE} text\n"
        "\\begin{figure}\\caption{ALSO GONE}\\end{figure}\nmore\n"
    )
    assert "GONE" not in m["text"]
    assert m["text"] == "keep text\nmore"
    assert m["n_figures"] == 1


def test_nesting_and_escapes():
    m = latex_to_text(
        "\\mbox{\\textit{nested {deep}}} and A~B and a\\_b \\$5\n"
    )
    assert m["text"] == "nested deep and A B and a_b $5"


def test_title_captured_and_in_prose():
    m = latex_to_text("\\title{My Paper}\n\\maketitle\nbody\n")
    assert m["title"] == "My Paper"
    assert m["text"].startswith("My Paper")


def test_itemize_keeps_items():
    m = latex_to_text(
        "\\begin{itemize}\\item one\\item two\\end{itemize}\n"
    )
    assert "one" in m["text"] and "two" in m["text"]


def test_forgiving_never_raises():
    for raw in (
        "",
        "\\begin{figure} unterminated",
        "{unbalanced",
        "$ unclosed math",
        "\\",
    ):
        latex_to_text(raw)  # must not raise
