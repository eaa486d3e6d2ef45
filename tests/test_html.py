"""HTML extraction kernel (functions/html.py): fixture round trip,
link-density boilerplate behavior on hand-written pages, and the
no-exception contract on malformed input."""

import hashlib
import random
import string

from core_spark.functions.html import build_html_fixture, html_to_text


def _roundtrip(text: str) -> dict:
    digest = hashlib.md5(text.encode("utf-8")).hexdigest()
    return html_to_text(build_html_fixture(text, digest)), digest


def test_fixture_roundtrip_recovers_text():
    text = ("the quick brown fox jumps over the lazy dog " * 7).strip()
    out, d = _roundtrip(text)
    k = 3 + int(d[0:2], 16) % 7
    words = text.split(" ")
    assert out["text"] == text
    assert out["title"] == "Doc " + d[:8]
    assert out["n_links"] == k + 2
    assert out["blocks_kept"] == (len(words) + 19) // 20
    assert out["blocks_dropped"] == 2  # nav + footer


def test_entities_round_trip_through_escape():
    text = "a < b & c > d \"quoted\" 'single' &amp; literal"
    out, _ = _roundtrip(text)
    assert out["text"] == text


def test_link_density_keeps_prose_drops_nav():
    page = (
        "<html><body>"
        '<p>Read the <a href="/x">full paper</a> for details on the '
        "method and the results we report.</p>"
        '<nav><a href="/">home</a> <a href="/b">blog</a> '
        '<a href="/c">about</a></nav>'
        "</body></html>"
    )
    out = html_to_text(page)
    assert "full paper" in out["text"]  # prose with a link is kept
    assert "home" not in out["text"]  # pure-link nav is boilerplate
    assert out["blocks_kept"] == 1 and out["blocks_dropped"] == 1
    assert out["n_links"] == 4


def test_script_style_title_never_leak():
    page = (
        "<html><head><title>T</title>"
        "<style>p{color:red}</style>"
        "<script>var secret = 'LEAK';</script></head>"
        "<body><p>visible words only</p>"
        "<script>document.write('ALSO LEAK')</script></body></html>"
    )
    out = html_to_text(page)
    assert out["text"] == "visible words only"
    assert out["title"] == "T"
    assert "LEAK" not in out["text"] and "color" not in out["text"]


def test_malformed_html_never_raises():
    rnd = random.Random(31)
    fixed = [
        "", "plain text no tags", "<p><b>unclosed everything",
        "<<<>>>", "<a href='x>broken</p>", "</div></div><p>stray</p>",
        "<script>never closed", "&#xZZ; &unknown; &#120;",
    ]
    for s in fixed:
        html_to_text(s)  # must not raise
    alphabet = string.printable
    for _ in range(500):
        s = "".join(
            rnd.choice(alphabet) for _ in range(rnd.randrange(0, 200))
        )
        html_to_text(s)  # fuzz: recovering tokenizer, no exceptions


# ----------------------------------------------------- link extraction
def test_extract_links_pairs_and_skip_subtrees():
    from core_spark.functions.html import extract_links

    page = (
        "<html><body><p><a href='/a'>one  two</a> and "
        "<a href='https://x.org/p'>Out &amp; About</a></p>"
        "<script>var a = '<a href=\"/fake\">no</a>';</script>"
        "<a>no href</a></body></html>"
    )
    links = extract_links(page)
    assert ("/a", "one two") in links
    assert ("https://x.org/p", "Out & About") in links
    assert all("fake" not in h for h, _ in links)
    # anchor with no href records empty href, never crashes
    assert ("", "no href") in links


def test_link_fixture_edges_match_md5_derivation():
    from core_spark.functions.html import build_link_fixture, extract_links
    import hashlib

    text = " ".join(f"w{i}" for i in range(30))
    d = hashlib.md5(text.encode()).hexdigest()
    ext = [
        (h, a)
        for h, a in extract_links(build_link_fixture(text, d))
        if h.startswith("https://")
    ]
    m = 2 + int(d[3], 16) % 3
    assert len(ext) == m
    for j, (href, anchor) in enumerate(ext):
        assert href == f"https://example{d[4+2*j:6+2*j]}.org/p{j}"
        assert anchor == f"w{j}"
