"""URL canonicalization kernel (functions/urls.py)."""

from core_spark.functions.urls import canonical_url


def test_case_port_fragment_rules():
    assert (
        canonical_url("HTTP://Host.COM.:80/Path?x=1#frag")
        == "http://host.com/Path?x=1"
    )
    # non-default port survives; path case survives
    assert (
        canonical_url("https://Host.com:8443/A/B")
        == "https://host.com:8443/A/B"
    )
    # empty path normalizes to /
    assert canonical_url("https://h.com") == "https://h.com/"


def test_tracking_strip_and_query_sort():
    assert (
        canonical_url(
            "https://h.com/p?b=2&utm_source=x&utm_medium=y&gclid=g"
            "&fbclid=f&a=1"
        )
        == "https://h.com/p?a=1&b=2"
    )
    # repeated keys survive, sorted stably by (key, value)
    assert (
        canonical_url("https://h.com/p?z=1&z=0&a=")
        == "https://h.com/p?a=&z=0&z=1"
    )


def test_credentials_and_idempotence():
    u = canonical_url("https://user:pw@Host.com/x?b=1&a=2")
    assert u == "https://user:pw@host.com/x?a=2&b=1"
    # canonicalization is idempotent
    assert canonical_url(u) == u


def test_malformed_never_raises():
    for junk in (
        "", "not a url", "http://", "://x", "http://[broken",
        "a b c", "https://h.com:notaport/x",
    ):
        canonical_url(junk)  # must not raise


def test_path_percent_escape_case_collapses():
    """RFC 3986 §6.2.2.1: %XX hex case in the PATH is normalized
    (uppercase), so escape-case variants of one page dedup together;
    malformed %-sequences pass through untouched."""
    assert canonical_url("https://h.com/a%2Fb") == canonical_url(
        "https://h.com/a%2fb"
    )
    assert canonical_url("https://h.com/a%2fb") == "https://h.com/a%2Fb"
    assert canonical_url("https://h.com/a%zz") == "https://h.com/a%zz"
    u = canonical_url("https://h.com/x%2fy%0A?b=1&a=2")
    assert canonical_url(u) == u
