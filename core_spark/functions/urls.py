"""URL canonicalization — the crawl-dedup normalization step that
runs right after the WARC walk: two fetches of the same page differ
by host case, default ports, fragments, tracking parameters and
query order, and a URL-keyed exact dedup only works after collapsing
those. Pure stdlib (urllib.parse), per the public RFC 3986
normalization rules plus the de-facto tracking-param strip every
crawl pipeline applies.

Rules applied by canonical_url (each is standard, none is lossy for
dedup purposes):
- scheme and host lowercased; a trailing dot on the host dropped
- default ports stripped (http:80, https:443)
- the fragment dropped (never sent to the server)
- known tracking parameters dropped (utm_*, gclid, fbclid, ref)
- remaining query parameters sorted by (key, value) — order is
  semantically irrelevant but breaks byte equality
- duplicate-preserving: repeated keys survive, sorted stably
- empty path normalized to "/"
- percent-encoding case normalized: %XX hex uppercased in the path
  (RFC 3986 §6.2.2.1); the query is normalized by its parse/unparse
  round trip

Reference parity: gazette/core ships opaque serializations only
(message/interfaces.go:121-124); normalization is executor-side
kernel work.
"""

from __future__ import annotations

import re
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_TRACKING = {"gclid", "fbclid", "ref", "mc_cid", "mc_eid", "igshid"}
_PCT = re.compile(r"%[0-9a-fA-F]{2}")


def canonical_url(url: str) -> str:
    """Normalize a URL per the module rules. Malformed input is
    returned lowercase-stripped rather than raising — a crawl list
    is full of junk and a canonicalizer that throws loses rows a
    dedup should still see."""
    try:
        parts = urlsplit(url.strip())
        scheme = parts.scheme.lower()
        host = (parts.hostname or "").lower().rstrip(".")
        port = parts.port  # raises ValueError on a non-numeric port
        netloc = host
        if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
            netloc = f"{host}:{port}"
        if parts.username:
            cred = parts.username + (
                f":{parts.password}" if parts.password else ""
            )
            netloc = f"{cred}@{netloc}"
        # RFC 3986 §6.2.2.1 case normalization: percent-escape hex
        # digits uppercase in the PATH too (the query is normalized
        # by its parse/unparse round trip below) — '/a%2fb' and
        # '/a%2Fb' are the same page and must dedup together.
        path = _PCT.sub(lambda m: m.group(0).upper(), parts.path) or "/"
        q = [
            (k, v)
            for k, v in parse_qsl(parts.query, keep_blank_values=True)
            if not (k.startswith("utm_") or k in _TRACKING)
        ]
        q.sort()
        return urlunsplit((scheme, netloc, path, urlencode(q), ""))
    except ValueError:
        return url.strip().lower()
