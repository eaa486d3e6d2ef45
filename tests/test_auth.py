"""KeyedAuth: pre-shared-key JWT authorization (auth/auth.go port) —
unit semantics plus the gateway's verb→capability enforcement."""

import base64
import json
import urllib.error
import urllib.request

import pytest

from core_spark import auth as A
from core_spark.catalog import LabelSelector

K1 = base64.b64encode(b"k1-secret-material").decode()
K2 = base64.b64encode(b"k2-secret-material").decode()


def test_sign_verify_roundtrip_and_capability_bits():
    ka = A.KeyedAuth(K1)
    tok = ka.authorize(A.READ | A.LIST, now=1000)
    claims = ka.verify(tok, A.READ, now=1001)
    assert claims.capability == A.READ | A.LIST
    claims = ka.verify(tok, A.READ | A.LIST, now=1001)
    assert claims.allows_journal("any/journal")  # no selector claim
    with pytest.raises(A.AuthError, match="missing required APPEND"):
        ka.verify(tok, A.APPEND, now=1001)


def test_key_rotation_first_signs_any_verifies():
    old = A.KeyedAuth(K1)
    # rollout: new signer first, old key still verifies old tokens
    rotated = A.KeyedAuth(f"{K2} {K1}")
    tok_old = old.authorize(A.READ, now=1000)
    tok_new = rotated.authorize(A.READ, now=1000)
    assert rotated.verify(tok_old, A.READ, now=1001).capability == A.READ
    assert rotated.verify(tok_new, A.READ, now=1001).capability == A.READ
    # the old verifier does NOT accept new-key tokens
    with pytest.raises(A.AuthError, match="signature mismatch"):
        old.verify(tok_new, A.READ, now=1001)


def test_expiry_required_leeway_and_missing_header():
    ka = A.KeyedAuth(K1)
    tok = ka.authorize(A.READ, exp_seconds=60, now=1000)
    assert ka.verify(tok, A.READ, now=1064).exp == 1060  # inside leeway
    with pytest.raises(A.AuthError, match="expired"):
        ka.verify(tok, A.READ, now=1066)
    with pytest.raises(A.AuthError, match="missing or empty"):
        ka.verify(None, A.READ)
    # AA== rollout value admits missing headers with required cap only
    ka2 = A.KeyedAuth(f"{K1},AA==")
    assert ka2.verify(None, A.READ).capability == A.READ


def test_tamper_and_alg_rejection():
    ka = A.KeyedAuth(K1)
    tok = ka.authorize(A.READ, now=1000)
    h, p, s = tok.split(".")
    forged_p = A._b64u(json.dumps({"cap": A.ALL, "exp": 9_999_999_999}).encode())
    with pytest.raises(A.AuthError, match="signature mismatch"):
        ka.verify(f"{h}.{forged_p}.{s}", A.READ, now=1001)
    none_h = A._b64u(json.dumps({"alg": "none", "typ": "JWT"}).encode())
    with pytest.raises(A.AuthError, match="not allowed"):
        ka.verify(f"{none_h}.{p}.{s}", A.READ, now=1001)


def test_selector_scoped_claims():
    ka = A.KeyedAuth(K1)
    sel = LabelSelector(prefix_includes={"prefix": ("api/",)})
    tok = ka.authorize(A.READ, selector=sel, now=1000)
    claims = ka.verify(tok, A.READ, now=1001)
    assert claims.allows_journal("api/events")
    assert not claims.allows_journal("other/events")


@pytest.fixture()
def authed_gw(spark, tmp_path):
    from core_spark.gateway import JournalGateway

    ka = A.KeyedAuth(K1)
    g = JournalGateway(spark, str(tmp_path / "journals"), auth=ka)
    host, port = g.start()
    yield ka, f"http://{host}:{port}"
    g.stop()


def _req(base, path, token=None, method="GET", data=None):
    headers = {"Authorization": f"Bearer {token}"} if token else {}
    req = urllib.request.Request(
        f"{base}{path}", headers=headers, method=method,
        data=data.encode() if data else None,
    )
    with urllib.request.urlopen(req) as resp:
        return resp.status, resp.read().decode()


def test_gateway_enforces_verb_capabilities(authed_gw):
    ka, base = authed_gw
    w = ka.authorize(A.APPEND)
    r = ka.authorize(A.READ | A.LIST)
    scoped = ka.authorize(
        A.READ, selector=LabelSelector(prefix_includes={"prefix": ("api/",)})
    )

    # no token -> 401 on every verb
    for path, method in (("/journals", "GET"), ("/jnl/api/x", "GET")):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _req(base, path, method=method)
        assert ei.value.code == 401

    # append needs APPEND; READ token is rejected with the named cap
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(base, "/jnl/api/x", token=r, method="PUT",
             data=json.dumps({"a": 1}))
    assert ei.value.code == 401
    assert "APPEND" in ei.value.read().decode()
    s, _ = _req(base, "/jnl/api/x", token=w, method="PUT",
                data=json.dumps({"a": 1}))
    assert s == 200

    # read + list with the read token
    s, body = _req(base, "/jnl/api/x", token=r)
    assert s == 200 and json.loads(body.splitlines()[0])["a"] == 1
    s, body = _req(base, "/journals", token=r)
    assert s == 200 and json.loads(body)[0]["name"] == "api/x"

    # selector scope: api/ allowed, anything else 403
    s, _ = _req(base, "/jnl/api/x", token=scoped)
    assert s == 200
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(base, "/jnl/other/x", token=scoped)
    assert ei.value.code == 403


def test_malformed_token_shapes_are_auth_errors_not_crashes():
    """Attacker-controlled JSON in any segment must raise AuthError
    (the gateway's 401), never AttributeError/TypeError."""
    ka = A.KeyedAuth(K1)
    arr = A._b64u(b"[]")
    obj = A._b64u(b"{}")
    for tok in (
        f"{arr}.{obj}.AA",                      # header not a dict
        f"{obj}.{arr}.AA",                      # claims not a dict
        "only-two.parts",
        "..",
        A._b64u(b'{"alg":"HS256"}') + "." + A._b64u(b'{"exp":"soon"}') + ".AA",
    ):
        with pytest.raises(A.AuthError):
            ka.verify(tok, A.READ, now=1000)
    # malformed sel claim on a correctly-signed token
    import json as _json

    now = 1000
    claims = {"cap": A.READ, "iat": now, "exp": now + 60, "sel": {"include": 7}}
    h = A._b64u(_json.dumps({"alg": "HS256", "typ": "JWT"}).encode())
    p = A._b64u(_json.dumps(claims, sort_keys=True).encode())
    sig = A._b64u(A._sign(ka.keys[0], f"{h}.{p}".encode()))
    with pytest.raises(A.AuthError, match="sel"):
        ka.verify(f"{h}.{p}.{sig}", A.READ, now=now)


def test_gateway_listing_respects_selector_and_bad_requests_are_400(authed_gw):
    ka, base = authed_gw
    w = ka.authorize(A.APPEND)
    _req(base, "/jnl/api/x", token=w, method="PUT", data=json.dumps({"a": 1}))
    _req(base, "/jnl/other/y", token=w, method="PUT", data=json.dumps({"b": 2}))

    scoped = ka.authorize(
        A.READ | A.LIST,
        selector=LabelSelector(prefix_includes={"prefix": ("api/",)}),
    )
    s, body = _req(base, "/journals", token=scoped)
    assert [j["name"] for j in json.loads(body)] == ["api/x"]

    # request-shaped failures are clean 400s, not dropped connections
    r = ka.authorize(A.READ)
    for path in (
        "/jnl/api/x?where=nosuchcol=1",
        "/jnl/api/x?begin=notanint",
        "/jnl/api/x?where=garbage",
    ):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _req(base, path, token=r)
        assert ei.value.code == 400, path
