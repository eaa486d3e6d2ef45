"""Pre-shared-key authorization for the HTTP gateway — the engine's
port of the reference's `auth` package (auth/auth.go:29-46 KeyedAuth,
68-75 Verify, 109-181 verifyWithKeys/verifyCapability) built on the
public JWT HS256 construction with only stdlib (hmac + sha256 +
base64url).

Semantics mirrored:
- Keys are base64, whitespace/comma separated; the FIRST key signs and
  ANY key verifies (zero-downtime rotation: push the new key as a
  verifier everywhere, then promote it to signer).
- The special value ``AA==`` (base64 of one zero byte) allows requests
  with no Authorization header — the rollout escape hatch — granting
  exactly the required capability for one hour.
- Claims carry a capability bitmask (LIST/APPLY/READ/APPEND, same bit
  values as broker/protocol) and an optional label SELECTOR scoping
  which journals the token may touch (claims.Selector in the
  reference); expiry is REQUIRED, verification applies a 5 s leeway.
- Failed verification surfaces the reference's per-capability message
  ("authorization is missing required READ capability").
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time
from dataclasses import dataclass, field

from core_spark.catalog import JournalSpec, LabelSelector

# Capability bit values per broker/protocol (auth.go / protocol pkg).
LIST = 1 << 1
APPLY = 1 << 2
READ = 1 << 3
APPEND = 1 << 4
ALL = (1 << 32) - 1

_CAP_NAMES = ((LIST, "LIST"), (APPLY, "APPLY"), (READ, "READ"), (APPEND, "APPEND"))
_LEEWAY = 5  # seconds, auth.go jwt.WithLeeway


class AuthError(Exception):
    """Verification failure; the gateway answers 401."""


@dataclass
class Claims:
    capability: int
    selector: LabelSelector | None = None
    exp: int = 0
    iat: int = 0
    extra: dict = field(default_factory=dict)

    def allows_journal(self, name: str) -> bool:
        """Selector-scoped claims gate individual journals by their
        name meta-label (the reference resolves claims.Selector
        against the journal's labels; name/prefix meta-labels cover
        the catalog-less gateway case)."""
        if self.selector is None:
            return True
        return self.selector.matches(JournalSpec(name=name))


def _b64u(b: bytes) -> str:
    return base64.urlsafe_b64encode(b).rstrip(b"=").decode()


def _unb64u(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def _sel_to_json(sel: LabelSelector) -> dict:
    return {
        "include": {k: list(v) for k, v in sel.include.items()},
        "exclude": {k: list(v) for k, v in sel.exclude.items()},
        "prefix": {k: list(v) for k, v in sel.prefix_includes.items()},
    }


def _sel_from_json(d: dict) -> LabelSelector:
    return LabelSelector(
        include={k: tuple(v) for k, v in d.get("include", {}).items()},
        exclude={k: tuple(v) for k, v in d.get("exclude", {}).items()},
        prefix_includes={k: tuple(v) for k, v in d.get("prefix", {}).items()},
    )


def _sign(key: bytes, msg: bytes) -> bytes:
    return hmac.new(key, msg, hashlib.sha256).digest()


class KeyedAuth:
    """Symmetric pre-shared-key signer/verifier (auth.go KeyedAuth)."""

    def __init__(self, base64_keys: str):
        self.keys: list[bytes] = []
        self.allow_missing = False
        for part in base64_keys.replace(",", " ").split():
            if part == "AA==":
                self.allow_missing = True
            else:
                self.keys.append(base64.b64decode(part))
        if not self.keys:
            raise ValueError("at least one key must be provided")

    # ------------------------------------------------------------- sign
    def authorize(
        self,
        capability: int,
        selector: LabelSelector | None = None,
        exp_seconds: int = 3600,
        now: int | None = None,
    ) -> str:
        """Mint a Bearer token (auth.go Authorize): HS256-signed JWT
        with iat/exp stamped here and capability/selector claims."""
        now = int(time.time()) if now is None else now
        claims: dict = {"cap": capability, "iat": now, "exp": now + exp_seconds}
        if selector is not None:
            claims["sel"] = _sel_to_json(selector)
        header = _b64u(json.dumps({"alg": "HS256", "typ": "JWT"}).encode())
        payload = _b64u(json.dumps(claims, sort_keys=True).encode())
        signing = f"{header}.{payload}".encode()
        return f"{header}.{payload}.{_b64u(_sign(self.keys[0], signing))}"

    # ----------------------------------------------------------- verify
    def verify(
        self, bearer: str | None, require: int, now: int | None = None
    ) -> Claims:
        """Verify a Bearer token against ANY key and the required
        capability (auth.go verifyWithKeys). `bearer` is the token
        itself (the gateway strips the 'Bearer ' prefix); None means
        the header was absent."""
        now = int(time.time()) if now is None else now
        if bearer is None:
            if self.allow_missing:
                return Claims(capability=require, exp=now + 3600, iat=now)
            raise AuthError("missing or empty Authorization token")

        parts = bearer.split(".")
        if len(parts) != 3:
            raise AuthError("verifying Authorization: malformed token")
        header_b64, payload_b64, sig_b64 = parts
        try:
            header = json.loads(_unb64u(header_b64))
            claims = json.loads(_unb64u(payload_b64))
            sig = _unb64u(sig_b64)
        except (ValueError, json.JSONDecodeError) as e:
            raise AuthError(f"verifying Authorization: {e}") from e
        # Attacker-controlled JSON: ANY malformed shape (non-dict
        # segments, non-numeric exp/iat/cap) must be an AuthError the
        # gateway turns into 401, never an AttributeError/ValueError
        # that aborts the handler thread mid-connection.
        if not isinstance(header, dict) or not isinstance(claims, dict):
            raise AuthError("verifying Authorization: malformed token")
        for k in ("exp", "iat", "cap"):
            if k in claims and not isinstance(claims[k], (int, float)):
                raise AuthError(
                    f"verifying Authorization: claim {k!r} is not numeric"
                )
        if "sel" in claims and not isinstance(claims["sel"], dict):
            raise AuthError("verifying Authorization: claim 'sel' is malformed")
        if header.get("alg") not in ("HS256",):
            raise AuthError(
                f"verifying Authorization: alg {header.get('alg')!r} not allowed"
            )
        signing = f"{header_b64}.{payload_b64}".encode()
        if not any(
            hmac.compare_digest(sig, _sign(k, signing)) for k in self.keys
        ):
            raise AuthError("verifying Authorization: signature mismatch")
        if "exp" not in claims:
            raise AuthError("verifying Authorization: exp claim is required")
        if now > int(claims["exp"]) + _LEEWAY:
            raise AuthError("verifying Authorization: token is expired")
        if "iat" in claims and now < int(claims["iat"]) - _LEEWAY:
            raise AuthError("verifying Authorization: token used before issued")

        actual = int(claims.get("cap", 0))
        if actual & require != require:
            for bit, cap_name in _CAP_NAMES:
                if require & bit and not actual & bit:
                    raise AuthError(
                        f"authorization is missing required {cap_name} capability"
                    )
            raise AuthError(
                "authorization is missing required capability "
                f"(have {actual:b}, but require {require:b})"
            )
        try:
            sel = _sel_from_json(claims["sel"]) if "sel" in claims else None
        except (TypeError, AttributeError) as e:
            raise AuthError("verifying Authorization: claim 'sel' is malformed") from e
        return Claims(
            capability=actual,
            selector=sel,
            exp=int(claims["exp"]),
            iat=int(claims.get("iat", 0)),
        )


class NoopAuth:
    """Verifier that admits everything (auth.go NewNoopAuth) — the
    default when a gateway is constructed without keys."""

    allow_missing = True

    def verify(self, bearer, require, now=None) -> Claims:
        return Claims(capability=require)
