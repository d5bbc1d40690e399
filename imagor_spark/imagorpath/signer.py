"""HMAC path signer — bit-exact with the reference.

Re-expression of /root/reference/imagorpath/signer.go:16-43. The signature
is standard-base64url **with padding** (Go ``base64.URLEncoding``), optionally
truncated to a string length. Pinned vectors (imagorpath/params_test.go):

* sha1, secret "1234",
  "meta/10x11:12x13/fit-in/-300x-200/5x6/left/top/smart/filters:some_filter()/img"
  → ``VTAq7YIRbEXgtwAcsTMhAjvBuT8=``            (params_test.go:370-376)
* sha256/40, secret "1234", same path
  → ``XBCO7esuLsNQuSF2v9ie36pESRGx2rzLjhUxXWnV`` (params_test.go:398-404)
* sha256/28, secret "abcd", path "assfasf"
  → ``zb6uWXQxwJDOe_zOgxkuj96Etrsz``             (params_test.go:634-637)
"""

from __future__ import annotations

import base64
import hashlib
import hmac

_ALGS = {
    "sha1": hashlib.sha1,
    "sha256": hashlib.sha256,
    "sha512": hashlib.sha512,
}


class HMACSigner:
    """signer.go:21-43."""

    def __init__(self, alg: str = "sha1", truncate: int = 0, secret: str = ""):
        if alg not in _ALGS:
            raise ValueError(f"unsupported HMAC alg: {alg}")
        self.alg = alg
        self.truncate = truncate
        self.secret = secret.encode("utf-8")

    def sign(self, path: str) -> str:
        digest = hmac.new(self.secret, path.encode("utf-8"), _ALGS[self.alg]).digest()
        sig = base64.urlsafe_b64encode(digest).decode("ascii")
        if self.truncate > 0 and len(sig) > self.truncate:
            return sig[: self.truncate]
        return sig


def new_default_signer(secret: str) -> HMACSigner:
    """SHA1, no truncation (signer.go:16-18)."""
    return HMACSigner("sha1", 0, secret)


def sign(path: str, secret: str, alg: str = "sha1", truncate: int = 0) -> str:
    """Convenience functional form used inside vectorized UDFs."""
    return HMACSigner(alg, truncate, secret).sign(path)
