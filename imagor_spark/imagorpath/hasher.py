"""Result-storage key hashers — bit-exact with the reference.

Re-expression of /root/reference/imagorpath/hasher.go:36-104. Pinned vectors
(imagorpath/hasher_test.go:10-17): ``parse("fit-in/16x17/foobar")`` →

* digest:      ``d5/c2/804e5d81c475bee50f731db17ee613f43262``
* suffix:      ``foobar.d5c2804e5d81c475bee5``
* size-suffix: ``foobar.d5c2804e5d81c475bee5_16x17``

These keys name result rows in the sink table (the reference's result
storage); the streaming dedup/anti-join plane keys off the same values.
"""

from __future__ import annotations

import hashlib

from .generate import generate_path
from .params import Params


def hex_digest_path(path: str) -> str:
    """sha1 hex as ``aa/bb/rest`` (hasher.go:36-40)."""
    h = hashlib.sha1(path.encode("utf-8", errors="surrogateescape")).hexdigest()
    return h[:2] + "/" + h[2:4] + "/" + h[4:]


def digest_storage_hasher(image: str) -> str:
    """hasher.go:42-43."""
    return hex_digest_path(image)


def _canonical_path(p: Params) -> str:
    return p.path if p.path else generate_path(p)


def digest_result_storage_hasher(p: Params) -> str:
    """hasher.go:46-51."""
    return hex_digest_path(_canonical_path(p))


def _suffix_ext(p: Params) -> tuple[str, str, bool]:
    """Shared ext-resolution: returns (stem, ext, has_ext)."""
    dot = p.image.rfind(".")
    slash = p.image.rfind("/")
    if dot > -1 and slash < dot:
        ext = p.image[dot:]
        if p.meta:
            ext = ".json"
        else:
            for f in p.filters:
                if f.name == "format":
                    ext = "." + f.args
        return p.image[:dot], ext, True
    return p.image, "", False


def suffix_result_storage_hasher(p: Params) -> str:
    """hasher.go:54-76 — ``/abc/def.{digest20}.ext``."""
    path = _canonical_path(p)
    digest = hashlib.sha1(path.encode("utf-8", errors="surrogateescape")).hexdigest()
    h = "." + digest[:20]
    stem, ext, has_ext = _suffix_ext(p)
    if has_ext:
        return stem + h + ext
    return stem + h


def size_suffix_result_storage_hasher(p: Params) -> str:
    """hasher.go:79-104 — ``/abc/def.{digest20}_{w}x{h}.ext``."""
    path = _canonical_path(p)
    digest = hashlib.sha1(path.encode("utf-8", errors="surrogateescape")).hexdigest()
    h = "." + digest[:20]
    if p.width != 0 or p.height != 0:
        h += "_%dx%d" % (p.width, p.height)
    stem, ext, has_ext = _suffix_ext(p)
    if has_ext:
        return stem + h + ext
    return stem + h
