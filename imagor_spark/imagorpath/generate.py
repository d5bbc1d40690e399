"""Params → canonical path string (inverse of parse).

Re-expression of /root/reference/imagorpath/generate.go:12-133. The
canonical path is the engine's result-cache key, so byte-parity with the
reference matters; property test ``parse(generate_path(p)) == p`` mirrors
imagorpath/params_test.go:13-605.
"""

from __future__ import annotations

import base64
import urllib.parse

import numpy as np

from .params import (
    H_ALIGN_LEFT,
    H_ALIGN_RIGHT,
    Params,
    TRIM_BY_BOTTOM_RIGHT,
    TRIM_BY_TOP_LEFT,
    V_ALIGN_BOTTOM,
    V_ALIGN_TOP,
)


def _fmt_float(v: float) -> str:
    """Go ``strconv.FormatFloat(v, 'f', -1, 64)``: shortest round-trip
    decimal, never exponent notation."""
    if v == int(v) and abs(v) < 1e16:
        return str(int(v))
    return np.format_float_positional(v, unique=True, trim="-")


_ESCAPE_PREFIXES = (
    "trim/",
    "meta/",
    "fit-in/",
    "stretch/",
    "top/",
    "left/",
    "right/",
    "bottom/",
    "center/",
    "smart/",
)


def generate_path(p: Params) -> str:
    """generate.go:12-119."""
    parts: list[str] = []
    if p.meta:
        parts.append("meta")
    if p.trim or p.trim_by in (TRIM_BY_TOP_LEFT, TRIM_BY_BOTTOM_RIGHT):
        trims = ["trim"]
        if p.trim_by == TRIM_BY_BOTTOM_RIGHT:
            trims.append("bottom-right")
        if p.trim_tolerance > 0:
            trims.append(str(p.trim_tolerance))
        parts.append(":".join(trims))
    if p.crop_top > 0 or p.crop_right > 0 or p.crop_left > 0 or p.crop_bottom > 0:
        parts.append(
            "%sx%s:%sx%s"
            % (
                _fmt_float(p.crop_left),
                _fmt_float(p.crop_top),
                _fmt_float(p.crop_right),
                _fmt_float(p.crop_bottom),
            )
        )
    if p.fit_in:
        fit = ""
        if p.adaptive_fit_in:
            fit += "adaptive-"
        if p.full_fit_in:
            fit += "full-"
        parts.append(fit + "fit-in")
    if p.stretch:
        parts.append("stretch")
    h_flip, v_flip, width, height = p.h_flip, p.v_flip, p.width, p.height
    if h_flip or width != 0 or v_flip or height != 0 or p.padding_left > 0 or p.padding_top > 0:
        if width < 0:
            h_flip = not h_flip
            width = -width
        if height < 0:
            v_flip = not v_flip
            height = -height
        parts.append(
            "%s%dx%s%d" % ("-" if h_flip else "", width, "-" if v_flip else "", height)
        )
    if p.padding_left > 0 or p.padding_top > 0 or p.padding_right > 0 or p.padding_bottom > 0:
        if p.padding_left == p.padding_right and p.padding_top == p.padding_bottom:
            parts.append("%dx%d" % (p.padding_left, p.padding_top))
        else:
            parts.append(
                "%dx%d:%dx%d"
                % (p.padding_left, p.padding_top, p.padding_right, p.padding_bottom)
            )
    if p.h_align in (H_ALIGN_LEFT, H_ALIGN_RIGHT):
        parts.append(p.h_align)
    if p.v_align in (V_ALIGN_TOP, V_ALIGN_BOTTOM):
        parts.append(p.v_align)
    if p.smart:
        parts.append("smart")
    if p.filters:
        parts.append("filters:" + ":".join("%s(%s)" % (f.name, f.args) for f in p.filters))
    if p.base64_image:
        encoded = base64.urlsafe_b64encode(
            p.image.encode("utf-8", errors="surrogateescape")
        ).rstrip(b"=")
        parts.append("b64:" + encoded.decode("ascii"))
    else:
        image = p.image
        if (
            "?" in image
            or "(" in image
            or ")" in image
            or "," in image
            or any(image.startswith(pre) for pre in _ESCAPE_PREFIXES)
        ):
            image = _go_path_escape(image)
        parts.append(image)
    return "/".join(parts)


_UPPER_HEX = "0123456789ABCDEF"


def _go_path_escape(s: str) -> str:
    """Go ``url.PathEscape`` (escapeMode encodePathSegment): alphanumerics,
    unreserved ``-_.~`` and sub-delims ``$&+:=@`` stay literal; ``/ ; , ?``
    and everything else (incl. ``!'()*`` and space) are %XX-escaped."""
    out: list[str] = []
    for b in s.encode("utf-8", errors="surrogateescape"):
        c = chr(b)
        if (
            ("a" <= c <= "z")
            or ("A" <= c <= "Z")
            or ("0" <= c <= "9")
            or c in "-_.~"
            or c in "$&+:=@"
        ):
            out.append(c)
        else:
            out.append("%" + _UPPER_HEX[b >> 4] + _UPPER_HEX[b & 15])
    return "".join(out)


# utility filters affect the response envelope (expiry header, download
# disposition), never the rendered bytes — the reference rebuilds p.Filters
# without them before regenerating the path that keys result storage
# (imagor.go:331-338, :377-379), so two ops differing only by these share
# one result-cache entry
UTILITY_FILTER_NAMES = ("expire", "attachment")


def result_path(p: Params) -> str:
    """Canonical path with utility filters stripped — the result-cache key
    basis (imagor.go:331-338,377-379). ``generate_path`` itself stays the
    full round-trip inverse of ``parse``; only storage keying uses this."""
    if any(f.name in UTILITY_FILTER_NAMES for f in p.filters):
        from dataclasses import replace

        p = replace(
            p, filters=[f for f in p.filters if f.name not in UTILITY_FILTER_NAMES]
        )
    return generate_path(p)


def generate_unsafe(p: Params) -> str:
    """generate.go:122-124."""
    return generate(p, None)


def generate(p: Params, signer) -> str:
    """generate.go:127-133; ``signer`` has a ``.sign(path) -> str``."""
    img_path = generate_path(p)
    if signer is not None:
        return signer.sign(img_path) + "/" + img_path
    return "unsafe/" + img_path
