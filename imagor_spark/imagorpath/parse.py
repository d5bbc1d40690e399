"""Parse an imagor-style ops path into :class:`Params`.

Faithful re-expression of the reference parser
(/root/reference/imagorpath/parse.go:11-281): same two regexes, same
group-index walk, same filter state machine — so every path the reference
accepts parses to the same structure here. Pinned against the reference's
table-driven tests (imagorpath/params_test.go:13-605) in
``tests/test_imagorpath.py``.
"""

from __future__ import annotations

import base64
import re
import urllib.parse

from .params import Filter, Params, TRIM_BY_TOP_LEFT

# parse.go:11-19
_PATH_REGEX = re.compile(
    "/*"
    # params
    "(params/)?"
    # hash
    "((unsafe/)|([A-Za-z0-9-_=]{17,})/)?"
    # path
    "(.+)?",
    re.DOTALL,
)

# parse.go:21-45
_PARAMS_REGEX = re.compile(
    "/*"
    # meta
    "(meta/)?"
    # trim
    "(trim(:(top-left|bottom-right))?(:(\\d+))?/)?"
    # crop
    "(((0?\\.)?\\d+)x((0?\\.)?\\d+):(([0-1]?\\.)?\\d+)x(([0-1]?\\.)?\\d+)/)?"
    # fit-in (adaptive-full-fit-in, adaptive-fit-in, full-fit-in, fit-in)
    "((adaptive-full-fit-in|adaptive-fit-in|full-fit-in|fit-in)/)?"
    # stretch
    "(stretch/)?"
    # dimensions
    "((\\-?)(\\d*)x(\\-?)(\\d*)/)?"
    # paddings
    "((\\d+)x(\\d+)(:(\\d+)x(\\d+))?/)?"
    # h_align
    "((left|right|center)/)?"
    # v_align
    "((top|bottom|middle)/)?"
    # smart
    "(smart/)?"
    # filters and image
    "(.+)?",
    re.DOTALL,
)

# normalize.go:122-131 — line/paragraph break stripper applied before parse
_BREAK_CHARS = ("\r\n", "\r", "\n", "\v", "\f", "\u0085", "\u2028", "\u2029")


def clean_breaks(s: str) -> str:
    for ch in _BREAK_CHARS:
        s = s.replace(ch, "")
    return s


def _atoi(s: str) -> int:
    try:
        return int(s)
    except (TypeError, ValueError):
        return 0


def _atof(s: str) -> float:
    try:
        return float(s)
    except (TypeError, ValueError):
        return 0.0


_PCT_OK = re.compile("%[0-9a-fA-F]{2}")

# RFC 4648 §5 base64url alphabet, no padding (Go base64.RawURLEncoding)
_B64URL_RAW = re.compile("[A-Za-z0-9_-]*")


def _query_unescape(s: str) -> str:
    """Go ``url.QueryUnescape`` semantics (parse.go:163-165): '+' becomes
    space, malformed %-escapes fail the whole unescape (original kept)."""
    stripped = _PCT_OK.sub("", s)
    if "%" in stripped:
        return s
    # surrogateescape so non-UTF-8 percent-escapes (e.g. %FF) survive as raw
    # bytes like Go's url.QueryUnescape, instead of collapsing to U+FFFD —
    # keeps canonical paths / storage keys / result digests bit-exact
    return urllib.parse.unquote_plus(s, errors="surrogateescape")


def parse(path: str) -> Params:
    """parse.go:48-51."""
    return apply(Params(), path)


def apply(p: Params, path: str) -> Params:
    """Apply path on top of existing Params (parse.go:54-180)."""
    m = _PATH_REGEX.match(clean_breaks(path))
    if m is None:
        return p
    # Go FindStringSubmatch: match[0]=full, match[i]=group i ("" when absent)
    match = [m.group(0) or ""] + [g or "" for g in m.groups()]
    if len(match) < 6:
        return p
    index = 1
    if match[index] != "":
        p.params = True
    index += 1
    if match[index + 1] == "unsafe/":
        p.unsafe = True
        index += 3
        p.path = match[index]
    elif match[index + 2] != "" and len(match[index + 2]) >= 17:
        h = match[index + 2]
        if h != "adaptive-full-fit-in":
            # It's a hash
            p.hash = h
            index += 3
            p.path = match[index]
        else:
            # It's a fit-in keyword, include it in the path
            index += 3
            p.path = h + "/" + match[index]
    else:
        index += 3
        p.path = match[index]

    m = _PARAMS_REGEX.match(p.path)
    if m is None:
        return p
    match = [m.group(0) or ""] + [g or "" for g in m.groups()]
    index = 1
    if match[index] != "":
        p.meta = True
    index += 1
    if match[index] != "":
        p.trim = True
        p.trim_by = TRIM_BY_TOP_LEFT
        if match[index + 2] != "":
            p.trim_by = match[index + 2]
        p.trim_tolerance = _atoi(match[index + 4])
    index += 5
    if match[index] != "":
        p.crop_left = _atof(match[index + 1])
        p.crop_top = _atof(match[index + 3])
        p.crop_right = _atof(match[index + 5])
        p.crop_bottom = _atof(match[index + 7])
    index += 9
    if match[index] != "":
        p.fit_in = True
        variant = match[index + 1]
        if variant == "adaptive-full-fit-in":
            p.adaptive_fit_in = True
            p.full_fit_in = True
        elif variant == "adaptive-fit-in":
            p.adaptive_fit_in = True
        elif variant == "full-fit-in":
            p.full_fit_in = True
    index += 2
    if match[index] != "":
        p.stretch = True
    index += 1
    if match[index] != "":
        p.h_flip = match[index + 1] != ""
        p.width = _atoi(match[index + 2])
        p.v_flip = match[index + 3] != ""
        p.height = _atoi(match[index + 4])
    index += 5
    if match[index] != "":
        p.padding_left = _atoi(match[index + 1])
        p.padding_top = _atoi(match[index + 2])
        if match[index + 3] != "":
            p.padding_right = _atoi(match[index + 4])
            p.padding_bottom = _atoi(match[index + 5])
        else:
            p.padding_right = p.padding_left
            p.padding_bottom = p.padding_top
    index += 6
    if match[index] != "":
        p.h_align = match[index + 1]
    index += 2
    if match[index] != "":
        p.v_align = match[index + 1]
    index += 2
    if match[index] != "":
        p.smart = True
    index += 1
    if match[index] != "":
        filters, img = parse_filters(match[index])
        p.filters = list(p.filters) + filters
        if img != "":
            img = _query_unescape(img)
            if img.startswith("b64:"):
                # base64url per RFC 4648 §5, unpadded (parse.go:167-175).
                # Go's base64.RawURLEncoding rejects '=' padding and any
                # character outside the base64url alphabet, and a length
                # ≡ 1 (mod 4) is never a valid raw encoding — mirror that
                # strictness; on rejection keep the original (filename may
                # just happen to start with "b64:")
                raw = img[4:]
                if _B64URL_RAW.fullmatch(raw) and len(raw) % 4 != 1:
                    try:
                        decoded = base64.urlsafe_b64decode(raw + "=" * (-len(raw) % 4))
                        img = decoded.decode("utf-8", errors="surrogateescape")
                        p.base64_image = True
                    except Exception:
                        pass
            p.image = img
    return p


def split_args(args: str) -> list[str]:
    """Comma split respecting paren nesting (parse.go:185-222)."""
    if args == "":
        return []
    result: list[str] = []
    buf: list[str] = []
    depth = 0
    for ch in args:
        if ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            result.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        result.append("".join(buf))
    return result


def parse_filters(s: str) -> tuple[list[Filter], str]:
    """State machine splitting ``filters:a(x):b(y)/image`` (parse.go:224-281)."""
    filters: list[Filter] = []
    path = ""
    if s.startswith("filters:"):
        s = s[8:]
        buf: list[str] = []
        depth = 0
        name = ""
        args = ""
        for idx, ch in enumerate(s):
            if ch == "(":
                if depth == 0:
                    name = "".join(buf)
                    buf = []
                else:
                    buf.append(ch)
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    args = "".join(buf)
                    buf = []
                else:
                    buf.append(ch)
            elif ch == "/":
                if depth == 0:
                    path = s[idx + 1 :]
                else:
                    buf.append(ch)
            elif ch == ":":
                if depth == 0:
                    filters.append(Filter(name=name, args=args))
                    name = ""
                    args = ""
                    buf = []
                else:
                    buf.append(ch)
            else:
                buf.append(ch)
            if path != "":
                break
        if name != "":
            filters.append(Filter(name=name, args=args))
    else:
        path = s
    return filters, path
