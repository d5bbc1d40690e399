"""Storage-path normalization — re-expression of
/root/reference/imagorpath/normalize.go:19-143 (path clean + safe-char
escaping). Used by the sink when building output object keys."""

from __future__ import annotations

_UPPER_HEX = "0123456789ABCDEF"

_BREAK_CHARS = ("\r\n", "\r", "\n", "\v", "\f", "\u0085", "\u2028", "\u2029")


class SafeChars:
    """normalize.go:19-63. ``safechars="--"`` means no-op (escape nothing)."""

    def __init__(self, safechars: str = ""):
        self.noop = safechars == "--"
        self.custom = set(safechars.encode("utf-8")) if not self.noop else set()

    def should_escape(self, c: int) -> bool:
        if self.noop:
            return False
        ch = chr(c)
        if "a" <= ch <= "z" or "A" <= ch <= "Z" or "0" <= ch <= "9":
            return False
        if ch in "/-_.~":  # path segment separator + unreserved
            return False
        if self.custom and c in self.custom:
            return False
        return True


def NoopSafeChars() -> SafeChars:
    """normalize.go:32-34."""
    return SafeChars("--")


_DEFAULT_SAFE = SafeChars("")


def _go_path_clean(p: str) -> str:
    """Go ``path.Clean`` (lexical): collapse //, resolve . and .., result
    never has trailing slash except root; empty → '.'."""
    if p == "":
        return "."
    rooted = p.startswith("/")
    parts = p.split("/")
    out: list[str] = []
    for part in parts:
        if part in ("", "."):
            continue
        if part == "..":
            if out and out[-1] != "..":
                out.pop()
            elif not rooted:
                out.append("..")
            # rooted '..' above root is dropped
        else:
            out.append(part)
    cleaned = "/".join(out)
    if rooted:
        return "/" + cleaned
    return cleaned if cleaned else "."


def _escape(s: str, should_escape) -> str:
    """normalize.go:66-120 — %XX upper-hex escaping, ' ' → '+'."""
    data = s.encode("utf-8")
    if not any(should_escape(c) for c in data):
        return s
    out: list[str] = []
    for c in data:
        if should_escape(c):
            if c == 0x20:
                out.append("+")
            else:
                out.append("%" + _UPPER_HEX[c >> 4] + _UPPER_HEX[c & 15])
        else:
            out.append(chr(c))
    return "".join(out)


def normalize(image: str, safe_chars: SafeChars | None = None) -> str:
    """normalize.go:135-143."""
    image = _go_path_clean(image)
    for ch in _BREAK_CHARS:
        image = image.replace(ch, "")
    image = image.strip("/")
    sc = safe_chars if safe_chars is not None else _DEFAULT_SAFE
    return _escape(image, sc.should_escape)
