"""Params / Filter structs — the engine's query language.

Re-expresses the reference's ``imagorpath.Params``
(/root/reference/imagorpath/params.go:24-61) as a Python dataclass.
The ops-spec string attached to every audio row parses into exactly this
structure; audio semantics of each field are documented in
``imagor_spark.audio.apply``.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict

TRIM_BY_TOP_LEFT = "top-left"
TRIM_BY_BOTTOM_RIGHT = "bottom-right"
H_ALIGN_LEFT = "left"
H_ALIGN_RIGHT = "right"
V_ALIGN_TOP = "top"
V_ALIGN_BOTTOM = "bottom"


@dataclass
class Filter:
    """One named op + raw comma-joined args (params.go:58-61)."""

    name: str = ""
    args: str = ""


@dataclass
class Params:
    """Parsed operation spec (params.go:24-55).

    Field-for-field parity with the reference struct; ``params`` is the
    ``params/`` debug-endpoint flag.
    """

    params: bool = False
    path: str = ""
    image: str = ""
    base64_image: bool = False
    unsafe: bool = False
    hash: str = ""
    meta: bool = False
    trim: bool = False
    trim_by: str = ""
    trim_tolerance: int = 0
    crop_left: float = 0.0
    crop_top: float = 0.0
    crop_right: float = 0.0
    crop_bottom: float = 0.0
    fit_in: bool = False
    adaptive_fit_in: bool = False
    full_fit_in: bool = False
    stretch: bool = False
    width: int = 0
    height: int = 0
    padding_left: int = 0
    padding_top: int = 0
    padding_right: int = 0
    padding_bottom: int = 0
    h_flip: bool = False
    v_flip: bool = False
    h_align: str = ""
    v_align: str = ""
    smart: bool = False
    filters: list[Filter] = field(default_factory=list)

    def to_dict(self) -> dict:
        return asdict(self)


def has_crop(p: Params) -> bool:
    """Any non-zero crop coordinate counts as a crop (params.go:65-67)."""
    return p.crop_left > 0 or p.crop_top > 0 or p.crop_right > 0 or p.crop_bottom > 0


def has_filter(p: Params, name: str) -> bool:
    """params.go:70-77."""
    return any(f.name == name for f in p.filters)


def _atoi(s: str) -> int:
    try:
        return int(s)
    except (TypeError, ValueError):
        return 0


def has_cache_bypass(p: Params) -> bool:
    """Requests depending on original-space coords bypass the decoded-source
    cache (params.go:87-106). Audio analogue: ops depending on the original
    timeline (crop, focal) or per-request decode params (page/channel, dpi).
    """
    if has_crop(p):
        return True
    for f in p.filters:
        if f.name == "focal":
            return True
        if f.name == "page" and _atoi(f.args) > 1:
            return True
        if f.name == "dpi" and _atoi(f.args) > 0:
            return True
    return False
