"""imagorpath — the engine's query language (pure Python, zero Spark deps).

Bit-exact re-expression of /root/reference/imagorpath/ (parse.go,
generate.go, signer.go, hasher.go, normalize.go, params.go). Every audio row
carries an ops-spec string in this grammar; parsing, canonicalization,
signing and result-keying all happen here and are dispatched inside
vectorized UDFs by the engine.
"""

from .params import (
    Filter,
    Params,
    has_cache_bypass,
    has_crop,
    has_filter,
    TRIM_BY_BOTTOM_RIGHT,
    TRIM_BY_TOP_LEFT,
)
from .parse import apply, parse, parse_filters, split_args
from .generate import generate, generate_path, generate_unsafe, result_path
from .signer import HMACSigner, new_default_signer, sign
from .hasher import (
    digest_result_storage_hasher,
    digest_storage_hasher,
    hex_digest_path,
    size_suffix_result_storage_hasher,
    suffix_result_storage_hasher,
)
from .normalize import NoopSafeChars, SafeChars, normalize

__all__ = [
    "Filter",
    "Params",
    "HMACSigner",
    "SafeChars",
    "NoopSafeChars",
    "apply",
    "digest_result_storage_hasher",
    "digest_storage_hasher",
    "generate",
    "generate_path",
    "result_path",
    "generate_unsafe",
    "has_cache_bypass",
    "has_crop",
    "has_filter",
    "hex_digest_path",
    "new_default_signer",
    "normalize",
    "parse",
    "parse_filters",
    "sign",
    "size_suffix_result_storage_hasher",
    "split_args",
    "suffix_result_storage_hasher",
    "TRIM_BY_BOTTOM_RIGHT",
    "TRIM_BY_TOP_LEFT",
]
