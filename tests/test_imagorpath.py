"""Pinned-vector tests for the imagorpath module.

Every vector here is copied from the reference's own test suite so parity is
checkable line-by-line:
  - parse/generate roundtrips: /root/reference/imagorpath/params_test.go:13-605
  - HMAC signer:               params_test.go:370-424,634-637
  - result hashers:            /root/reference/imagorpath/hasher_test.go:10-58
  - normalize:                 params_test.go (TestNormalize)
"""

from __future__ import annotations

import dataclasses

import pytest
from hypothesis import given, settings, strategies as st

from imagor_spark.imagorpath import (
    Filter,
    HMACSigner,
    Params,
    SafeChars,
    NoopSafeChars,
    digest_result_storage_hasher,
    generate,
    generate_path,
    generate_unsafe,
    new_default_signer,
    normalize,
    parse,
    size_suffix_result_storage_hasher,
    split_args,
    suffix_result_storage_hasher,
)


def P(**kw) -> Params:
    filters = [Filter(*f) if isinstance(f, tuple) else f for f in kw.pop("filters", [])]
    return Params(filters=filters, **kw)


# (name, uri, expected Params, signer or None) — params_test.go:13-605
CASES = [
    (
        "non url image",
        "meta/trim/10x11:12x13/fit-in/-300x-200/left/top/smart/filters:some_filter()/img",
        P(
            path="meta/trim/10x11:12x13/fit-in/-300x-200/left/top/smart/filters:some_filter()/img",
            image="img", trim=True, trim_by="top-left",
            crop_left=10, crop_top=11, crop_right=12, crop_bottom=13,
            width=300, height=200, meta=True, h_flip=True, v_flip=True,
            h_align="left", v_align="top", smart=True, fit_in=True,
            filters=[("some_filter", "")],
        ),
        None,
    ),
    (
        "url image",
        "meta/trim:bottom-right:100/10x11:12x13/fit-in/-300x-200/left/top/smart/"
        "filters:some_filter()/s.glbimg.com/es/ge/f/original/2011/03/29/orlandosilva_60.jpg",
        P(
            path="meta/trim:bottom-right:100/10x11:12x13/fit-in/-300x-200/left/top/smart/"
            "filters:some_filter()/s.glbimg.com/es/ge/f/original/2011/03/29/orlandosilva_60.jpg",
            image="s.glbimg.com/es/ge/f/original/2011/03/29/orlandosilva_60.jpg",
            trim=True, trim_by="bottom-right", trim_tolerance=100,
            crop_left=10, crop_top=11, crop_right=12, crop_bottom=13,
            width=300, height=200, meta=True, h_flip=True, v_flip=True,
            h_align="left", v_align="top", smart=True, fit_in=True,
            filters=[("some_filter", "")],
        ),
        None,
    ),
    (
        "non url image base64url encoded",
        "meta/trim/10x11:12x13/fit-in/-300x-200/left/top/smart/filters:some_filter()/"
        "b64:bXkgaW1hZ2UgKHNwZWNpYWwpPy5qcGc",
        P(
            path="meta/trim/10x11:12x13/fit-in/-300x-200/left/top/smart/filters:some_filter()/"
            "b64:bXkgaW1hZ2UgKHNwZWNpYWwpPy5qcGc",
            image="my image (special)?.jpg", base64_image=True,
            trim=True, trim_by="top-left",
            crop_left=10, crop_top=11, crop_right=12, crop_bottom=13,
            width=300, height=200, meta=True, h_flip=True, v_flip=True,
            h_align="left", v_align="top", smart=True, fit_in=True,
            filters=[("some_filter", "")],
        ),
        None,
    ),
    (
        "url in filter",
        "filters:watermark(s.glbimg.com/es/ge/f/original/2011/03/29/orlandosilva_60.jpg,0,0,0)/img",
        P(
            path="filters:watermark(s.glbimg.com/es/ge/f/original/2011/03/29/orlandosilva_60.jpg,0,0,0)/img",
            image="img",
            filters=[("watermark", "s.glbimg.com/es/ge/f/original/2011/03/29/orlandosilva_60.jpg,0,0,0")],
        ),
        None,
    ),
    (
        "multiple filters",
        "filters:watermark(s.glbimg.com/es/ge/f/original/2011/03/29/orlandosilva_60.jpg,0,0,0)"
        ":brightness(-50):grayscale()/img",
        P(
            path="filters:watermark(s.glbimg.com/es/ge/f/original/2011/03/29/orlandosilva_60.jpg,0,0,0)"
            ":brightness(-50):grayscale()/img",
            image="img",
            filters=[
                ("watermark", "s.glbimg.com/es/ge/f/original/2011/03/29/orlandosilva_60.jpg,0,0,0"),
                ("brightness", "-50"),
                ("grayscale", ""),
            ],
        ),
        None,
    ),
    (
        "nested filters",
        "filters:watermark(s.glbimg.com/filters:label(abc):watermark(aaa.com/fit-in/"
        "filters:aaa(bbb))/aaa.jpg,0,0,0):brightness(-50):grayscale()/img",
        P(
            path="filters:watermark(s.glbimg.com/filters:label(abc):watermark(aaa.com/fit-in/"
            "filters:aaa(bbb))/aaa.jpg,0,0,0):brightness(-50):grayscale()/img",
            image="img",
            filters=[
                ("watermark", "s.glbimg.com/filters:label(abc):watermark(aaa.com/fit-in/filters:aaa(bbb))/aaa.jpg,0,0,0"),
                ("brightness", "-50"),
                ("grayscale", ""),
            ],
        ),
        None,
    ),
    (
        "filters with unicode",
        "filters:label(哈哈,1,2,3):brightness(-50):grayscale()/img",
        P(
            path="filters:label(哈哈,1,2,3):brightness(-50):grayscale()/img",
            image="img",
            filters=[("label", "哈哈,1,2,3"), ("brightness", "-50"), ("grayscale", "")],
        ),
        None,
    ),
    (
        "no params",
        "unsafe/https://foobar/en/latest/_images/man_before_sharpen.png",
        P(
            path="https://foobar/en/latest/_images/man_before_sharpen.png",
            image="https://foobar/en/latest/_images/man_before_sharpen.png",
            unsafe=True,
        ),
        None,
    ),
    (
        "contains query",
        "unsafe/https:%2F%2Ffoobar%2Fen%2Flatest%2F_images%2Fman_before_sharpen.png%3Ffoo=bar",
        P(
            path="https:%2F%2Ffoobar%2Fen%2Flatest%2F_images%2Fman_before_sharpen.png%3Ffoo=bar",
            image="https://foobar/en/latest/_images/man_before_sharpen.png?foo=bar",
            unsafe=True,
        ),
        None,
    ),
    (
        "image contains keyword trim",
        "unsafe/trim%2Fimg",
        P(path="trim%2Fimg", image="trim/img", unsafe=True),
        None,
    ),
    (
        "image contains keyword meta",
        "unsafe/meta%2Fimg",
        P(path="meta%2Fimg", image="meta/img", unsafe=True),
        None,
    ),
    (
        "image contains keyword fit-in",
        "unsafe/fit-in%2Fimg",
        P(path="fit-in%2Fimg", image="fit-in/img", unsafe=True),
        None,
    ),
    (
        "image contains keyword stretch",
        "unsafe/stretch%2Fimg",
        P(path="stretch%2Fimg", image="stretch/img", unsafe=True),
        None,
    ),
    (
        "image contains parentheses",
        "unsafe/photo%281%29.jpg",
        P(path="photo%281%29.jpg", image="photo(1).jpg", unsafe=True),
        None,
    ),
    (
        "image contains comma",
        "unsafe/photo%2Cversion2.jpg",
        P(path="photo%2Cversion2.jpg", image="photo,version2.jpg", unsafe=True),
        None,
    ),
    (
        "image contains parentheses and comma",
        "unsafe/my%20image%20%28special%2C%20v2%29.jpg",
        P(
            path="my%20image%20%28special%2C%20v2%29.jpg",
            image="my image (special, v2).jpg",
            unsafe=True,
        ),
        None,
    ),
    (
        "image with filters and parentheses in filename",
        "unsafe/filters:blur(5)/photo%281%29.jpg",
        P(
            path="filters:blur(5)/photo%281%29.jpg",
            image="photo(1).jpg",
            unsafe=True,
            filters=[("blur", "5")],
        ),
        None,
    ),
    (
        "padding without dimensions",
        "unsafe/fit-in/0x0/5x6:7x8/https://foobar/en/latest/_images/man_before_sharpen.png",
        P(
            path="fit-in/0x0/5x6:7x8/https://foobar/en/latest/_images/man_before_sharpen.png",
            image="https://foobar/en/latest/_images/man_before_sharpen.png",
            unsafe=True, fit_in=True,
            padding_left=5, padding_top=6, padding_right=7, padding_bottom=8,
        ),
        None,
    ),
    (
        "url in filters",
        "unsafe/stretch/500x350/filters:watermark(http://thumborize.me/static/img/beach.jpg,100,100,50)/"
        "http://thumborize.me/static/img/beach.jpg",
        P(
            path="stretch/500x350/filters:watermark(http://thumborize.me/static/img/beach.jpg,100,100,50)/"
            "http://thumborize.me/static/img/beach.jpg",
            image="http://thumborize.me/static/img/beach.jpg",
            width=500, height=350, unsafe=True, stretch=True,
            filters=[("watermark", "http://thumborize.me/static/img/beach.jpg,100,100,50")],
        ),
        None,
    ),
    (
        "non url image with hash",
        "VTAq7YIRbEXgtwAcsTMhAjvBuT8=/meta/10x11:12x13/fit-in/-300x-200/5x6/left/top/smart/"
        "filters:some_filter()/img",
        P(
            path="meta/10x11:12x13/fit-in/-300x-200/5x6/left/top/smart/filters:some_filter()/img",
            hash="VTAq7YIRbEXgtwAcsTMhAjvBuT8=",
            image="img",
            crop_left=10, crop_top=11, crop_right=12, crop_bottom=13,
            width=300, height=200, meta=True, h_flip=True, v_flip=True,
            h_align="left", v_align="top", smart=True, fit_in=True,
            padding_left=5, padding_top=6, padding_right=5, padding_bottom=6,
            filters=[("some_filter", "")],
        ),
        new_default_signer("1234"),
    ),
    (
        "non url image with hash and custom signer",
        "XBCO7esuLsNQuSF2v9ie36pESRGx2rzLjhUxXWnV/meta/10x11:12x13/fit-in/-300x-200/5x6/"
        "left/top/smart/filters:some_filter()/img",
        P(
            path="meta/10x11:12x13/fit-in/-300x-200/5x6/left/top/smart/filters:some_filter()/img",
            hash="XBCO7esuLsNQuSF2v9ie36pESRGx2rzLjhUxXWnV",
            image="img",
            crop_left=10, crop_top=11, crop_right=12, crop_bottom=13,
            width=300, height=200, meta=True, h_flip=True, v_flip=True,
            h_align="left", v_align="top", smart=True, fit_in=True,
            padding_left=5, padding_top=6, padding_right=5, padding_bottom=6,
            filters=[("some_filter", "")],
        ),
        HMACSigner("sha256", 40, "1234"),
    ),
    (
        "non url image with crop by percentage",
        "meta/trim/0.2x0.15:0.45x0.67/fit-in/-300x-200/left/top/smart/filters:some_filter()/img",
        P(
            path="meta/trim/0.2x0.15:0.45x0.67/fit-in/-300x-200/left/top/smart/filters:some_filter()/img",
            image="img", trim=True, trim_by="top-left",
            crop_left=0.2, crop_top=0.15, crop_right=0.45, crop_bottom=0.67,
            width=300, height=200, meta=True, h_flip=True, v_flip=True,
            h_align="left", v_align="top", smart=True, fit_in=True,
            filters=[("some_filter", "")],
        ),
        None,
    ),
    (
        "adaptive fit-in",
        "adaptive-fit-in/300x200/img",
        P(path="adaptive-fit-in/300x200/img", image="img",
          fit_in=True, adaptive_fit_in=True, width=300, height=200),
        None,
    ),
    (
        "full fit-in",
        "full-fit-in/300x200/img",
        P(path="full-fit-in/300x200/img", image="img",
          fit_in=True, full_fit_in=True, width=300, height=200),
        None,
    ),
    (
        "adaptive full fit-in",
        "adaptive-full-fit-in/300x200/img",
        P(path="adaptive-full-fit-in/300x200/img", image="img",
          fit_in=True, adaptive_fit_in=True, full_fit_in=True, width=300, height=200),
        None,
    ),
    (
        "adaptive fit-in with filters",
        "adaptive-fit-in/300x200/filters:blur(5)/img",
        P(path="adaptive-fit-in/300x200/filters:blur(5)/img", image="img",
          fit_in=True, adaptive_fit_in=True, width=300, height=200,
          filters=[("blur", "5")]),
        None,
    ),
    (
        "full fit-in with smart crop",
        "full-fit-in/300x200/smart/img",
        P(path="full-fit-in/300x200/smart/img", image="img",
          fit_in=True, full_fit_in=True, width=300, height=200, smart=True),
        None,
    ),
    (
        "dimensions 949x1000 (8 chars, should not be treated as hash)",
        "949x1000/img.jpg",
        P(path="949x1000/img.jpg", image="img.jpg", width=949, height=1000),
        None,
    ),
    (
        "dimensions with flip -1920x-1080 (11 chars, should not be treated as hash)",
        "-1920x-1080/img.jpg",
        P(path="-1920x-1080/img.jpg", image="img.jpg",
          width=1920, height=1080, h_flip=True, v_flip=True),
        None,
    ),
    (
        "dimensions in nested path (layer use case)",
        "unsafe/949x1000/Google Photos/IMG_20180519_191530.jpg",
        P(path="949x1000/Google Photos/IMG_20180519_191530.jpg",
          image="Google Photos/IMG_20180519_191530.jpg",
          width=949, height=1000, unsafe=True),
        None,
    ),
    (
        "max valid dimensions 99999x99999 (5 digits each)",
        "99999x99999/img.jpg",
        P(path="99999x99999/img.jpg", image="img.jpg", width=99999, height=99999),
        None,
    ),
]


@pytest.mark.parametrize("name,uri,expected,signer", CASES, ids=[c[0] for c in CASES])
def test_parse_generate_roundtrip(name, uri, expected, signer):
    got = parse(uri)
    assert got == expected, f"parse mismatch for {uri}"
    if signer is not None:
        assert signer.sign(got.path) == got.hash
    if expected.hash and signer is not None:
        assert generate(expected, signer) == uri
    elif expected.unsafe:
        assert generate_unsafe(expected) == uri
    else:
        assert generate_path(expected) == uri


def test_negative_dimension_flip():
    # params_test.go TestParamsNegativeDimensionFlip
    assert generate_unsafe(P(width=-167, height=-169, image="foobar")) == "unsafe/-167x-169/foobar"


def test_hmac_signer_vectors():
    # params_test.go:634-637
    assert HMACSigner("sha256", 28, "abcd").sign("assfasf") == "zb6uWXQxwJDOe_zOgxkuj96Etrsz"
    # params_test.go:370-376 (sha1, secret "1234")
    assert (
        new_default_signer("1234").sign(
            "meta/10x11:12x13/fit-in/-300x-200/5x6/left/top/smart/filters:some_filter()/img"
        )
        == "VTAq7YIRbEXgtwAcsTMhAjvBuT8="
    )
    # params_test.go:398-404 (sha256 truncated 40)
    assert (
        HMACSigner("sha256", 40, "1234").sign(
            "meta/10x11:12x13/fit-in/-300x-200/5x6/left/top/smart/filters:some_filter()/img"
        )
        == "XBCO7esuLsNQuSF2v9ie36pESRGx2rzLjhUxXWnV"
    )


def test_split_args():
    # parse.go SplitArgs doc + params_test.go TestSplitArgs
    assert split_args("path(a,b),x,y") == ["path(a,b)", "x", "y"]
    assert split_args("") == []
    assert split_args("a,b,c") == ["a", "b", "c"]
    assert split_args("f(x,g(y,z)),w") == ["f(x,g(y,z))", "w"]


def test_hasher_vectors():
    # hasher_test.go:10-31
    p = parse("fit-in/16x17/foobar")
    assert digest_result_storage_hasher(p) == "d5/c2/804e5d81c475bee50f731db17ee613f43262"
    p.path = ""
    assert digest_result_storage_hasher(p) == "d5/c2/804e5d81c475bee50f731db17ee613f43262"
    p = parse("fit-in/16x17/foobar")
    assert suffix_result_storage_hasher(p) == "foobar.d5c2804e5d81c475bee5"
    assert size_suffix_result_storage_hasher(p) == "foobar.d5c2804e5d81c475bee5_16x17"
    p.path = ""
    assert suffix_result_storage_hasher(p) == "foobar.d5c2804e5d81c475bee5"
    p = parse("17x19/smart/example.com/foobar")
    assert suffix_result_storage_hasher(p) == "example.com/foobar.ddd349e092cda6d9c729"
    assert size_suffix_result_storage_hasher(p) == "example.com/foobar.ddd349e092cda6d9c729_17x19"
    p = parse("smart/example.com/foobar")
    assert size_suffix_result_storage_hasher(p) == "example.com/foobar.afa3503c0d76bc49eccd"
    assert suffix_result_storage_hasher(p) == "example.com/foobar.afa3503c0d76bc49eccd"
    p = parse("166x169/top/foobar.jpg")
    assert suffix_result_storage_hasher(p) == "foobar.45d8ebb31bd4ed80c26e.jpg"
    assert size_suffix_result_storage_hasher(p) == "foobar.45d8ebb31bd4ed80c26e_166x169.jpg"
    p.path = ""
    assert suffix_result_storage_hasher(p) == "foobar.45d8ebb31bd4ed80c26e.jpg"


def test_suffix_hasher_format_and_meta():
    # hasher_test.go:34-58
    p = P(smart=True, width=17, height=19, image="example.com/foobar.jpg",
          filters=[("format", "webp")])
    assert suffix_result_storage_hasher(p) == "example.com/foobar.8aade9060badfcb289f9.webp"
    assert size_suffix_result_storage_hasher(p) == "example.com/foobar.8aade9060badfcb289f9_17x19.webp"
    p = P(meta=True, smart=True, width=17, height=19, image="example.com/foobar.jpg")
    assert suffix_result_storage_hasher(p) == "example.com/foobar.d72ff6ef20ba41fa570c.json"
    assert size_suffix_result_storage_hasher(p) == "example.com/foobar.d72ff6ef20ba41fa570c_17x19.json"
    p = P(meta=True, smart=True, width=17, height=19, image="example.com/foobar.jpg",
          filters=[("format", "webp")])
    assert suffix_result_storage_hasher(p) == "example.com/foobar.c80ab0faf85b35a140a8.json"
    assert size_suffix_result_storage_hasher(p) == "example.com/foobar.c80ab0faf85b35a140a8_17x19.json"


def test_normalize_vectors():
    # params_test.go TestNormalize
    assert normalize(
        "/unsafe/fit-in/800x800/filters:fill(white):watermark(raw.githubusercontent.com/"
        "cshum/imagor/master/testdata/gopher.png,repeat,bottom,10):format(jpeg)/"
        "https://raw.githubusercontent.com/golang-samples/gopher-vector/master/gopher .png///",
        None,
    ) == (
        "unsafe/fit-in/800x800/filters%3Afill%28white%29%3Awatermark%28raw.githubusercontent.com/"
        "cshum/imagor/master/testdata/gopher.png%2Crepeat%2Cbottom%2C10%29%3Aformat%28jpeg%29/"
        "https%3A/raw.githubusercontent.com/golang-samples/gopher-vector/master/gopher+.png"
    )
    assert normalize(
        "/unsafe/fit-in/800x800/filters:fill(white):watermark(raw.githubusercontent.com/"
        "cshum/imagor/master/testdata/gopher.png,repeat,bottom,10):format(jpeg)/"
        "https://raw.githubusercontent.com/golang-samples/gopher-vector/master/gopher .png///",
        SafeChars(" "),
    ) == (
        "unsafe/fit-in/800x800/filters%3Afill%28white%29%3Awatermark%28raw.githubusercontent.com/"
        "cshum/imagor/master/testdata/gopher.png%2Crepeat%2Cbottom%2C10%29%3Aformat%28jpeg%29/"
        "https%3A/raw.githubusercontent.com/golang-samples/gopher-vector/master/gopher .png"
    )
    assert normalize("a ", None) == "a+"
    assert normalize("a-+", SafeChars("-")) == "a-%2B"
    assert normalize("a-+", NoopSafeChars()) == "a-+"
    assert normalize("a-+", SafeChars("--")) == "a-+"


# Property test mirroring the reference's table-driven roundtrip strategy
# (params_test.go:13-605): parse(generate_path(p)) == p for valid param sets.
_filters_st = st.lists(
    st.tuples(
        st.from_regex(r"[a-z_][a-z0-9_]{0,10}", fullmatch=True),
        st.from_regex(r"[a-zA-Z0-9_.,\-]{0,12}", fullmatch=True),
    ).map(lambda t: Filter(*t)),
    max_size=3,
)


@settings(max_examples=200, deadline=None)
@given(
    meta=st.booleans(),
    trim=st.booleans(),
    trim_tol=st.integers(0, 200),
    crop=st.one_of(
        st.none(),
        st.tuples(st.integers(1, 500), st.integers(1, 500),
                  st.integers(501, 999), st.integers(501, 999)),
    ),
    fit_in=st.booleans(),
    full=st.booleans(),
    stretch=st.booleans(),
    width=st.integers(0, 99999),
    height=st.integers(0, 99999),
    h_flip=st.booleans(),
    v_flip=st.booleans(),
    h_align=st.sampled_from(["", "left", "right"]),
    v_align=st.sampled_from(["", "top", "bottom"]),
    smart=st.booleans(),
    filters=_filters_st,
)
def test_parse_generate_property(
    meta, trim, trim_tol, crop, fit_in, full, stretch,
    width, height, h_flip, v_flip, h_align, v_align, smart, filters,
):
    p = Params(
        meta=meta,
        trim=trim,
        trim_by="top-left" if trim else "",
        trim_tolerance=trim_tol if trim else 0,
        fit_in=fit_in,
        full_fit_in=fit_in and full,
        stretch=stretch,
        width=width,
        height=height,
        h_flip=h_flip and width != 0,
        v_flip=v_flip and height != 0,
        h_align=h_align,
        v_align=v_align,
        smart=smart,
        filters=filters,
        image="img.wav",
    )
    if crop:
        p.crop_left, p.crop_top, p.crop_right, p.crop_bottom = map(float, crop)
    # flips without dims are not representable (generate only emits flip
    # with the dimension block); normalize those away
    if not (p.h_flip or p.width or p.v_flip or p.height or p.padding_left or p.padding_top):
        p.h_flip = p.v_flip = False
    path = generate_path(p)
    q = parse(path)
    expected = dataclasses.replace(p, path=path)
    assert q == expected


def test_query_unescape_preserves_raw_bytes():
    """Non-UTF-8 percent-escapes survive as raw bytes (Go url.QueryUnescape
    parity via surrogateescape), so digests/keys stay bit-exact."""
    p = parse("unsafe/%FF%FEimg")
    assert p.image == "\udcff\udcfeimg"  # surrogate-escaped raw bytes
    assert "�" not in p.image


def test_b64_image_rejects_padding_and_invalid():
    """Go base64.RawURLEncoding strictness: '=' padding or out-of-alphabet
    characters keep the original path (base64_image stays False)."""
    padded = parse("unsafe/b64:Zm8=")
    assert padded.image == "b64:Zm8=" and not padded.base64_image
    bad = parse("unsafe/b64:Zm8*")
    assert bad.image == "b64:Zm8*" and not bad.base64_image
    # len % 4 == 1 is never a valid raw encoding
    short = parse("unsafe/b64:Zm8xa")
    assert short.image == "b64:Zm8xa" and not short.base64_image
    ok = parse("unsafe/b64:Zm8")
    assert ok.image == "fo" and ok.base64_image
