"""Multimodal column plumbing — image/video as opaque binary + typed
metadata, with decode/feature steps as Arrow-batched ``mapInPandas`` UDFs.

AUDIO is this engine's first-class payload (real codecs in
``imagor_spark.audio``). Image/video differ only in the decode kernel —
the Spark-side plumbing (schema, batch iteration, partition preservation)
is identical and REAL here; the pixel/frame decode itself is STUBBED
(``decode_image``/``sample_frames`` raise ``NotImplementedError`` for real
bitstreams and provide a deterministic fake for the magic-tagged test
container) because no image/video libs exist in this environment. Swap the
kernel for PIL/ffmpeg where available — nothing else changes.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd

IMAGE_SCHEMA = (
    "media_id string, bytes binary, width int, height int, fmt string, meta string"
)
IMAGE_FEATURES_SCHEMA = (
    "media_id string, width int, height int, n_pixels long, sum_luma long, "
    "mean_luma double, phash string"
)

_FAKE_MAGIC = b"FIMG"  # deterministic fake container: magic + w + h + u8 gray
_HDR = struct.Struct("<4sII")


def encode_fake_image(media_id: str, width: int, height: int) -> bytes:
    """Deterministic grayscale test image keyed by media_id."""
    seed = int(hashlib.md5(media_id.encode()).hexdigest()[:8], 16)
    rng = np.random.Generator(np.random.Philox(seed))
    pix = rng.integers(0, 256, width * height, dtype=np.uint8)
    return _HDR.pack(_FAKE_MAGIC, width, height) + pix.tobytes()


def _luma_u8(rgb: np.ndarray) -> np.ndarray:
    """Integer BT.601 luma: (299·R + 587·G + 114·B) // 1000. Exact integer
    arithmetic (not float dot) so a SQL oracle replays it bit-for-bit; for
    gray pixels (R=G=B=p) it collapses to p exactly (1000p // 1000)."""
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


def decode_bmp(blob: bytes) -> tuple[np.ndarray, int, int]:
    """Pure-numpy decode for uncompressed (BI_RGB) Windows BMP — 24-bit
    true-color and 8-bit paletted, bottom-up or top-down, 4-byte row
    padding. ~40 lines, zero dependencies: the one REAL pixel format the
    sandbox analogue of the reference's vips decode plane supports
    (processor/vipsprocessor handles BMP via libvips magickload)."""
    if len(blob) < 54 or blob[:2] != b"BM":
        raise ValueError("not a BMP stream")
    data_off = struct.unpack_from("<I", blob, 10)[0]
    dib_size = struct.unpack_from("<I", blob, 14)[0]
    if dib_size < 40:
        raise NotImplementedError(f"BMP core-header size {dib_size} unsupported")
    w, h_raw = struct.unpack_from("<ii", blob, 18)
    bpp = struct.unpack_from("<H", blob, 28)[0]
    compression = struct.unpack_from("<I", blob, 30)[0]
    if compression != 0:
        raise NotImplementedError(f"BMP compression {compression} unsupported (BI_RGB only)")
    if w <= 0 or h_raw == 0:
        raise ValueError(f"BMP dimensions {w}x{h_raw}")
    top_down = h_raw < 0
    h = abs(h_raw)
    if bpp == 24:
        stride = (w * 3 + 3) & ~3
        raw = np.frombuffer(blob, np.uint8, count=stride * h, offset=data_off)
        rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        gray = _luma_u8(rows[..., ::-1])  # BGR on disk → RGB for the luma
    elif bpp == 8:
        n_colors = struct.unpack_from("<I", blob, 46)[0] or 256
        pal = np.frombuffer(blob, np.uint8, count=n_colors * 4,
                            offset=14 + dib_size).reshape(n_colors, 4)
        pal_luma = _luma_u8(pal[:, :3][:, ::-1][None, :, :])[0]  # BGRA entries
        stride = (w + 3) & ~3
        idx = np.frombuffer(blob, np.uint8, count=stride * h, offset=data_off)
        gray = pal_luma[idx.reshape(h, stride)[:, :w]]
    else:
        raise NotImplementedError(f"BMP bpp {bpp} unsupported (8/24 only)")
    if not top_down:
        gray = gray[::-1]
    return np.ascontiguousarray(gray), w, h


def encode_bmp(gray: np.ndarray) -> bytes:
    """24-bit BI_RGB bottom-up BMP writer (R=G=B=gray) — exercises the
    decoder's padding + vertical-flip paths in tests with no image libs."""
    h, w = gray.shape
    stride = (w * 3 + 3) & ~3
    hdr = struct.pack("<2sIHHI", b"BM", 54 + stride * h, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0)
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = np.repeat(gray, 3, axis=-1).reshape(h, w * 3)
    return hdr + dib + rows[::-1].tobytes()  # bottom-up row order


def decode_pnm(blob: bytes) -> tuple[np.ndarray, int, int]:
    """Pure-numpy decode for binary PNM: P5 (gray) and P6 (RGB), maxval
    ≤255, '#' comments allowed in the header."""
    if blob[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM stream")
    rgb = blob[:2] == b"P6"
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PNM unsupported")
    n = w * h * (3 if rgb else 1)
    pix = np.frombuffer(blob, np.uint8, count=n, offset=pos)
    if rgb:
        return _luma_u8(pix.reshape(h, w, 3)), w, h
    return pix.reshape(h, w).copy(), w, h


def decode_image(blob: bytes) -> tuple[np.ndarray, int, int]:
    """Decode by magic sniff → grayscale plane + dims. REAL formats:
    uncompressed BMP (8/24-bit BI_RGB) and binary PNM (P5/P6), both pure
    numpy; plus the deterministic FIMG fake container for tests. Compressed
    bitstreams (JPEG/PNG/...) raise ``NotImplementedError`` — honest stub,
    no image libs in this sandbox (swap in PIL/libvips; nothing else in the
    plumbing changes)."""
    if blob[:4] == _FAKE_MAGIC:
        _, w, h = _HDR.unpack_from(blob, 0)
        pix = np.frombuffer(blob, dtype=np.uint8, offset=_HDR.size, count=w * h)
        return pix.reshape(h, w), w, h
    if blob[:2] == b"BM":
        return decode_bmp(blob)
    if blob[:2] in (b"P5", b"P6"):
        return decode_pnm(blob)
    raise NotImplementedError(
        "compressed image decode is stubbed in this environment (no image "
        "libs); BMP (BI_RGB 8/24-bit), binary PNM (P5/P6) and the FIMG fake "
        "container decode for real"
    )


def _phash(gray: np.ndarray, bits: int = 16) -> str:
    """Coarse perceptual hash: block means vs median, hex-encoded (the
    image twin of audio ``fingerprint``)."""
    h, w = gray.shape
    side = int(np.sqrt(bits))
    bh, bw = max(h // side, 1), max(w // side, 1)
    blocks = []
    for r in range(side):
        for c in range(side):
            blk = gray[r * bh : (r + 1) * bh, c * bw : (c + 1) * bw]
            blocks.append(blk.mean() if blk.size else 0.0)
    arr = np.array(blocks)
    val = int("".join("1" if b > np.median(arr) else "0" for b in arr), 2)
    return format(val, "0%dx" % (bits // 4))


def image_features_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: decode → feature-extract per batch. This is the
    REAL plumbing (batch shapes, Arrow transfer, error rows dropped to
    n_pixels=-1) around the stubbed decode."""
    for pdf in batches:
        rows = []
        for mid, blob in zip(pdf["media_id"], pdf["bytes"]):
            try:
                gray, w, h = decode_image(bytes(blob))
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "n_pixels": w * h,
                        # exact int64 — the hash-checkable twin of mean_luma
                        # (float columns never hash-compare across engines)
                        "sum_luma": int(gray.astype(np.int64).sum()),
                        "mean_luma": round(float(gray.mean()), 4),
                        "phash": _phash(gray),
                    }
                )
            except NotImplementedError:
                rows.append(
                    {
                        "media_id": mid,
                        "width": 0,
                        "height": 0,
                        "n_pixels": -1,
                        "sum_luma": -1,
                        "mean_luma": 0.0,
                        "phash": "",
                    }
                )
        yield pd.DataFrame(rows)


def image_features(df):
    """binary column → typed features, partitioning preserved (narrow)."""
    return df.mapInPandas(image_features_fn, schema=IMAGE_FEATURES_SCHEMA)
