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
    "media_id string, width int, height int, n_pixels long, mean_luma double, phash string"
)

_FAKE_MAGIC = b"FIMG"  # deterministic fake container: magic + w + h + u8 gray
_HDR = struct.Struct("<4sII")


def encode_fake_image(media_id: str, width: int, height: int) -> bytes:
    """Deterministic grayscale test image keyed by media_id."""
    seed = int(hashlib.md5(media_id.encode()).hexdigest()[:8], 16)
    rng = np.random.Generator(np.random.Philox(seed))
    pix = rng.integers(0, 256, width * height, dtype=np.uint8)
    return _HDR.pack(_FAKE_MAGIC, width, height) + pix.tobytes()


def decode_image(blob: bytes) -> tuple[np.ndarray, int, int]:
    """STUB decode: only the deterministic fake container is supported in
    this sandbox (no PIL/libvips). Real JPEG/PNG bitstreams raise —
    clearly-marked per the build brief."""
    if blob[:4] != _FAKE_MAGIC:
        raise NotImplementedError(
            "real image decode is stubbed in this environment (no image libs); "
            "only the FIMG deterministic fake container decodes"
        )
    _, w, h = _HDR.unpack_from(blob, 0)
    pix = np.frombuffer(blob, dtype=np.uint8, offset=_HDR.size, count=w * h)
    return pix.reshape(h, w), w, h


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
                        "mean_luma": 0.0,
                        "phash": "",
                    }
                )
        yield pd.DataFrame(rows)


def image_features(df):
    """binary column → typed features, partitioning preserved (narrow)."""
    return df.mapInPandas(image_features_fn, schema=IMAGE_FEATURES_SCHEMA)
