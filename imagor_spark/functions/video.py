"""Video frame-sampling plumbing — the moving-picture sibling of
:mod:`imagor_spark.functions.multimodal`.

Same contract as the image leg: the payload is an opaque ``binary`` column
with typed metadata; the Spark-side plumbing (header probe without touching
frame data, strided frame selection, Arrow-batched ``mapInPandas`` feature
extraction, one output row per sampled frame) is REAL, while compressed
video bitstream decode (MP4/WebM — ≅ the reference's ffmpeg integration,
processor/vipsprocessor with video loaders) is an honest loud stub: only
the deterministic ``FVID`` container decodes in this sandbox. Swap
:func:`decode_video` for an ffmpeg/PyAV kernel where available — nothing
else changes.

Frame sampling is the multimodal op a training pipeline actually runs at
scale (sample every Nth frame of 10^9 clips → per-frame features): here it
is a zero-copy strided view over the frame plane, and the features use the
same exact-integer luma as the image leg so a SQL oracle replays them.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd

# FVID container: magic + width + height + n_frames + fps, then n_frames
# contiguous w*h u8 grayscale planes
_FVID_MAGIC = b"FVID"
_FVID_HDR = struct.Struct("<4sIIHH")

VIDEO_SCHEMA = (
    "media_id string, bytes binary, width int, height int, n_frames int, "
    "fps int, fmt string"
)
FRAME_FEATURES_SCHEMA = (
    "media_id string, frame_idx int, width int, height int, "
    "sum_luma long, mean_luma double"
)


def encode_fake_video(media_id: str, width: int, height: int,
                      n_frames: int, fps: int = 10) -> bytes:
    """Deterministic grayscale test clip keyed by media_id."""
    seed = int(hashlib.md5(media_id.encode()).hexdigest()[:8], 16)
    rng = np.random.Generator(np.random.Philox(seed))
    frames = rng.integers(0, 256, n_frames * width * height, dtype=np.uint8)
    return _FVID_HDR.pack(_FVID_MAGIC, width, height, n_frames, fps) + frames.tobytes()


def video_header_info(blob: bytes) -> tuple[int, int, int, int]:
    """(width, height, n_frames, fps) from the container header WITHOUT
    touching frame data — the cheap probe bomb guards and planners need
    (≅ ``wav_header_info`` on the audio plane)."""
    if blob[: len(_FVID_MAGIC)] != _FVID_MAGIC:
        raise NotImplementedError(
            "compressed video decode is stubbed in this environment (no "
            "ffmpeg/PyAV); only the FVID deterministic container decodes"
        )
    _, w, h, n, fps = _FVID_HDR.unpack_from(blob, 0)
    return int(w), int(h), int(n), int(fps)


def decode_video(blob: bytes) -> tuple[np.ndarray, int]:
    """Full decode → (frames [n, h, w] u8, fps). Stub-gated like
    :func:`multimodal.decode_image` — FVID only in this sandbox."""
    w, h, n, fps = video_header_info(blob)
    frames = np.frombuffer(blob, np.uint8, count=n * h * w, offset=_FVID_HDR.size)
    return frames.reshape(n, h, w), fps


def sample_frames(blob: bytes, every_n: int = 1,
                  max_frames: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Strided frame sampling: frames ``0, every_n, 2·every_n, …`` (at most
    ``max_frames`` of them) → (sampled [k, h, w], indices [k]). The
    selection is a numpy stride view over the decoded plane — zero copy
    until a kernel consumes it."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    frames, _ = decode_video(blob)
    sel = frames[::every_n]
    idx = np.arange(0, frames.shape[0], every_n)
    if max_frames is not None:
        sel, idx = sel[:max_frames], idx[:max_frames]
    return sel, idx


def _frame_features_fn(every_n: int, max_frames: int | None):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["bytes"]):
                try:
                    sel, idx = sample_frames(bytes(blob), every_n, max_frames)
                except NotImplementedError:
                    rows.append({"media_id": mid, "frame_idx": -1, "width": 0,
                                 "height": 0, "sum_luma": -1, "mean_luma": 0.0})
                    continue
                k, h, w = sel.shape
                sums = sel.reshape(k, -1).astype(np.int64).sum(axis=1)
                for j in range(k):
                    rows.append({
                        "media_id": mid, "frame_idx": int(idx[j]),
                        "width": w, "height": h,
                        "sum_luma": int(sums[j]),
                        "mean_luma": round(float(sums[j]) / (h * w), 4),
                    })
            yield pd.DataFrame(rows)

    return fn


def frame_sample_features(df, every_n: int = 1, max_frames: int | None = None):
    """binary video column → one feature row per SAMPLED frame. Narrow
    (partitioning preserved; the explode happens inside the Arrow batch,
    never as a Spark ``Generate``); output is ~n_frames/every_n rows per
    clip, which is the point of sampling at 100 TB."""
    return df.mapInPandas(_frame_features_fn(every_n, max_frames),
                          schema=FRAME_FEATURES_SCHEMA)
