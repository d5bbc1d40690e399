import numpy as np
import pytest

from imagor_spark.functions.video import (
    FRAME_FEATURES_SCHEMA,
    VIDEO_SCHEMA,
    decode_video,
    encode_fake_video,
    frame_sample_features,
    sample_frames,
    video_header_info,
)


def test_fvid_header_probe_and_decode():
    blob = encode_fake_video("clip-a", 8, 6, 5, fps=12)
    assert video_header_info(blob) == (8, 6, 5, 12)
    frames, fps = decode_video(blob)
    assert frames.shape == (5, 6, 8) and fps == 12
    # deterministic: same id → same bytes
    assert blob == encode_fake_video("clip-a", 8, 6, 5, fps=12)
    assert blob != encode_fake_video("clip-b", 8, 6, 5, fps=12)


def test_sample_frames_stride_and_cap():
    blob = encode_fake_video("clip-s", 4, 4, 9)
    frames, _ = decode_video(blob)
    sel, idx = sample_frames(blob, every_n=3)
    assert idx.tolist() == [0, 3, 6]
    assert np.array_equal(sel, frames[[0, 3, 6]])
    sel2, idx2 = sample_frames(blob, every_n=2, max_frames=3)
    assert idx2.tolist() == [0, 2, 4] and sel2.shape[0] == 3
    with pytest.raises(ValueError, match="every_n"):
        sample_frames(blob, every_n=0)
    # honest stub: a real MP4 box raises loudly
    with pytest.raises(NotImplementedError, match="stubbed"):
        sample_frames(b"\x00\x00\x00 ftypisom" + b"\x00" * 64)


def test_frame_sample_features_plumbing(spark):
    import pandas as pd

    rows = [
        {"media_id": "v0", "bytes": encode_fake_video("v0", 6, 4, 7),
         "width": 6, "height": 4, "n_frames": 7, "fps": 10, "fmt": "fvid"},
        {"media_id": "bad", "bytes": b"\x00\x00\x00 ftypisom" + b"\x00" * 32,
         "width": 0, "height": 0, "n_frames": 0, "fps": 0, "fmt": "mp4"},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows), schema=VIDEO_SCHEMA)
    out = frame_sample_features(df, every_n=2).collect()
    v0 = sorted((r for r in out if r["media_id"] == "v0"),
                key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in v0] == [0, 2, 4, 6]
    frames, _ = decode_video(rows[0]["bytes"])
    for r in v0:
        assert r["sum_luma"] == int(frames[r["frame_idx"]].astype(np.int64).sum())
        assert r["width"] == 6 and r["height"] == 4
    bad = [r for r in out if r["media_id"] == "bad"]
    assert len(bad) == 1 and bad[0]["frame_idx"] == -1 and bad[0]["sum_luma"] == -1
    # schema names match the declared FRAME_FEATURES_SCHEMA
    declared = [c.split()[0] for c in FRAME_FEATURES_SCHEMA.split(", ")]
    got = frame_sample_features(df).columns
    assert got == declared
