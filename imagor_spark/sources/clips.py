"""Deterministic synthetic clips source — the engine's test/bench input.

Produces the exact ``input_hint`` table shape (BASELINE.json):
``(clip_id string, bytes binary, sr_hz int, dur_ms int, codec string,
transcript string)`` plus engine columns ``ingest_ts timestamp`` and
``ops string`` (a signed imagor-style path). Everything is a pure function
of (seed, row index) so the pytest oracle can regenerate expected PCM
without storing goldens — mirroring the reference's fixed testdata corpus
strategy (/root/reference/testdata/, processor_test.go:1383-1468).

Codec distribution is intentionally SKEWED ({wav:.70 flac:.25 ogg:.04
mp3:.01}, FIXTURES.md §1) to exercise salted repartitioning on the hot key.

Scale note: this generator is for tests/bench only. At 10^12-clip scale the
input is an existing Iceberg table; generation here is embarrassingly
parallel (pure function of index) and runs distributed via mapInPandas in
``generate_clips_df`` — no driver-side loop, no collect.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

from ..audio import codecs, kernels
from ..imagorpath import HMACSigner

SECRET = "1234"  # engine signing secret for fixtures (FIXTURES.md §3)
SIGNER = HMACSigner("sha1", 0, SECRET)

CODECS = np.array(["wav", "flac", "ogg", "mp3"])
CODEC_P = np.array([0.70, 0.25, 0.04, 0.01])
SR_CHOICES = np.array([8000, 16000, 22050, 44100, 48000])

_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim minim veniam"
).split()

# weighted ops-path templates (FIXTURES.md §4); {cid} replaced per row
OPS_TEMPLATES = [
    (0.20, ""),  # passthrough identity
    (0.15, "fit-in/16000x0/"),
    (0.12, "200x0:1500x0/"),
    (0.08, "0.1x0:0.8x0/"),
    (0.06, "trim/"),
    (0.04, "trim:bottom-right:100/"),
    (0.10, "filters:normalize(-14):format(flac)/"),
    (0.06, "stretch/8000x500/"),
    (0.05, "-0x0/"),
    (0.05, "200x0:1300x0/filters:fade(50,50)/"),
    (0.04, "filters:lowpass(0.5):gain(-6)/"),
    (0.03, "filters:watermark(beep,repeat,,70)/"),
    (0.02, "meta/"),
]
_OPS_W = np.array([w for w, _ in OPS_TEMPLATES])
_OPS_W = _OPS_W / _OPS_W.sum()

BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _rng_for(seed: int, idx: int) -> np.random.Generator:
    return np.random.Generator(np.random.Philox(key=seed, counter=[0, 0, 0, idx]))


def synth_pcm(seed: int, idx: int, sr: int, dur_ms: int) -> np.ndarray:
    """Deterministic waveform: 1-3 sine tones + optional noise, fully
    determined by (seed, idx). Leading/trailing silence is injected for a
    fraction of rows so trim has something to strip."""
    rng = _rng_for(seed, idx)
    n = kernels.ms_to_samples(dur_ms, sr)
    t = np.arange(n, dtype=np.float64) / sr
    n_tones = int(rng.integers(1, 4))
    x = np.zeros(n, dtype=np.float64)
    for _ in range(n_tones):
        freq = float(rng.uniform(80.0, min(4000.0, sr / 2.5)))
        amp = float(rng.uniform(0.1, 0.5))
        phase = float(rng.uniform(0, 2 * np.pi))
        x += amp * np.sin(2 * np.pi * freq * t + phase)
    if rng.random() < 0.3:
        x += rng.normal(0.0, 0.02, n)
    x = np.clip(x / max(np.abs(x).max(), 1.0), -0.99, 0.99)
    if rng.random() < 0.25 and n > 400:
        lead = int(rng.integers(0, n // 8))
        tail = int(rng.integers(0, n // 8))
        if lead:
            x[:lead] = 0.0
        if tail:
            x[-tail:] = 0.0
    return x.astype(np.float32)


def _transcript(idx: int) -> str:
    h = int(hashlib.sha1(f"clip{idx:08d}".encode()).hexdigest()[:8], 16)
    k = 4 + h % 9
    return " ".join(_WORDS[(h + j) % len(_WORDS)] for j in range(k))


def make_row(seed: int, idx: int, signed: str = "unsafe") -> dict:
    """One deterministic clip row. ``signed``: 'unsafe' | 'signed' |
    'bad-sig' (~1% in streams, exercising the rejection plane)."""
    rng = _rng_for(seed, idx)
    # ~1% duplicated clip_ids exercise single-render-per-key dedup
    dup = idx > 100 and rng.random() < 0.01
    cid = f"clip{(idx - 7 if dup else idx):08d}"
    sr = int(SR_CHOICES[int(rng.integers(0, len(SR_CHOICES)))])
    # log-uniform 200-5000 ms
    dur_ms = int(round(float(np.exp(rng.uniform(np.log(200), np.log(5000))))))
    codec = str(CODECS[int(rng.choice(len(CODECS), p=CODEC_P))])
    pcm = synth_pcm(seed, idx, sr, dur_ms)
    blob = codecs.encode(pcm, sr, codec)
    tmpl = OPS_TEMPLATES[int(rng.choice(len(OPS_TEMPLATES), p=_OPS_W))][1]
    path = tmpl + cid
    if signed == "signed":
        ops = SIGNER.sign(path) + "/" + path
    elif signed == "bad-sig":
        ops = "X" * 28 + "/" + path
    else:
        ops = "unsafe/" + path
    # monotone-ish event time with ±30 s jitter + 0.5% very-late tail
    offset = idx * 0.05 + float(rng.uniform(-30, 30))
    if rng.random() < 0.005:
        offset -= 900.0
    ingest_ts = BASE_TS + timedelta(seconds=offset)
    return {
        "clip_id": cid,
        "bytes": blob,
        "sr_hz": sr,
        "dur_ms": dur_ms,
        "codec": codec,
        "transcript": _transcript(idx - 7 if dup else idx),
        "ingest_ts": ingest_ts,
        "ops": ops,
    }


def _mode_for(seed: int, i: int, signed_mix: bool) -> str:
    if not signed_mix:
        return "unsafe"
    r = _rng_for(seed ^ 0x5151, i).random()
    return "bad-sig" if r < 0.01 else ("signed" if r < 0.51 else "unsafe")


def make_pdf(seed: int, indices, signed_mix: bool = True) -> pd.DataFrame:
    """A pandas batch for the given row indices. With ``signed_mix``,
    ~49% unsafe / ~50% signed / ~1% invalid signatures."""
    rows = [make_row(seed, int(i), _mode_for(seed, int(i), signed_mix)) for i in indices]
    return pd.DataFrame(rows)


CLIPS_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
    "transcript string, ingest_ts timestamp, ops string"
)

WATERMARK_ASSETS_SEED = 777


def watermark_assets() -> dict[str, tuple[np.ndarray, int]]:
    """Small broadcast asset table (FIXTURES.md §5): beep, chirp, noise —
    resolved by the watermark/mix filter via broadcast lookup (≅ the
    loader fetch in filteroverlay.go:66-127)."""
    sr = 16000
    t = np.arange(int(sr * 0.25)) / sr
    beep = (0.3 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
    chirp = (0.3 * np.sin(2 * np.pi * (200 + 1800 * t / t[-1]) * t)).astype(np.float32)
    rng = np.random.Generator(np.random.Philox(WATERMARK_ASSETS_SEED))
    noise = (0.1 * rng.normal(0, 1, len(t))).astype(np.float32)
    return {"beep": (beep, sr), "chirp": (chirp, sr), "noise": (noise, sr)}


def generate_clips_df(spark, n_rows: int, seed: int = 42, signed_mix: bool = True,
                      partitions: int | None = None):
    """Distributed generation: a range DataFrame mapInPandas'd through
    ``make_pdf`` — each partition generates its own slice (no driver loop,
    scales linearly with executors)."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_rows, 1, parts)

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield make_pdf(seed, pdf["id"].to_numpy(), signed_mix)

    return base.mapInPandas(gen, schema=CLIPS_SCHEMA)
