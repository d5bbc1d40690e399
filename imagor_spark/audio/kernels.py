"""Vectorized numpy audio kernels — the audio analogues of the reference's
libvips geometry + filter operators (SURVEY §2.2/§2.3 mapping).

Every kernel is a pure function over ``(pcm [ch, n] float32, sr)`` so the
same code is BOTH the Spark UDF hot path and the eager pytest oracle. No
per-sample Python anywhere: all loops are over channels (≤ a handful).

Axis convention (documented in SURVEY §1.3): the time axis plays the role of
the image X axis; ``W`` in ``WxH`` dims is the target sample rate (Hz) and
``H`` is the target duration (ms). Y-axis-only image ops map to channel /
polarity ops.
"""

from __future__ import annotations

import numpy as np


def _as_2d(pcm: np.ndarray) -> np.ndarray:
    pcm = np.asarray(pcm, dtype=np.float32)
    return pcm[np.newaxis, :] if pcm.ndim == 1 else pcm


def round_half_up(x: float) -> int:
    """Half-up rounding (NOT Python banker's rounding) — matches SQL
    ``round()`` in DuckDB/Spark so sample-count arithmetic is predictable
    from SQL oracles."""
    return int(np.floor(x + 0.5))


def ms_to_samples(ms: float, sr: int) -> int:
    return round_half_up(ms * sr / 1000.0)


def samples_to_ms(n: int, sr: int) -> int:
    return round_half_up(n * 1000.0 / sr)


# --------------------------------------------------------------- geometry


def crop_samples(pcm: np.ndarray, start: int, end: int) -> np.ndarray:
    """Extract [start, end) samples, clamped (≅ ExtractArea, process.go:607-649)."""
    pcm = _as_2d(pcm)
    n = pcm.shape[1]
    start = max(0, min(start, n))
    end = max(start, min(end, n))
    return pcm[:, start:end]


def resolve_crop_ms(left: float, right: float, dur_ms: float) -> tuple[float, float]:
    """Dual-interpretation crop coords (process.go:612-617): values < 1 are
    fractions of the original duration, >= 1 are absolute milliseconds."""
    t0 = left * dur_ms if left < 1 else left
    t1 = right * dur_ms if right < 1 else right
    t0 = max(0.0, min(t0, dur_ms))
    t1 = max(t0, min(t1, dur_ms))
    return t0, t1


def find_trim(pcm: np.ndarray, tolerance: int, trim_by: str) -> tuple[int, int]:
    """Silence-trim bounds (≅ vips FindTrim, process.go:1020-1054).

    Background level is referenced at the anchored end — leading sample for
    ``top-left`` (default), trailing sample for ``bottom-right`` — then both
    ends are stripped of samples within ``max(tolerance,1)/255`` of it.
    Returns (start, end) sample indices; full range if everything is quiet.
    """
    pcm = _as_2d(pcm)
    n = pcm.shape[1]
    if n == 0:
        return 0, 0
    tol = max(int(tolerance), 1) / 255.0
    mono = np.abs(pcm).max(axis=0)
    bg = mono[-1] if trim_by == "bottom-right" else mono[0]
    active = np.abs(mono - bg) > tol
    idx = np.flatnonzero(active)
    if idx.size == 0:
        return 0, n
    return int(idx[0]), int(idx[-1]) + 1


def resample(pcm: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Sample-rate conversion via vectorized linear interpolation.

    Output length is ``round(n * sr_out / sr_in)`` — the arithmetic contract
    the SQL oracles rely on. (Linear interp stands in for libvips' reduce
    kernels; the oracle runs the identical kernel so parity is exact.)
    """
    pcm = _as_2d(pcm)
    if sr_in == sr_out or pcm.shape[1] == 0:
        return pcm
    n_in = pcm.shape[1]
    n_out = round_half_up(n_in * sr_out / sr_in)
    if n_out <= 0:
        return pcm[:, :0]
    # sample positions in input space
    pos = np.arange(n_out, dtype=np.float64) * (n_in / n_out)
    return np.stack([np.interp(pos, np.arange(n_in), c) for c in pcm]).astype(np.float32)


def stretch_to_samples(pcm: np.ndarray, n_out: int) -> np.ndarray:
    """Force exact output length ignoring rate (≅ SizeForce, process.go:706-713):
    time-stretch by resampling without pitch preservation."""
    pcm = _as_2d(pcm)
    n_in = pcm.shape[1]
    if n_in == n_out:
        return pcm
    if n_in == 0 or n_out <= 0:
        return np.zeros((pcm.shape[0], max(n_out, 0)), dtype=np.float32)
    pos = np.arange(n_out, dtype=np.float64) * (n_in / n_out)
    return np.stack([np.interp(pos, np.arange(n_in), c) for c in pcm]).astype(np.float32)


def pad(pcm: np.ndarray, before: int, after: int, fill: float = 0.0) -> np.ndarray:
    """Silence padding (≅ embed/fill, filteroverlay.go:129-211)."""
    pcm = _as_2d(pcm)
    return np.pad(pcm, ((0, 0), (max(before, 0), max(after, 0))), constant_values=fill)


def cut_or_pad(pcm: np.ndarray, n_target: int, h_align: str, smart_window: int | None = None) -> np.ndarray:
    """Fill-crop to exactly ``n_target`` samples (≅ thumbnail-then-crop with
    Interesting{Centre,Low,High,Attention}, process.go:714-749).

    h_align: ''/'center' → centre, 'left' → keep start (Low), 'right' → keep
    end (High). ``smart_window`` (start sample) overrides when smart crop
    picked an energy window (InterestingAttention analogue)."""
    pcm = _as_2d(pcm)
    n = pcm.shape[1]
    if n == n_target:
        return pcm
    if n > n_target:
        if smart_window is not None:
            start = max(0, min(smart_window, n - n_target))
        elif h_align == "left":
            start = 0
        elif h_align == "right":
            start = n - n_target
        else:
            start = (n - n_target) // 2
        return pcm[:, start : start + n_target]
    deficit = n_target - n
    if h_align == "left":
        before, after = 0, deficit
    elif h_align == "right":
        before, after = deficit, 0
    else:
        before = deficit // 2
        after = deficit - before
    return pad(pcm, before, after)


def smart_window_start(pcm: np.ndarray, n_target: int, hop: int = 256) -> int:
    """Max-RMS-energy window start (≅ InterestingAttention smart crop,
    process.go:437-441). Vectorized rolling energy via cumsum."""
    pcm = _as_2d(pcm)
    n = pcm.shape[1]
    if n <= n_target:
        return 0
    energy = (pcm.astype(np.float64) ** 2).sum(axis=0)
    csum = np.concatenate([[0.0], np.cumsum(energy)])
    starts = np.arange(0, n - n_target + 1, max(hop, 1))
    windows = csum[starts + n_target] - csum[starts]
    return int(starts[int(np.argmax(windows))])


def focal_window_start(
    focal_spans: list[tuple[float, float]], n: int, n_target: int
) -> int:
    """Area-weighted focal centroid → window start (≅ parseFocalPoint,
    process.go:1007-1018 + FocalThumbnail processor.go:453-473).

    ``focal_spans`` are (start, end) in samples of the original timeline."""
    if not focal_spans or n <= n_target:
        return 0
    weights = np.array([max(e - s, 1.0) for s, e in focal_spans])
    centers = np.array([(s + e) / 2.0 for s, e in focal_spans])
    centroid = float((weights * centers).sum() / weights.sum())
    start = int(round(centroid - n_target / 2.0))
    return max(0, min(start, n - n_target))


def reverse(pcm: np.ndarray) -> np.ndarray:
    """Time reversal (h-flip analogue, process.go:751-760)."""
    return _as_2d(pcm)[:, ::-1]


def invert_polarity(pcm: np.ndarray) -> np.ndarray:
    """Polarity inversion (v-flip analogue)."""
    return -_as_2d(pcm)


# ---------------------------------------------------------------- filters


def gain_db(pcm: np.ndarray, db: float) -> np.ndarray:
    """Multiplicative gain in dB, clipped to [-1, 1]."""
    return np.clip(_as_2d(pcm) * (10.0 ** (db / 20.0)), -1.0, 1.0).astype(np.float32)


def brightness(pcm: np.ndarray, b: float) -> np.ndarray:
    """DC offset add: x + b/100 (≅ linear brightness, filter.go:153-160)."""
    return np.clip(_as_2d(pcm) + b / 100.0, -1.0, 1.0).astype(np.float32)


def contrast(pcm: np.ndarray, a: float) -> np.ndarray:
    """Dynamic-range expand/compress about 0 using the reference's exact
    coefficient (filter.go:162-172): f = 259(a+255) / (255(259-a))."""
    a = max(-100.0, min(100.0, a))
    # scale the 0-255-space coefficient into amplitude space; midpoint 128 ≅ 0
    f = (259.0 * (a + 255.0)) / (255.0 * (259.0 - a))
    return np.clip(_as_2d(pcm) * f, -1.0, 1.0).astype(np.float32)


def grayscale(pcm: np.ndarray) -> np.ndarray:
    """Downmix to mono (≅ colourspace B/W, filter.go:149-151)."""
    return _as_2d(pcm).mean(axis=0, keepdims=True).astype(np.float32)


def channel_gains(pcm: np.ndarray, gains_pct: list[float]) -> np.ndarray:
    """Per-channel gain offsets ±100% (≅ rgb(), filter.go:191-202)."""
    pcm = _as_2d(pcm).copy()
    for i, g in enumerate(gains_pct[: pcm.shape[0]]):
        pcm[i] = np.clip(pcm[i] * (1.0 + g / 100.0), -1.0, 1.0)
    return pcm


def _gaussian_kernel(sigma_samples: float) -> np.ndarray:
    radius = max(1, int(round(4 * sigma_samples)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2.0 * sigma_samples**2))
    return (k / k.sum()).astype(np.float32)


def gaussian_lowpass(pcm: np.ndarray, sigma_ms: float, sr: int) -> np.ndarray:
    """Gaussian smoothing of the waveform (≅ blur, filter.go:216-235).
    sigma in ms → samples; edges are reflect-padded."""
    pcm = _as_2d(pcm)
    sigma = max(sigma_ms, 1e-3) * sr / 1000.0
    k = _gaussian_kernel(sigma)
    r = (len(k) - 1) // 2
    if pcm.shape[1] == 0:
        return pcm
    padded = np.pad(pcm, ((0, 0), (r, r)), mode="reflect" if pcm.shape[1] > 1 else "edge")
    return np.stack([np.convolve(c, k, mode="valid") for c in padded]).astype(np.float32)


def sharpen(pcm: np.ndarray, sigma: float, sr: int) -> np.ndarray:
    """Unsharp-mask high-frequency emphasis (≅ filter.go:271-294):
    x + (1 + 2*sigma) scaled residual of a gaussian smooth."""
    blurred = gaussian_lowpass(pcm, sigma, sr)
    amount = 1.0 + 2.0 * sigma
    return np.clip(_as_2d(pcm) + amount * (_as_2d(pcm) - blurred), -1.0, 1.0).astype(np.float32)


def lowpass_fft(pcm: np.ndarray, cutoff_frac: float) -> np.ndarray:
    """Brickwall low-pass at ``cutoff_frac`` of Nyquist via rFFT zeroing —
    deterministic, fully vectorized."""
    pcm = _as_2d(pcm)
    n = pcm.shape[1]
    if n == 0 or cutoff_frac >= 1.0:
        return pcm
    spec = np.fft.rfft(pcm, axis=1)
    cut = int(round(cutoff_frac * (spec.shape[1] - 1)))
    spec[:, cut + 1 :] = 0
    return np.fft.irfft(spec, n=n, axis=1).astype(np.float32)


def pixelate(pcm: np.ndarray, block: int) -> np.ndarray:
    """Sample-hold bit-crush: average blocks of N samples then repeat
    (≅ integer box-shrink + pixel-replication zoom, filter.go:246-269)."""
    pcm = _as_2d(pcm)
    block = max(int(block), 1)
    if block == 1 or pcm.shape[1] == 0:
        return pcm
    ch, n = pcm.shape
    nb = n // block
    out = pcm.copy()
    if nb > 0:
        head = pcm[:, : nb * block].reshape(ch, nb, block).mean(axis=2)
        out[:, : nb * block] = np.repeat(head, block, axis=1)
    if n > nb * block:
        tail_mean = pcm[:, nb * block :].mean(axis=1, keepdims=True)
        out[:, nb * block :] = tail_mean
    return out.astype(np.float32)


def fade(pcm: np.ndarray, in_ms: float, out_ms: float, sr: int) -> np.ndarray:
    """Raised-cosine fade-in/out envelope (≅ round_corner, filter.go:20-70)."""
    pcm = _as_2d(pcm).copy()
    n = pcm.shape[1]
    n_in = min(ms_to_samples(in_ms, sr), n)
    n_out = min(ms_to_samples(out_ms, sr), n)
    if n_in > 0:
        ramp = 0.5 * (1 - np.cos(np.pi * np.arange(n_in) / n_in))
        pcm[:, :n_in] *= ramp.astype(np.float32)
    if n_out > 0:
        ramp = 0.5 * (1 - np.cos(np.pi * np.arange(n_out) / n_out))
        pcm[:, n - n_out :] *= ramp[::-1].astype(np.float32)
    return pcm


def phase_shift(pcm: np.ndarray, degrees: float) -> np.ndarray:
    """Uniform spectral phase rotation (≅ hue rotation, filter.go:174-180):
    multiply every rFFT bin by e^{iθ}. DC/Nyquist stay real."""
    pcm = _as_2d(pcm)
    n = pcm.shape[1]
    if n == 0:
        return pcm
    spec = np.fft.rfft(pcm, axis=1)
    rot = np.exp(1j * np.deg2rad(degrees))
    spec[:, 1:-1] *= rot
    return np.fft.irfft(spec, n=n, axis=1).astype(np.float32)


def stereo_width(pcm: np.ndarray, mult: float) -> np.ndarray:
    """Mid/side width scaling (≅ saturation multiplier, filter.go:182-189):
    side *= mult. Mono passes through unchanged."""
    pcm = _as_2d(pcm)
    if pcm.shape[0] < 2:
        return pcm
    mid = (pcm[0] + pcm[1]) / 2.0
    side = (pcm[0] - pcm[1]) / 2.0 * mult
    out = pcm.copy()
    out[0] = np.clip(mid + side, -1.0, 1.0)
    out[1] = np.clip(mid - side, -1.0, 1.0)
    return out.astype(np.float32)


def quantize_bits(pcm: np.ndarray, bits: int) -> np.ndarray:
    """Sample-format conversion (≅ to_colorspace/bitdepth, filter.go:301-316,
    export bitdepth): quantize to `bits`-bit grid and back to float32."""
    bits = max(2, min(int(bits), 24))
    q = float(2 ** (bits - 1) - 1)
    return (np.round(np.clip(_as_2d(pcm), -1, 1) * q) / q).astype(np.float32)


def detect_energy_spans(
    pcm: np.ndarray, sr: int, threshold: float = 0.1, win_ms: float = 50.0
) -> list[tuple[float, float]]:
    """Region-of-interest detector (≅ Detector interface, detector.go:26-30):
    contiguous windows whose RMS exceeds ``threshold``, returned as
    normalized [0,1] spans of the clip timeline (the reference's detectors
    also return normalized coords, detector.go:7-11)."""
    pcm = _as_2d(pcm)
    n = pcm.shape[1]
    if n == 0:
        return []
    win = max(ms_to_samples(win_ms, sr), 1)
    n_win = int(np.ceil(n / win))
    padded = np.zeros(n_win * win, dtype=np.float64)
    padded[:n] = (pcm.astype(np.float64) ** 2).mean(axis=0)
    w_rms = np.sqrt(padded.reshape(n_win, win).mean(axis=1))
    active = w_rms > threshold
    spans: list[tuple[float, float]] = []
    start = None
    for i, a in enumerate(active):
        if a and start is None:
            start = i
        elif not a and start is not None:
            spans.append((start * win / n, min(i * win / n, 1.0)))
            start = None
    if start is not None:
        spans.append((start * win / n, 1.0))
    return spans


def redact_spans(
    pcm: np.ndarray,
    sr: int,
    spans: list[tuple[float, float]],
    mode: str = "mute",
) -> np.ndarray:
    """Overwrite detected spans (≅ redact filter, filterdetection.go:226-285):
    'mute' → silence, 'bleep' → 1 kHz tone, 'blur' → heavy low-pass of the
    span (the pixelate/blur redact modes' audio analogues)."""
    pcm = _as_2d(pcm).copy()
    n = pcm.shape[1]
    for s, e in spans:
        a, b = int(round(s * n)), int(round(e * n))
        if b <= a:
            continue
        if mode == "bleep":
            t = np.arange(b - a) / sr
            pcm[:, a:b] = 0.3 * np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
        elif mode == "blur":
            pcm[:, a:b] = gaussian_lowpass(pcm[:, a:b], 5.0, sr)
        else:  # mute
            pcm[:, a:b] = 0.0
    return pcm


def rms(pcm: np.ndarray) -> float:
    """Mean power (≅ avgcolor Stats mean, filter.go:391-441)."""
    pcm = _as_2d(pcm)
    if pcm.size == 0:
        return 0.0
    return float(np.sqrt((pcm.astype(np.float64) ** 2).mean()))


def rms_db(pcm: np.ndarray) -> float:
    r = rms(pcm)
    return -120.0 if r <= 10 ** (-120 / 20) else float(20.0 * np.log10(r))


def normalize_rms(pcm: np.ndarray, target_db: float) -> np.ndarray:
    """Normalize RMS loudness to target dBFS; silent input passes through."""
    current = rms(pcm)
    if current <= 1e-9:
        return _as_2d(pcm)
    factor = (10.0 ** (target_db / 20.0)) / current
    return np.clip(_as_2d(pcm) * factor, -1.0, 1.0).astype(np.float32)


def mix(
    pcm: np.ndarray,
    overlay: np.ndarray,
    offset_samples: int,
    alpha_pct: float,
    repeat: bool = False,
) -> np.ndarray:
    """Audio watermark: mix-add overlay at offset with transparency alpha
    (0 = full level, 100 = inaudible — matches imagor watermark alpha,
    filteroverlay.go:66-127). ``repeat`` loop-tiles to cover the clip."""
    base = _as_2d(pcm).copy()
    over = _as_2d(overlay)
    gain = max(0.0, min(1.0, 1.0 - alpha_pct / 100.0))
    if gain == 0.0 or over.shape[1] == 0 or base.shape[1] == 0:
        return base
    # channel-match: downmix or tile overlay channels to base channels
    if over.shape[0] != base.shape[0]:
        over = np.tile(over.mean(axis=0, keepdims=True), (base.shape[0], 1))
    n = base.shape[1]
    if repeat:
        reps = int(np.ceil((n + max(offset_samples, 0)) / over.shape[1]))
        over = np.tile(over, (1, max(reps, 1)))
    start = max(offset_samples, 0)
    src_skip = max(-offset_samples, 0)
    length = min(n - start, over.shape[1] - src_skip)
    if length > 0:
        base[:, start : start + length] += gain * over[:, src_skip : src_skip + length]
    return np.clip(base, -1.0, 1.0).astype(np.float32)


def select_channel(pcm: np.ndarray, page: int) -> np.ndarray:
    """page(n) → channel select, 1-based (≅ page/frame select,
    processor.go:518-542)."""
    pcm = _as_2d(pcm)
    i = max(0, min(page - 1, pcm.shape[0] - 1))
    return pcm[i : i + 1]


def limit_channels(pcm: np.ndarray, max_ch: int) -> np.ndarray:
    """max_frames(n) → channel limit."""
    return _as_2d(pcm)[: max(int(max_ch), 1)]


def fingerprint(pcm: np.ndarray, bands: int = 16) -> str:
    """Coarse spectral hash (≅ blurhash/thumbhash, filter.go:444-513):
    band-energy bits of the mono rFFT, hex-encoded."""
    mono = _as_2d(pcm).mean(axis=0)
    if mono.size < 2:
        return "0" * (bands // 4)
    spec = np.abs(np.fft.rfft(mono.astype(np.float64)))
    edges = np.linspace(0, len(spec), bands + 1, dtype=int)
    energies = np.array([
        spec[a:b].mean() if b > a else 0.0 for a, b in zip(edges[:-1], edges[1:])
    ])
    median = np.median(energies)
    bits = (energies > median).astype(int)
    val = int("".join(map(str, bits)), 2)
    return format(val, "0%dx" % (bands // 4))


def snr_db(expected: np.ndarray, actual: np.ndarray) -> float:
    """Signal-to-noise ratio of actual vs expected — the per-row correctness
    invariant (BASELINE input_hint: SNR >= 30 dB)."""
    e = _as_2d(expected).astype(np.float64)
    a = _as_2d(actual).astype(np.float64)
    if e.shape != a.shape:
        return float("-inf")
    sig = (e**2).sum()
    noise = ((e - a) ** 2).sum()
    if noise == 0:
        return float("inf")
    if sig == 0:
        return float("-inf")
    return float(10.0 * np.log10(sig / noise))


# ---------------------------------------------------- fill / bed kernels


_NAMED_LUMINANCE = {
    "white": 1.0, "black": 0.0, "gray": 0.5, "grey": 0.5,
    "red": 0.299, "green": 0.587, "blue": 0.114, "yellow": 0.886,
    "cyan": 0.701, "magenta": 0.413, "silver": 0.75,
}


def color_luminance(c: str) -> float:
    """Color token → luminance fraction [0,1] (Rec.601 weights for hex,
    lookup for CSS names) — the bed-level knob for fill/background_color
    (≅ the fill color parse, filteroverlay.go:150-168)."""
    c = (c or "").strip().lower().lstrip("#")
    if c in _NAMED_LUMINANCE:
        return _NAMED_LUMINANCE[c]
    if len(c) == 3 and all(ch in "0123456789abcdef" for ch in c):
        c = "".join(ch * 2 for ch in c)
    if len(c) == 6 and all(ch in "0123456789abcdef" for ch in c):
        r, g, b = (int(c[i : i + 2], 16) / 255.0 for i in (0, 2, 4))
        return 0.299 * r + 0.587 * g + 0.114 * b
    return 0.0


def noise_floor(pcm: np.ndarray, sr: int, win_ms: float = 50.0) -> float:
    """Quietest-window RMS — the clip's noise floor (the 'auto' bed level,
    ≅ fill auto's average-color probe, filteroverlay.go:141-149)."""
    pcm = _as_2d(pcm)
    n = pcm.shape[1]
    if n == 0:
        return 0.0
    win = max(ms_to_samples(win_ms, sr), 1)
    n_win = max(n // win, 1)
    e = (pcm.astype(np.float64) ** 2).mean(axis=0)
    w_rms = np.sqrt(e[: n_win * win].reshape(n_win, win).mean(axis=1))
    return float(w_rms.min())


# amplitude scale for color beds: full-white = -26 dBFS hum, black = silence
_BED_FULL_AMP = 0.05
_BED_HZ = 100.0


def make_bed(n: int, sr: int, mode: str, pcm: np.ndarray) -> np.ndarray:
    """Bed generator for fill/background_color (SURVEY §2.3 mapping:
    silence / noise-floor hum / low-passed-copy):

    * ``none``/``transparent``/black → silence
    * ``auto``  → 100 Hz hum at the clip's noise-floor RMS
    * ``blur``  → low-passed copy of the clip, loop-tiled to length
    * color name/hex → 100 Hz hum at luminance × -26 dBFS
    """
    pcm = _as_2d(pcm)
    ch = pcm.shape[0]
    if n <= 0:
        return np.zeros((ch, 0), dtype=np.float32)
    mode = (mode or "").strip().lower()
    if mode == "blur" and pcm.shape[1] > 0:
        low = gaussian_lowpass(pcm, 5.0, sr)
        reps = int(np.ceil(n / low.shape[1]))
        return np.tile(low, (1, reps))[:, :n].astype(np.float32)
    if mode == "auto":
        amp = noise_floor(pcm, sr) if pcm.shape[1] else 0.0
    elif mode in ("", "none", "transparent"):
        amp = 0.0
    else:
        amp = color_luminance(mode) * _BED_FULL_AMP
    if amp <= 0.0:
        return np.zeros((ch, n), dtype=np.float32)
    t = np.arange(n, dtype=np.float64) / max(sr, 1)
    hum = (amp * np.sqrt(2.0) * np.sin(2 * np.pi * _BED_HZ * t)).astype(np.float32)
    return np.tile(hum, (ch, 1))


def letterbox(pcm: np.ndarray, n_target: int, h_align: str, mode: str, sr: int) -> np.ndarray:
    """Extend the clip to exactly ``n_target`` samples with a bed
    (fill letterboxing, filteroverlay.go:129-211). Never cuts — fit-in
    contain semantics; alignment mirrors :func:`cut_or_pad`."""
    pcm = _as_2d(pcm)
    n = pcm.shape[1]
    if n >= n_target:
        return pcm
    deficit = n_target - n
    if h_align == "left":
        before, after = 0, deficit
    elif h_align == "right":
        before, after = deficit, 0
    else:
        before = deficit // 2
        after = deficit - before
    return np.concatenate(
        [make_bed(before, sr, mode, pcm), pcm, make_bed(after, sr, mode, pcm)], axis=1
    ).astype(np.float32)


def flatten_silence(
    pcm: np.ndarray, sr: int, mode: str, threshold: float = 1e-4, win_ms: float = 10.0
) -> np.ndarray:
    """background_color analogue (filter.go:95-106 flattens alpha onto a
    color): replace sustained silent REGIONS with the bed so transparent
    regions carry the background level. Silence is judged per window (peak
    < threshold), not per sample — a waveform's zero-crossings are signal,
    not background."""
    pcm = _as_2d(pcm).copy()
    n = pcm.shape[1]
    if n == 0:
        return pcm
    bed = make_bed(n, sr, mode, pcm)
    win = max(ms_to_samples(win_ms, sr), 1)
    n_win = int(np.ceil(n / win))
    peaks = np.zeros(n_win * win, dtype=np.float32)
    peaks[:n] = np.abs(pcm).max(axis=0)
    w_peak = peaks.reshape(n_win, win).max(axis=1)
    mask = np.repeat(w_peak < threshold, win)[:n]
    pcm[:, mask] = bed[:, mask]
    return pcm.astype(np.float32)


def rotate_channels(pcm: np.ndarray, degrees: float) -> np.ndarray:
    """orient/rotate → channel permutation for multichannel audio
    (SURVEY §2.2: RotMultiPage ≅ roll the channel axis by deg/90; mono is
    the documented no-op degenerate)."""
    pcm = _as_2d(pcm)
    k = int(round(degrees / 90.0)) % 4
    if pcm.shape[0] < 2 or k == 0:
        return pcm
    return np.roll(pcm, k % pcm.shape[0], axis=0)


_MASK_GATE = 0.01  # overlay-activity threshold for the mask gates
_BLEND_EPS = 1e-6


def _blend_op(mode: str, region: np.ndarray, o: np.ndarray) -> np.ndarray | None:
    """Per-sample mix op for one blend mode (audio analogues of the vips
    separable blend formulas). Pixel-luminance formulas are applied in the
    magnitude domain (|sample| ∈ [0,1] ≅ luminance) with the base sample's
    sign reattached; signed-algebra modes (difference/exclusion/darken/
    lighten/multiply) use the samples directly. Returns None for names that
    are not mix ops (the caller falls back to over semantics)."""
    r = region
    ar, ao = np.abs(r), np.abs(o)
    sg = np.where(r >= 0, 1.0, -1.0)
    if mode == "multiply":  # ring modulation
        return r * o
    if mode == "mask":  # gate: base passes only where overlay is active
        return r * (ao > _MASK_GATE)
    if mode == "mask-out":  # inverse gate (BlendModeDestOut)
        return r * (ao <= _MASK_GATE)
    if mode == "screen":  # 1-(1-a)(1-b) on magnitudes
        return sg * (1.0 - (1.0 - ar) * (1.0 - ao))
    if mode == "darken":  # keep the quieter sample
        return np.where(ao < ar, o, r)
    if mode == "lighten":  # keep the louder sample
        return np.where(ao > ar, o, r)
    if mode == "difference":  # cancellation mix (phase-inverted overlay)
        return r - o
    if mode == "exclusion":  # a+b-2ab (exact separable formula)
        return r + o - 2.0 * r * o
    if mode == "color-dodge":  # a/(1-b): overlay-driven expansion
        return sg * np.minimum(ar / np.maximum(1.0 - ao, _BLEND_EPS), 1.0)
    if mode == "color-burn":  # 1-(1-a)/b
        return sg * (1.0 - np.minimum((1.0 - ar) / np.maximum(ao, _BLEND_EPS), 1.0))
    if mode == "overlay":  # hard-light with args swapped
        return sg * np.where(ar < 0.5, 2.0 * ar * ao, 1.0 - 2.0 * (1.0 - ar) * (1.0 - ao))
    if mode == "hard-light":
        return sg * np.where(ao < 0.5, 2.0 * ar * ao, 1.0 - 2.0 * (1.0 - ar) * (1.0 - ao))
    if mode == "soft-light":  # pegtop: (1-2b)a² + 2ba
        return sg * ((1.0 - 2.0 * ao) * ar * ar + 2.0 * ao * ar)
    return None


def blend_overlay(
    base: np.ndarray,
    over: np.ndarray,
    offset_samples: int,
    alpha_pct: float,
    mode: str = "over",
    repeat: bool = False,
) -> np.ndarray:
    """Blend-mode composite for image()/overlay — the full 15-name
    blendModeMap (overlay.go:154-170) as audio mix ops (SURVEY §2.3):

    * ``normal``/``over``/``add``/'' → mix-add (the watermark path)
    * ``multiply`` → ring mod; ``mask``/``mask-out`` → activity gates
    * ``screen``/``darken``/``lighten``/``difference``/``exclusion``/
      ``color-dodge``/``color-burn``/``overlay``/``hard-light``/
      ``soft-light`` → the vips separable formulas on sample magnitudes
      (see ``_blend_op``)

    ``alpha``: 0 = fully applied … 100 = inaudible (imagor alpha polarity);
    non-normal modes crossfade wet/dry by alpha. ``repeat`` loop-tiles the
    overlay to cover the base so repeat composes with every blend mode.
    """
    mode = (mode or "over").strip().lower()
    if mode in ("", "over", "add", "normal"):
        return mix(base, over, offset_samples, alpha_pct, repeat=repeat)
    base2 = _as_2d(base).copy()
    over = _as_2d(over)
    wet = max(0.0, min(1.0, 1.0 - alpha_pct / 100.0))
    if wet == 0.0 or over.shape[1] == 0 or base2.shape[1] == 0:
        return base2
    if over.shape[0] != base2.shape[0]:
        over = np.tile(over.mean(axis=0, keepdims=True), (base2.shape[0], 1))
    if repeat:
        reps = int(np.ceil((base2.shape[1] + max(offset_samples, 0)) / over.shape[1]))
        over = np.tile(over, (1, max(reps, 1)))
    start = max(offset_samples, 0)
    skip = max(-offset_samples, 0)
    length = min(base2.shape[1] - start, over.shape[1] - skip)
    if length <= 0:
        return base2
    region = base2[:, start : start + length]
    o = over[:, skip : skip + length]
    blended = _blend_op(mode, region, o)
    if blended is None:  # unknown blend name → over semantics (reference default)
        return mix(base, over, offset_samples, alpha_pct, repeat=repeat)
    base2[:, start : start + length] = (1.0 - wet) * region + wet * blended
    return np.clip(base2, -1.0, 1.0).astype(np.float32)
