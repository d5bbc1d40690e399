"""Audio codec plane — encode/decode/sniff for the ``bytes`` payload column.

The reference treats payloads as opaque blobs with magic-byte sniffing into a
``BlobType`` enum (/root/reference/blob.go:24-47, sniffing blob.go:393-456).
Audio analogue: codec enum {wav, flac, ogg, mp3} detected from container
magic; decoded form is float32 PCM in [-1, 1] shaped ``[channels, samples]``
(≅ the raw ``memory{data,width,height,bands}`` form, blob.go:253-258).

Container reality in this sandbox: no libsndfile/ffmpeg is installed, so

* ``wav``  — REAL RIFF/WAVE PCM16 (numpy-only mux/demux, spec-conformant).
* ``flac`` — REAL FLAC via soundfile/libsndfile WHEN IMPORTABLE (wired
  below; not present in this sandbox container), else a DETERMINISTIC
  STAND-IN: ``fLaC``-magic container carrying zlib-compressed PCM16 —
  lossless round-trip, real compression, not a real bitstream. Existing
  stand-in payloads keep decoding either way (layouts distinguished by
  byte 4).
* ``ogg``  — REAL Ogg/Vorbis via soundfile WHEN IMPORTABLE (libsndfile ≥
  1.0.18 ships the codec; wired like FLAC, stand-in payloads distinguished
  by byte 4 = real Ogg's stream_structure_version 0x00 vs the stand-in's
  version tag 1), else the deterministic stand-in below.
* ``mp3`` (and ``ogg`` fallback) — DETERMINISTIC STAND-INs for lossy codecs:
  magic-tagged containers carrying bit-depth-reduced PCM (quality → bits), so
  the quality/max_bytes retry loop (process.go:144-177) has a real size knob
  and decode is deterministic for the SNR oracle.

All stand-ins raise ``NotImplementedError`` from ``strict_decode`` when fed a
*real* FLAC/OGG/MP3 bitstream (zlib/shape check fails) — the plumbing is
real, the codec math is stubbed per driver instructions.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # pragma: no cover - not present in this container
    import soundfile as _soundfile  # noqa: F401

    HAVE_SOUNDFILE = True
except Exception:  # pragma: no cover
    HAVE_SOUNDFILE = False

# ≅ BlobType enum (blob.go:24-47)
CODEC_WAV = "wav"
CODEC_FLAC = "flac"
CODEC_OGG = "ogg"
CODEC_MP3 = "mp3"
SUPPORTED_CODECS = (CODEC_WAV, CODEC_FLAC, CODEC_OGG, CODEC_MP3)

_MAGIC_RIFF = b"RIFF"
_MAGIC_FLAC = b"fLaC"
_MAGIC_OGG = b"OggS"
_MAGIC_MP3 = b"ID3\x04"  # stand-in container tag

# stand-in payload header: magic + version + sr(u32) + ch(u16) + bits(u16) + n(u64)
_HDR = struct.Struct("<4sBIHHQ")


def sniff(blob: bytes) -> str:
    """Magic-byte codec detection over the first bytes (≅ blob.go:393-456).

    Unknown payloads return "" (≅ BlobTypeUnknown)."""
    if len(blob) < 4:
        return ""
    head = blob[:4]
    if head == _MAGIC_RIFF and blob[8:12] == b"WAVE":
        return CODEC_WAV
    if head == _MAGIC_FLAC:
        return CODEC_FLAC
    if head == _MAGIC_OGG:
        return CODEC_OGG
    if blob[:3] == b"ID3" or (len(blob) > 1 and blob[0] == 0xFF and (blob[1] & 0xE0) == 0xE0):
        return CODEC_MP3
    return ""


def _to_int16(pcm: np.ndarray, bits: int = 16) -> np.ndarray:
    x = np.clip(pcm, -1.0, 1.0)
    if bits >= 16:
        return np.round(x * 32767.0).astype(np.int16)
    # bit-depth reduction: quantize to `bits` then re-express as int16 —
    # the stand-in "lossy" knob (quality maps to bits in encode())
    q = float(2 ** (bits - 1) - 1)
    return (np.round(x * q) * (32767.0 / q)).astype(np.int16)


def _from_int16(data: np.ndarray) -> np.ndarray:
    return (data.astype(np.float32) / 32767.0).astype(np.float32)


def _as_2d(pcm: np.ndarray) -> np.ndarray:
    pcm = np.asarray(pcm, dtype=np.float32)
    if pcm.ndim == 1:
        return pcm[np.newaxis, :]
    return pcm


# ---------------------------------------------------------------- WAV (real)


def encode_wav(pcm: np.ndarray, sr: int) -> bytes:
    """Spec-conformant RIFF/WAVE PCM16 mux (interleaved)."""
    pcm = _as_2d(pcm)
    ch, n = pcm.shape
    data = _to_int16(pcm).T.reshape(-1).tobytes()  # interleave
    byte_rate = sr * ch * 2
    block_align = ch * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sr, byte_rate, block_align, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def wav_header_info(blob: bytes) -> tuple[int, int, int] | None:
    """(sr, channels, n_samples) from the RIFF header WITHOUT touching the
    sample data — the cheap probe shrink-on-load and bomb guards need
    (≅ reading the source header before thumbnail_source, process.go:325+)."""
    if blob[:4] != _MAGIC_RIFF or blob[8:12] != b"WAVE":
        return None
    pos = 12
    sr = ch = bits = None
    data_size = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        if cid == b"fmt ":
            _, ch, sr, _, _, bits = struct.unpack_from("<HHIIHH", blob, pos + 8)
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)
    if sr is None or data_size is None or bits != 16:
        return None
    n = (data_size // 2) // max(ch, 1)
    return int(sr), int(ch), int(n)


def decode_wav(blob: bytes, target_sr: int | None = None) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 demux. With ``target_sr``, decodes directly at the
    target rate when that is BIT-EXACT — integer stride k = sr/target with
    k | n, where ``kernels.resample``'s linear interp lands on exact sample
    positions (pos = i·k) so strided int16 selection equals full-decode +
    resample. Otherwise falls back to the full decode (caller resamples) —
    the shrink-on-load analogue of decode-at-target-size
    (process.go:325-507), exactness-gated instead of approximate."""
    if blob[:4] != _MAGIC_RIFF or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sr = ch = bits = None
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            _, ch, sr, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if sr is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise NotImplementedError(f"only PCM16 WAV supported, got {bits}-bit")
    arr = np.frombuffer(data, dtype=np.int16)
    if ch > 1:
        arr = arr[: (len(arr) // ch) * ch].reshape(-1, ch).T
    else:
        arr = arr[np.newaxis, :]
    if target_sr and target_sr < sr and sr % target_sr == 0:
        k = sr // target_sr
        if arr.shape[1] % k == 0:
            arr = arr[:, ::k]
            sr = target_sr
    return _from_int16(np.ascontiguousarray(arr)), int(sr)


# ------------------------------------------------- stand-in containers


def _encode_standin(magic: bytes, pcm: np.ndarray, sr: int, bits: int, compress: bool) -> bytes:
    pcm = _as_2d(pcm)
    ch, n = pcm.shape
    raw = _to_int16(pcm, bits=bits).tobytes()
    if compress:
        raw = zlib.compress(raw, level=6)
    return _HDR.pack(magic, 1, sr, ch, bits, n) + raw


def _decode_standin(blob: bytes, magic: bytes, compress: bool) -> tuple[np.ndarray, int]:
    if blob[:4] != magic:
        raise ValueError("bad magic")
    _, ver, sr, ch, bits, n = _HDR.unpack_from(blob, 0)
    body = blob[_HDR.size :]
    if compress:
        try:
            body = zlib.decompress(body)
        except zlib.error as exc:
            raise NotImplementedError(
                "real compressed bitstream decode is stubbed in this sandbox "
                "(no libsndfile/ffmpeg) — only the deterministic stand-in "
                "container is supported"
            ) from exc
    arr = np.frombuffer(body, dtype=np.int16)
    if len(arr) != ch * n:
        raise NotImplementedError("payload is not a stand-in container")
    return _from_int16(arr.reshape(ch, n)), int(sr)


# ------------------------------------------- real FLAC via soundfile
# When libsndfile/soundfile IS present (not in this sandbox container),
# FLAC encode/decode routes through it behind the same encode()/decode()
# interface — real lossless bitstreams instead of the zlib stand-in. The
# stand-in container stays both as the no-soundfile fallback and as the
# deterministic corpus format (existing stand-in payloads keep decoding:
# the two container layouts are distinguished by byte 4).


def _is_standin_flac(blob: bytes) -> bool:
    """Stand-in layout = ``fLaC`` + version byte 1 (+ sane header); a REAL
    FLAC stream's byte 4 is the STREAMINFO block header (0x00/0x80)."""
    if len(blob) < _HDR.size or blob[4] != 1:
        return False
    try:
        _, _, sr, ch, bits, _ = _HDR.unpack_from(blob, 0)
    except struct.error:
        return False
    return 0 < sr <= 384_000 and 0 < ch <= 8 and bits in (16,)


def _encode_flac_soundfile(pcm: np.ndarray, sr: int) -> bytes:
    import io

    buf = io.BytesIO()
    _soundfile.write(buf, _as_2d(pcm).T, sr, format="FLAC", subtype="PCM_16")
    return buf.getvalue()


def _decode_flac_soundfile(blob: bytes) -> tuple[np.ndarray, int]:
    import io

    # NOTE: soundfile scales int16→float32 by 1/32768 vs the stand-in's
    # 1/32767 — a 3e-5 relative difference, far inside the ≥30 dB SNR
    # contract the pipeline verifies against the numpy oracle
    data, sr = _soundfile.read(io.BytesIO(blob), dtype="float32", always_2d=True)
    return np.ascontiguousarray(data.T), int(sr)


# ------------------------------------------- real Ogg/Vorbis via soundfile
# libsndfile ≥ 1.0.18 ships an Ogg/Vorbis codec, so when soundfile imports,
# OGG routes through it exactly like FLAC above. Discriminator: the stand-in
# container's byte 4 is its version tag (1); a REAL Ogg page's byte 4 is the
# stream_structure_version, which is 0x00 — existing stand-in payloads keep
# decoding either way.


def _is_standin_ogg(blob: bytes) -> bool:
    if len(blob) < _HDR.size or blob[4] != 1:
        return False
    try:
        _, _, sr, ch, bits, _ = _HDR.unpack_from(blob, 0)
    except struct.error:
        return False
    return 0 < sr <= 384_000 and 0 < ch <= 8 and 4 <= bits <= 16


def _sf_write_with_quality(buf, pcm: np.ndarray, sr: int, fmt: str,
                           subtype: str, quality: int | None) -> None:
    """soundfile write honouring the 0-100 quality knob via libsndfile's
    compression level (1.0 = max compression/smallest). Without this the
    max_bytes quality-retry loop (process.go:144-177) re-encoded identical
    bytes on soundfile hosts and could never meet the budget (r5 ADVICE
    #3). Older soundfile builds without the kwarg fall back to default
    quality — the retry then converges on the floor as before."""
    kwargs = {}
    if quality is not None:
        q = max(1, min(100, quality))
        kwargs["compression_level"] = round(1.0 - q / 100.0, 4)
    try:
        _soundfile.write(buf, _as_2d(pcm).T, sr, format=fmt, subtype=subtype,
                         **kwargs)
    except TypeError:  # soundfile < 0.12: no compression_level kwarg
        _soundfile.write(buf, _as_2d(pcm).T, sr, format=fmt, subtype=subtype)


def _encode_ogg_soundfile(pcm: np.ndarray, sr: int,
                          quality: int | None = None) -> bytes:
    import io

    buf = io.BytesIO()
    # Vorbis has no bit-depth knob; quality maps to the encoder's
    # compression level instead (the stand-in's quality→bits analogue)
    _sf_write_with_quality(buf, pcm, sr, "OGG", "VORBIS", quality)
    return buf.getvalue()


def _decode_ogg_soundfile(blob: bytes) -> tuple[np.ndarray, int]:
    import io

    data, sr = _soundfile.read(io.BytesIO(blob), dtype="float32", always_2d=True)
    return np.ascontiguousarray(data.T), int(sr)


# ------------------------------------------- real MP3 via soundfile
# libsndfile ≥ 1.1.0 ships an MPEG Layer III codec (lame/mpg123), so when
# soundfile imports AND its libsndfile build lists MP3, the mp3 codec routes
# through it like FLAC/OGG. Discriminator: the stand-in's magic is
# ``ID3\x04`` with its version tag 1 at byte 4; a REAL ID3v2.4 header has
# revision 0x00 there (and ID3v2.3 / bare 0xFFEx frame-sync streams never
# match the stand-in magic at all) — existing stand-in payloads keep
# decoding either way.


def _soundfile_mp3() -> bool:
    if not HAVE_SOUNDFILE:
        return False
    try:
        return "MP3" in _soundfile.available_formats()
    except Exception:
        return False


def _is_standin_mp3(blob: bytes) -> bool:
    if len(blob) < _HDR.size or blob[:4] != _MAGIC_MP3 or blob[4] != 1:
        return False
    try:
        _, _, sr, ch, bits, _ = _HDR.unpack_from(blob, 0)
    except struct.error:
        return False
    return 0 < sr <= 384_000 and 0 < ch <= 8 and 4 <= bits <= 16


def _encode_mp3_soundfile(pcm: np.ndarray, sr: int,
                          quality: int | None = None) -> bytes:
    import io

    buf = io.BytesIO()
    _sf_write_with_quality(buf, pcm, sr, "MP3", "MPEG_LAYER_III", quality)
    return buf.getvalue()


def _decode_mp3_soundfile(blob: bytes) -> tuple[np.ndarray, int]:
    import io

    data, sr = _soundfile.read(io.BytesIO(blob), dtype="float32", always_2d=True)
    return np.ascontiguousarray(data.T), int(sr)


def _bits_for_quality(codec: str, quality: int | None) -> int:
    """quality (0-100, encoder default 75 ≅ vipsconfig defaults) → stand-in
    bit depth. Only the lossy stand-ins honour it."""
    if codec in (CODEC_WAV, CODEC_FLAC):
        return 16
    q = 75 if quality is None else max(1, min(100, quality))
    return max(4, min(16, int(round(4 + (q / 100.0) * 12))))


def encode(pcm: np.ndarray, sr: int, codec: str, quality: int | None = None) -> bytes:
    """Encode PCM → container bytes. Unsupported codec falls back to wav
    (≅ supportedSaveFormat fallback, process.go:869-875)."""
    codec = (codec or CODEC_WAV).lower()
    if codec == CODEC_WAV:
        return encode_wav(pcm, sr)
    if codec == CODEC_FLAC:
        if HAVE_SOUNDFILE:
            return _encode_flac_soundfile(pcm, sr)
        return _encode_standin(_MAGIC_FLAC, pcm, sr, 16, compress=True)
    if codec == CODEC_OGG:
        if HAVE_SOUNDFILE:
            return _encode_ogg_soundfile(pcm, sr, quality)
        return _encode_standin(_MAGIC_OGG, pcm, sr, _bits_for_quality(codec, quality), compress=True)
    if codec == CODEC_MP3:
        if _soundfile_mp3():
            return _encode_mp3_soundfile(pcm, sr, quality)
        return _encode_standin(_MAGIC_MP3, pcm, sr, _bits_for_quality(codec, quality), compress=True)
    return encode_wav(pcm, sr)


def decode(blob: bytes, target_sr: int | None = None) -> tuple[np.ndarray, int, str]:
    """Decode container bytes → (pcm [ch, n] float32, sr, codec).

    ``target_sr``: shrink-on-load hint — the WAV path decodes directly at
    the target when bit-exactness holds (see :func:`decode_wav`); the
    zlib stand-in containers cannot partially decode (a real flac/ogg
    decoder would honour it) so they ignore the hint."""
    codec = sniff(bytes(blob))
    if codec == CODEC_WAV:
        pcm, sr = decode_wav(blob, target_sr=target_sr)
    elif codec == CODEC_FLAC:
        if not _is_standin_flac(blob) and HAVE_SOUNDFILE:
            pcm, sr = _decode_flac_soundfile(blob)
        else:
            # stand-in container — or a real bitstream without soundfile,
            # where this raises the documented NotImplementedError
            pcm, sr = _decode_standin(blob, _MAGIC_FLAC, compress=True)
    elif codec == CODEC_OGG:
        if not _is_standin_ogg(blob) and HAVE_SOUNDFILE:
            pcm, sr = _decode_ogg_soundfile(blob)
        else:
            # stand-in container — or a real bitstream without soundfile,
            # where this raises the documented NotImplementedError
            pcm, sr = _decode_standin(blob, _MAGIC_OGG, compress=True)
    elif codec == CODEC_MP3:
        if not _is_standin_mp3(blob) and _soundfile_mp3():
            pcm, sr = _decode_mp3_soundfile(blob)
        else:
            # stand-in container — or a real bitstream without an MP3-capable
            # libsndfile, where this raises the documented NotImplementedError
            pcm, sr = _decode_standin(blob, _MAGIC_MP3, compress=True)
    else:
        raise ValueError("unknown payload codec (≅ ErrUnsupportedFormat)")
    return pcm, sr, codec


def supported_save_codec(codec: str) -> str:
    """≅ supportedSaveFormat (process.go:869-875): unsupported → wav."""
    c = (codec or "").lower()
    return c if c in SUPPORTED_CODECS else CODEC_WAV
