"""Pure-numpy WAV (RIFF) codec — un-stubs the audio decode seam for the
canonical uncompressed case, the same way png.py/tiff.py did for images.

Public format (Microsoft/IBM RIFF WAVE, 1991): a RIFF container whose
`fmt ` chunk describes the sample encoding and whose `data` chunk holds
the samples. Supported here: PCM (format tag 1) at 8/16/32 bits and IEEE
float (tag 3) at 32/64 bits, plus the ITU-T G.711 companded encodings —
A-law (tag 6) and mu-law (tag 7), vectorized from the public CCITT
reference arithmetic — any channel count, any sample rate. Block-stateful
or frame-based codecs (IMA/MS ADPCM, MP3-in-WAV) raise with a clear
message and go through the injectable decoder seam
(multimodal.audio_features) instead — that seam is now permanent, and
tests pin its error path.

Executor contract: pure functions of bytes, no state — safe inside
mapInPandas batches.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# ITU-T G.711 companding (public CCITT reference arithmetic, Sun ulaw.c
# lineage): 8-bit logarithmic bytes <-> 16-bit-scale linear samples.
# ---------------------------------------------------------------------------

_G711_SEGS = np.array(
    [0x100, 0x200, 0x400, 0x800, 0x1000, 0x2000, 0x4000, 0x8000], np.int32
)


def mulaw_decode(b: np.ndarray) -> np.ndarray:
    """mu-law bytes -> int32 linear on the 16-bit scale (max ±32124)."""
    u = ~b.astype(np.uint8) & 0xFF
    t = (((u & 0x0F).astype(np.int32) << 3) + 0x84) << ((u >> 4) & 0x07)
    mag = t - 0x84
    return np.where(u & 0x80, -mag, mag)


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """int linear (16-bit scale) -> mu-law bytes; inverse of mulaw_decode
    on its own outputs."""
    x = x.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    seg = np.searchsorted(_G711_SEGS, mag, side="right").astype(np.int32)
    mant = (mag >> (seg + 3)) & 0x0F
    return (~(sign | (seg << 4) | mant) & 0xFF).astype(np.uint8)


def alaw_decode(b: np.ndarray) -> np.ndarray:
    """A-law bytes -> int32 linear on the 16-bit scale (max ±32256)."""
    a = (b.astype(np.uint8) ^ 0x55).astype(np.int32)
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    t = np.where(seg == 0, t + 8, np.where(seg == 1, t + 0x108, 0))
    t = np.where(seg >= 2, (((a & 0x0F) << 4) + 0x108) << (seg - 1), t)
    return np.where(b.astype(np.uint8) & 0x80, t, -t)


def alaw_encode(x: np.ndarray) -> np.ndarray:
    """int linear (16-bit scale) -> A-law bytes; inverse of alaw_decode
    on its own outputs."""
    x = x.astype(np.int32)
    sign = np.where(x >= 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32767)
    seg = np.searchsorted(_G711_SEGS, mag, side="right").astype(np.int32)
    mant = np.where(seg < 2, (mag >> 4) & 0x0F, (mag >> (seg + 3)) & 0x0F)
    return ((sign | (seg << 4) | mant) ^ 0x55).astype(np.uint8)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int, int]:
    """WAV bytes → (samples, sample_rate, n_channels). Samples are float64
    scaled to [-1, 1], shaped (n,) for mono or (n, channels) otherwise.
    8-bit PCM is unsigned per spec (offset 128); 16/32-bit PCM signed."""
    buf = bytes(payload)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (bad RIFF/WAVE header)")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, channels, rate, _byte_rate, _block, bits = fmt
    if tag == 1 and bits == 8:
        a = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif tag == 1 and bits == 16:
        a = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
    elif tag == 1 and bits == 32:
        a = np.frombuffer(data, "<i4").astype(np.float64) / 2147483648.0
    elif tag == 3 and bits == 32:
        a = np.frombuffer(data, "<f4").astype(np.float64)
    elif tag == 3 and bits == 64:
        a = np.frombuffer(data, "<f8").astype(np.float64)
    elif tag == 6 and bits == 8:  # G.711 A-law
        a = alaw_decode(np.frombuffer(data, np.uint8)) / 32768.0
    elif tag == 7 and bits == 8:  # G.711 mu-law
        a = mulaw_decode(np.frombuffer(data, np.uint8)) / 32768.0
    else:
        raise ValueError(
            f"unsupported WAV encoding (format tag {tag}, {bits}-bit); "
            "inject a soundfile-backed decoder for block-stateful codecs "
            "(ADPCM/MP3) — permanent seam, see module docstring"
        )
    if channels > 1:
        a = a[: len(a) - len(a) % channels].reshape(-1, channels)
    return a, rate, channels


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16, codec: str = "pcm"
) -> bytes:
    """float samples in [-1, 1] (shape (n,) or (n, channels)) → WAV bytes.
    codec="pcm" (default; 8/16/32-bit) or the G.711 companded forms
    "mulaw"/"alaw" (8-bit bytes, 2:1 compression vs 16-bit PCM)."""
    a = np.asarray(samples, dtype=np.float64)
    channels = 1 if a.ndim == 1 else a.shape[1]
    flat = np.clip(a.reshape(-1), -1.0, 1.0)
    if codec == "mulaw":
        tag, bits = 7, 8
        raw = mulaw_encode((flat * 32767.0).round().astype(np.int32)).tobytes()
    elif codec == "alaw":
        tag, bits = 6, 8
        raw = alaw_encode((flat * 32767.0).round().astype(np.int32)).tobytes()
    elif codec != "pcm":
        raise ValueError(f"unsupported codec {codec!r} (pcm/mulaw/alaw)")
    elif bits == 8:
        tag = 1
        raw = (flat * 127.0 + 128.0).round().astype(np.uint8).tobytes()
    elif bits == 16:
        tag = 1
        raw = (flat * 32767.0).round().astype("<i2").tobytes()
    elif bits == 32:
        tag = 1
        raw = (flat * 2147483647.0).round().astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported PCM bit depth {bits}")
    block = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", tag, channels, sample_rate, sample_rate * block, block, bits
    )
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
