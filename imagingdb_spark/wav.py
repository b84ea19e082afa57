"""Pure-numpy WAV (RIFF) codec — un-stubs the audio decode seam for the
canonical uncompressed case, the same way png.py/tiff.py did for images.

Public format (Microsoft/IBM RIFF WAVE, 1991): a RIFF container whose
`fmt ` chunk describes the sample encoding and whose `data` chunk holds
the samples. Supported here: PCM (format tag 1) at 8/16/32 bits and IEEE
float (tag 3) at 32/64 bits, any channel count, any sample rate —
everything else (ADPCM, MP3-in-WAV) raises with a clear message and goes
through the injectable decoder seam (multimodal.audio_features) instead.

Executor contract: pure functions of bytes, no state — safe inside
mapInPandas batches.
"""

from __future__ import annotations

import struct

import numpy as np


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
    else:
        raise ValueError(
            f"unsupported WAV encoding (format tag {tag}, {bits}-bit); "
            "inject a soundfile-backed decoder for compressed audio"
        )
    if channels > 1:
        a = a[: len(a) - len(a) % channels].reshape(-1, channels)
    return a, rate, channels


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16
) -> bytes:
    """float samples in [-1, 1] (shape (n,) or (n, channels)) → PCM WAV
    bytes (16-bit default; 8/32 accepted)."""
    a = np.asarray(samples, dtype=np.float64)
    channels = 1 if a.ndim == 1 else a.shape[1]
    flat = np.clip(a.reshape(-1), -1.0, 1.0)
    if bits == 8:
        raw = (flat * 127.0 + 128.0).round().astype(np.uint8).tobytes()
    elif bits == 16:
        raw = (flat * 32767.0).round().astype("<i2").tobytes()
    elif bits == 32:
        raw = (flat * 2147483647.0).round().astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported PCM bit depth {bits}")
    block = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits
    )
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
