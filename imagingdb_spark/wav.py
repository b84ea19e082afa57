"""Pure-numpy WAV (RIFF) codec — un-stubs the audio decode seam for the
canonical uncompressed case, the same way png.py/tiff.py did for images.

Public format (Microsoft/IBM RIFF WAVE, 1991): a RIFF container whose
`fmt ` chunk describes the sample encoding and whose `data` chunk holds
the samples. Supported here: PCM (format tag 1) at 8/16/32 bits and IEEE
float (tag 3) at 32/64 bits, the ITU-T G.711 companded encodings —
A-law (tag 6) and mu-law (tag 7), vectorized from the public CCITT
reference arithmetic — IMA/DVI ADPCM (tag 0x11, 4-bit differential
with per-block restart headers, mono/stereo), and MS ADPCM (tag 2,
two-tap prediction from the 7 standard coefficient sets or a custom
fmt-chunk table, per-block idelta adaptation, the reference
algorithm's truncate-toward-zero arithmetic) — any channel count, any
sample rate. Only MP3-in-WAV (tag 0x55) remains behind the injectable
decoder seam (multimodal.audio_features) with its error path pinned
by test — a full MPEG audio decoder is out of scope.

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


# IMA/DVI ADPCM (WAV format tag 0x11; public spec: IMA Digital Audio
# Pack, 1992): 4-bit differential coding with a per-block restart header
# (predictor int16 + step index uint8 per channel), nibbles low-first,
# stereo interleaved in 4-byte words per channel. The decode is
# inherently sequential per block (state-carrying), so it runs as a
# Python loop — clips decode inside mapInPandas one payload per call,
# where block counts are small; the codec exists to close the input
# class, not to be a hot path.

_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    ],
    dtype=np.int32,
)
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_decode_nibbles(
    nibbles, predictor: int, index: int
) -> tuple[list[int], int]:
    out = []
    for b in nibbles:
        step = int(_IMA_STEPS[index])
        diff = step >> 3
        if b & 1:
            diff += step >> 2
        if b & 2:
            diff += step >> 1
        if b & 4:
            diff += step
        predictor = (
            max(-32768, predictor - diff)
            if b & 8
            else min(32767, predictor + diff)
        )
        index = min(88, max(0, index + _IMA_INDEX[b & 7]))
        out.append(predictor)
    return out, index


def ima_adpcm_decode(
    data: bytes, channels: int, block_align: int
) -> np.ndarray:
    """IMA ADPCM data chunk → int16 samples, shape (n,) mono / (n, ch)."""
    per_ch: list[list[int]] = [[] for _ in range(channels)]
    # a trailing SHORT block (header present, fewer nibble words) still
    # decodes — same real-world-encoder case as the MS ADPCM tail fix;
    # the inner word loop already stops at the data that exists
    hdr = 4 * channels
    starts = list(range(0, len(data) - (len(data) % block_align), block_align))
    tail = len(data) % block_align
    if tail >= hdr:
        starts.append(len(data) - tail)
    for bstart in starts:
        block = data[bstart : bstart + block_align]
        preds, idxs = [], []
        for c in range(channels):
            p, i = struct.unpack_from("<hBx", block, c * 4)
            preds.append(p)
            idxs.append(min(88, max(0, i)))
            per_ch[c].append(p)  # the header predictor IS sample 0
        body = block[4 * channels :]
        # nibble stream per channel: 4-byte words round-robin by channel
        for w0 in range(0, len(body) - (len(body) % (4 * channels)),
                        4 * channels):
            for c in range(channels):
                word = body[w0 + 4 * c : w0 + 4 * c + 4]
                nibs = []
                for byte in word:
                    nibs.append(byte & 0x0F)
                    nibs.append(byte >> 4)
                decoded, idxs[c] = _ima_decode_nibbles(
                    nibs, per_ch[c][-1], idxs[c]
                )
                per_ch[c].extend(decoded)
    n = min(len(x) for x in per_ch)
    if channels == 1:
        return np.array(per_ch[0][:n], dtype=np.int16)
    return np.stack(
        [np.array(x[:n], dtype=np.int16) for x in per_ch], axis=1
    )


def ima_adpcm_encode(
    samples_i16: np.ndarray, samples_per_block: int = 505
) -> tuple[bytes, int, int]:
    """int16 samples (mono (n,) or (n, ch)) → (data, block_align,
    samples_per_block): the round-trip twin. samples_per_block counts the
    header sample; mono default 505 → block_align 256."""
    a = np.asarray(samples_i16, dtype=np.int16)
    channels = 1 if a.ndim == 1 else a.shape[1]
    if a.ndim == 1:
        a = a[:, None]
    spb = samples_per_block
    if (spb - 1) % 8 != 0:
        raise ValueError("samples_per_block must be 1 + multiple of 8")
    words_per_block = (spb - 1) // 8
    block_align = 4 * channels + 4 * channels * words_per_block
    # pad to whole blocks (trailing repeats of the last sample)
    n = a.shape[0]
    n_blocks = (n + spb - 1) // spb
    pad = n_blocks * spb - n
    if pad:
        a = np.vstack([a, np.repeat(a[-1:], pad, axis=0)])
    out = bytearray()
    idx = [0] * channels
    for b in range(n_blocks):
        seg = a[b * spb : (b + 1) * spb]
        preds = [int(seg[0, c]) for c in range(channels)]
        if b == 0:
            # the per-block header re-seeds the decoder's step index, so
            # the encoder may pick it freely: seed from the first block's
            # median |delta| instead of 0, killing the slope-overload
            # transient a cold index-0 start suffers on real signals
            for c in range(channels):
                d_med = float(
                    np.median(np.abs(np.diff(seg[:, c].astype(np.int32))))
                )
                idx[c] = int(
                    min(88, np.searchsorted(_IMA_STEPS, max(7.0, d_med)))
                )
        for c in range(channels):
            out += struct.pack("<hBx", preds[c], idx[c])
        nibs: list[list[int]] = [[] for _ in range(channels)]
        for s in range(1, spb):
            for c in range(channels):
                step = int(_IMA_STEPS[idx[c]])
                delta = int(seg[s, c]) - preds[c]
                code = 0
                if delta < 0:
                    code = 8
                    delta = -delta
                if delta >= step:
                    code |= 4
                    delta -= step
                if delta >= step >> 1:
                    code |= 2
                    delta -= step >> 1
                if delta >= step >> 2:
                    code |= 1
                # reconstruct exactly like the decoder
                diff = step >> 3
                if code & 1:
                    diff += step >> 2
                if code & 2:
                    diff += step >> 1
                if code & 4:
                    diff += step
                preds[c] = (
                    max(-32768, preds[c] - diff)
                    if code & 8
                    else min(32767, preds[c] + diff)
                )
                idx[c] = min(88, max(0, idx[c] + _IMA_INDEX[code & 7]))
                nibs[c].append(code)
        for w0 in range(words_per_block):
            for c in range(channels):
                chunk = nibs[c][w0 * 8 : w0 * 8 + 8]
                for k in range(0, 8, 2):
                    out.append(chunk[k] | (chunk[k + 1] << 4))
    return bytes(out), block_align, spb


# MS ADPCM (WAV format tag 2; the Microsoft multimedia reference
# algorithm, public): two-tap linear prediction from 7 standard
# coefficient sets chosen per block, 4-bit signed residuals scaled by a
# per-block idelta that adapts through a 16-entry table. The reference
# arithmetic divides by 256 with C truncation toward zero — mirrored
# exactly here (Python // floors, so negatives need the explicit form).

_MS_COEF1 = [256, 512, 0, 192, 240, 460, 392]
_MS_COEF2 = [0, -256, 0, 64, 0, -208, -232]
_MS_ADAPT = [
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
]


def _trunc_div(x: int, d: int) -> int:
    """C-style integer division (truncate toward zero)."""
    return x // d if (x >= 0) == (d >= 0) else -((-x) // d)


def ms_adpcm_decode(
    data: bytes,
    channels: int,
    block_align: int,
    coefs: list[tuple[int, int]] | None = None,
) -> np.ndarray:
    """MS ADPCM data chunk → int16 samples, (n,) mono / (n, ch).
    ``coefs`` overrides the 7 standard predictor sets (the fmt chunk may
    carry a custom table; indexes beyond it raise — corrupt stream)."""
    table = coefs or list(zip(_MS_COEF1, _MS_COEF2))
    hdr = 7 * channels
    if block_align < hdr:
        raise ValueError(
            f"MS ADPCM block_align {block_align} shorter than the "
            f"{hdr}-byte header (corrupt fmt chunk)"
        )
    per_ch: list[list[int]] = [[] for _ in range(channels)]
    # a trailing SHORT block (header present, fewer nibbles) still decodes
    # — real-world encoders emit one when the stream length is not a
    # multiple of samples_per_block; dropping it would lose tail samples
    starts = list(range(0, len(data) - (len(data) % block_align), block_align))
    tail = len(data) % block_align
    if tail >= hdr:
        starts.append(len(data) - tail)
    for bstart in starts:
        block = data[bstart : bstart + block_align]
        pred_idx = list(block[:channels])
        if any(p >= len(table) for p in pred_idx):
            raise ValueError("MS ADPCM predictor index beyond coef table")
        c1 = [table[p][0] for p in pred_idx]
        c2 = [table[p][1] for p in pred_idx]
        ideltas = [
            struct.unpack_from("<h", block, channels + 2 * c)[0]
            for c in range(channels)
        ]
        s1 = [
            struct.unpack_from("<h", block, 3 * channels + 2 * c)[0]
            for c in range(channels)
        ]
        s2 = [
            struct.unpack_from("<h", block, 5 * channels + 2 * c)[0]
            for c in range(channels)
        ]
        for c in range(channels):
            per_ch[c].append(s2[c])  # s2 is the OLDER warm-up sample
            per_ch[c].append(s1[c])
        ch = 0
        for byte in block[hdr:]:
            for nib in (byte >> 4, byte & 0xF):  # high nibble first
                sn = nib - 16 if nib >= 8 else nib
                pred = _trunc_div(s1[ch] * c1[ch] + s2[ch] * c2[ch], 256)
                pred = max(-32768, min(32767, pred + sn * ideltas[ch]))
                s2[ch], s1[ch] = s1[ch], pred
                ideltas[ch] = max(
                    16, _trunc_div(_MS_ADAPT[nib] * ideltas[ch], 256)
                )
                per_ch[ch].append(pred)
                ch = (ch + 1) % channels
    n = min(len(x) for x in per_ch)
    if channels == 1:
        return np.array(per_ch[0][:n], dtype=np.int16)
    return np.stack(
        [np.array(x[:n], dtype=np.int16) for x in per_ch], axis=1
    )


def ms_adpcm_encode(
    samples_i16: np.ndarray, samples_per_block: int = 500
) -> tuple[bytes, int, int]:
    """int16 samples → (data, block_align, samples_per_block): the
    round-trip twin. Each block tries all 7 standard predictor sets and
    keeps the least-error one (the reference encoder's discipline);
    samples_per_block counts the two warm-up header samples."""
    a = np.asarray(samples_i16, dtype=np.int16)
    channels = 1 if a.ndim == 1 else a.shape[1]
    if a.ndim == 1:
        a = a[:, None]
    spb = samples_per_block
    if spb < 4 or (spb - 2) % 2:
        raise ValueError("samples_per_block must be even and >= 4")
    block_align = 7 * channels + (spb - 2) * channels // 2
    n = a.shape[0]
    n_blocks = (n + spb - 1) // spb
    pad = n_blocks * spb - n
    if pad:
        a = np.vstack([a, np.repeat(a[-1:], pad, axis=0)])

    def _encode_channel(seg, pidx):
        c1, c2 = _MS_COEF1[pidx], _MS_COEF2[pidx]
        s2, s1 = int(seg[0]), int(seg[1])
        resid = np.abs(np.diff(seg.astype(np.int64)))
        idelta = max(16, int(resid.mean()) // 4 if len(resid) else 16)
        nibs, err = [], 0
        d0 = idelta
        for s in range(2, len(seg)):
            pred = _trunc_div(s1 * c1 + s2 * c2, 256)
            e = int(seg[s]) - pred
            # nearest residual level (decoder adds sn*idelta verbatim)
            sn = max(-8, min(7, int(round(e / idelta))))
            nib = sn + 16 if sn < 0 else sn
            rec = max(-32768, min(32767, pred + sn * idelta))
            err += abs(int(seg[s]) - rec)
            nibs.append(nib)
            s2, s1 = s1, rec
            idelta = max(16, _trunc_div(_MS_ADAPT[nib] * idelta, 256))
        return err, d0, nibs

    out = bytearray()
    for b in range(n_blocks):
        seg = a[b * spb : (b + 1) * spb]
        best = []
        for c in range(channels):
            trials = [
                (_encode_channel(seg[:, c], p), p) for p in range(7)
            ]
            (err, d0, nibs), p = min(trials, key=lambda t: t[0][0])
            best.append((p, d0, nibs))
        out += bytes(p for p, _, _ in best)
        for _, d0, _ in best:
            out += struct.pack("<h", d0)
        for c in range(channels):
            out += struct.pack("<h", int(seg[1, c]))  # sample1 (newer)
        for c in range(channels):
            out += struct.pack("<h", int(seg[0, c]))  # sample2 (older)
        # nibbles round-robin by channel, high nibble first
        stream = [
            best[ch][2][k]
            for k in range(spb - 2)
            for ch in range(channels)
        ]
        for k in range(0, len(stream), 2):
            out.append((stream[k] << 4) | stream[k + 1])
    return bytes(out), block_align, spb


def _fact_trim(s: np.ndarray, fact_len: int | None, spb: int) -> np.ndarray:
    """Apply the fact chunk's true-length trim ONLY when it is consistent
    with the decoded ADPCM length — i.e. it removes at most one block's
    worth of encoder padding (``len(s) - samples_per_block < fact_len <=
    len(s)``). A corrupt fact value (0, or anything far below the
    decoded length) would otherwise silently truncate the audio to
    near-empty (round-9 ADVICE); such values are ignored and the decoded
    length stands."""
    if fact_len is None:
        return s
    if max(0, len(s) - max(spb, 0)) < fact_len <= len(s):
        return s[:fact_len]
    return s


def decode_wav(payload: bytes) -> tuple[np.ndarray, int, int]:
    """WAV bytes → (samples, sample_rate, n_channels). Samples are float64
    scaled to [-1, 1], shaped (n,) for mono or (n, channels) otherwise.
    8-bit PCM is unsigned per spec (offset 128); 16/32-bit PCM signed."""
    buf = bytes(payload)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (bad RIFF/WAVE header)")
    pos, fmt, data = 12, None, None
    fmt_body = b""
    fact_len = None  # fact chunk: true per-channel sample count
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and size >= 4:
            (fact_len,) = struct.unpack("<I", body[:4])
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
    elif tag == 0x11 and bits == 4:  # IMA/DVI ADPCM
        s = ima_adpcm_decode(data, channels, fmt[4])
        spb = ((fmt[4] - 4 * channels) * 2) // channels + 1
        s = _fact_trim(s, fact_len, spb)
        return s.astype(np.float64) / 32768.0, rate, channels
    elif tag == 2 and bits == 4:  # MS ADPCM
        coefs = None
        # fmt extension: cbSize@16, wSamplesPerBlock@18, wNumCoef@20,
        # then (coef1, coef2) int16 pairs from 22
        if len(fmt_body) >= 22:
            (ncoef,) = struct.unpack_from("<H", fmt_body, 20)
            if ncoef and len(fmt_body) >= 22 + 4 * ncoef:
                coefs = [
                    struct.unpack_from("<hh", fmt_body, 22 + 4 * i)
                    for i in range(ncoef)
                ]
        s = ms_adpcm_decode(data, channels, fmt[4], coefs)
        spb = ((fmt[4] - 7 * channels) * 2) // channels + 2
        s = _fact_trim(s, fact_len, spb)
        return s.astype(np.float64) / 32768.0, rate, channels
    else:
        raise ValueError(
            f"unsupported WAV encoding (format tag {tag}, {bits}-bit); "
            "inject a soundfile-backed decoder for the remaining "
            "frame-based codecs (MP3-in-WAV) — see module docstring"
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
    elif codec == "adpcm":
        i16 = (np.clip(a, -1.0, 1.0) * 32767.0).round().astype(np.int16)
        raw, block, spb = ima_adpcm_encode(i16)
        fmt_x = struct.pack(
            "<HHIIHHHH",
            0x11, channels, sample_rate,
            sample_rate * block // spb, block, 4,
            2,  # cbSize
            spb,  # wSamplesPerBlock
        )
        chunks = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt_x)) + fmt_x
            + b"data" + struct.pack("<I", len(raw)) + raw
        )
        return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
    elif codec == "ms_adpcm":
        i16 = (np.clip(a, -1.0, 1.0) * 32767.0).round().astype(np.int16)
        raw, block, spb = ms_adpcm_encode(
            i16 if channels == 1 else i16.reshape(-1, channels)
        )
        coef_tab = b"".join(
            struct.pack("<hh", c1, c2)
            for c1, c2 in zip(_MS_COEF1, _MS_COEF2)
        )
        fmt_x = struct.pack(
            "<HHIIHHHHH",
            2, channels, sample_rate,
            sample_rate * block // spb, block, 4,
            4 + len(coef_tab),  # cbSize: spb + ncoef + table
            spb, 7,
        ) + coef_tab
        chunks = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt_x)) + fmt_x
            + b"data" + struct.pack("<I", len(raw)) + raw
        )
        return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
    elif codec != "pcm":
        raise ValueError(
            f"unsupported codec {codec!r} (pcm/mulaw/alaw/adpcm/ms_adpcm)"
        )
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
