"""Pure-numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1, public spec)
— narrows the TIFF codec seam: Compression 6/7 (JPEG-in-TIFF) pages now
decode natively instead of requiring an injected tifffile-backed
page_reader (the reference reads these via tifffile,
ometif_splitter.py:68-106). Scope is the BASELINE process the frame
contract needs: 8-bit sequential DCT, Huffman entropy coding, grayscale
or YCbCr with sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0), restart
markers. Progressive (SOF2), arithmetic coding, 12-bit, and hierarchical
modes still raise with a clear message — that residue stays behind the
injectable seam.

``encode_jpeg`` emits baseline 4:4:4 (or single-component) streams with
the Annex K example tables — the synthetic-data twin used by the
round-trip tests, exactly the role _lzw_encode plays for the LZW path.

Executor contract: pure functions of bytes, no state — safe inside
mapInPandas batches. Hot loops are numpy-vectorized per 8x8-block batch
(DCT/IDCT as two 8x8 matrix products over a (n, 8, 8) stack); the
entropy coder is a per-symbol Python loop, acceptable for the frame
sizes the imaging contract carries per task.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Shared constants (T.81 Annex K example tables; the de-facto defaults)
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K Huffman specs: (BITS[1..16], HUFFVAL)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# 8x8 type-II DCT basis: D @ block @ D.T is the forward transform
_DCT = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _dct2(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)


def _idct2(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ji,njk,kl->nil", _DCT, blocks, _DCT)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per T.81 Annex C code generation."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_lookup(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for the decoder."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _scale_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# Encoder (baseline, 4:4:4 / grayscale, Annex K tables)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing (B.1.1.5)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # pad with 1-bits


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amp_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _encode_plane_blocks(
    plane: np.ndarray, q: np.ndarray
) -> tuple[np.ndarray, int, int]:
    h, w = plane.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    coefs = _dct2(blocks.astype(np.float64) - 128.0)
    quant = np.round(coefs / q).astype(np.int64)
    return quant.reshape(-1, 64)[:, ZIGZAG], bh, bw


def encode_jpeg(
    im: np.ndarray, quality: int = 90, restart_interval: int = 0
) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB -> baseline JFIF bytes.
    RGB encodes as YCbCr 4:4:4 (no subsampling: the synthetic-twin role
    favors fidelity over size). ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every that many MCUs — the resync shape
    real camera/scanner writers use, kept here so the decoder's restart
    path has a first-party test vector."""
    if im.dtype != np.uint8:
        raise ValueError("baseline JPEG is 8-bit; cast/scale first")
    gray = im.ndim == 2
    if not gray and (im.ndim != 3 or im.shape[2] != 3):
        raise ValueError("expected (H, W) or (H, W, 3)")
    h, w = im.shape[:2]
    ql = _scale_q(_Q_LUMA, quality)
    qc = _scale_q(_Q_CHROMA, quality)
    if gray:
        planes = [im.astype(np.float64)]
    else:
        r, g, b = (im[..., i].astype(np.float64) for i in range(3))
        yy = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [yy, cb, cr]
    qts = [ql] + ([] if gray else [qc, qc])
    zz = [
        _encode_plane_blocks(np.clip(p, 0, 255), q)[0]
        for p, q in zip(planes, qts)
    ]

    dc_tabs = [_huff_codes(*_DC_LUMA)] + (
        [] if gray else [_huff_codes(*_DC_CHROMA)] * 2
    )
    ac_tabs = [_huff_codes(*_AC_LUMA)] + (
        [] if gray else [_huff_codes(*_AC_CHROMA)] * 2
    )
    bw_ = _BitWriter()
    pred = [0] * len(planes)
    n_blocks = zz[0].shape[0]
    rst = 0
    for bi in range(n_blocks):  # 4:4:4 -> MCU = one block per component
        if restart_interval and bi and bi % restart_interval == 0:
            bw_.flush()  # byte-align (B.2.1.2)
            bw_.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            pred = [0] * len(planes)
        for ci in range(len(planes)):
            blk = zz[ci][bi]
            diff = int(blk[0]) - pred[ci]
            pred[ci] = int(blk[0])
            size = _category(diff)
            code, ln = dc_tabs[ci][size]
            bw_.put(code, ln)
            if size:
                bw_.put(_amp_bits(diff, size), size)
            run = 0
            for k in range(1, 64):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_tabs[ci][0xF0]  # ZRL
                    bw_.put(code, ln)
                    run -= 16
                size = _category(v)
                code, ln = ac_tabs[ci][(run << 4) | size]
                bw_.put(code, ln)
                bw_.put(_amp_bits(v, size), size)
                run = 0
            if run:
                code, ln = ac_tabs[ci][0x00]  # EOB
                bw_.put(code, ln)
    bw_.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(ql.reshape(64)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(
            0xFFDB, b"\x01" + bytes(qc.reshape(64)[ZIGZAG].astype(np.uint8))
        )
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += struct.pack("BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    out += seg(0xFFC0, sof)
    for cls, tid, spec in (
        (0, 0, _DC_LUMA),
        (1, 0, _AC_LUMA),
        (0, 1, _DC_CHROMA),
        (1, 1, _AC_CHROMA),
    )[: 2 if gray else 4]:
        out += seg(
            0xFFC4,
            bytes([(cls << 4) | tid]) + bytes(spec[0]) + bytes(spec[1]),
        )
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder (baseline sequential; sampling factors 1-2; restart markers)
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits < 25:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0xFF  # pad past EOI
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = (
                    self.data[self.pos + 1]
                    if self.pos + 1 < len(self.data)
                    else 0xD9
                )
                if nxt == 0x00:
                    self.pos += 2  # stuffed byte
                else:
                    # a real marker: stop feeding (caller handles RST/EOI)
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int | None:
        """Byte-align and consume an RST marker if next; returns its index
        (0-7) or None."""
        self.acc = 0
        self.nbits = 0
        p = self.pos
        while p + 1 < len(self.data) and self.data[p] == 0xFF:
            m = self.data[p + 1]
            if 0xD0 <= m <= 0xD7:
                self.pos = p + 2
                return m - 0xD0
            break
        return None


def _decode_huff(rd: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | rd.bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _parse_tables(data: bytes, state: dict) -> None:
    """Fold every DQT/DHT/DRI segment of a JPEG-bytes fragment into
    ``state`` — used for both in-stream segments and the TIFF JPEGTables
    tag (347), whose payload is an SOI..EOI stream of bare tables."""
    pos = 0
    n = len(data)
    while pos + 1 < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (ln,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0xF
                bpos += 1
                if pq:
                    vals = np.frombuffer(
                        body[bpos : bpos + 128], dtype=">u2"
                    ).astype(np.int64)
                    bpos += 128
                else:
                    vals = np.frombuffer(
                        body[bpos : bpos + 64], dtype=np.uint8
                    ).astype(np.int64)
                    bpos += 64
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = vals
                state["quant"][tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            bpos = 0
            while bpos < len(body):
                cls, tid = body[bpos] >> 4, body[bpos] & 0xF
                bits = list(body[bpos + 1 : bpos + 17])
                nvals = sum(bits)
                vals = list(body[bpos + 17 : bpos + 17 + nvals])
                state["huff"][(cls, tid)] = _huff_lookup(bits, vals)
                bpos += 17 + nvals
        elif marker == 0xDD:  # DRI
            state["dri"] = struct.unpack(">H", body[:2])[0]
        pos += ln


def decode_jpeg(data: bytes, tables: bytes | None = None) -> np.ndarray:
    """Baseline JFIF/JPEG bytes -> uint8 (H, W) or (H, W, 3) RGB.
    ``tables`` is an optional abbreviated table stream prepended to the
    decoder state (TIFF 6 TechNote 2 / tag 347 JPEGTables)."""
    state: dict = {"quant": {}, "huff": {}, "dri": 0}
    if tables:
        _parse_tables(tables, state)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    comps: list[dict] = []
    h = w = 0
    n = len(data)
    while pos + 1 < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + ln]
        if marker in (0xDB, 0xC4, 0xDD):
            _parse_tables(data[pos - 2 : pos + ln], state)
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(
                    f"{prec}-bit JPEG unsupported (baseline 8-bit only); "
                    "inject a page_reader for exotic streams"
                )
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "progressive/arithmetic/hierarchical JPEG unsupported "
                "(baseline sequential only); inject a page_reader"
            )
        elif marker == 0xDA:  # SOS: entropy-coded data follows
            ns = body[0]
            for si in range(ns):
                cid, tt = body[1 + 2 * si : 3 + 2 * si]
                for c in comps:
                    if c["id"] == cid:
                        c["dc"], c["ac"] = tt >> 4, tt & 0xF
            return _decode_scan(data, pos + ln, state, comps, h, w)
        pos += ln
    raise ValueError("JPEG stream has no SOS segment")


def _decode_scan(
    data: bytes, pos: int, state: dict, comps: list[dict], h: int, w: int
) -> np.ndarray:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        raise ValueError("JPEG sampling factors beyond 2 unsupported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 8, 8), dtype=np.float64)
    rd = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    dri = state["dri"]
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_i and mcu_i % dri == 0:
                if rd.align_to_marker() is None:
                    raise ValueError("missing JPEG restart marker")
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                dct = state["huff"].get((0, c["dc"]))
                act = state["huff"].get((1, c["ac"]))
                qt = state["quant"].get(c["tq"])
                if dct is None or act is None or qt is None:
                    raise ValueError("JPEG scan references missing tables")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int64)
                        size = _decode_huff(rd, dct)
                        diff = (
                            _extend(rd.bits(size), size) if size else 0
                        )
                        pred[c["id"]] += diff
                        blk[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(rd, act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            blk[k] = _extend(rd.bits(s), s)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        dq = np.zeros(64, dtype=np.int64)
                        dq[ZIGZAG] = blk
                        c["coef"][row * c["bw"] + col] = (
                            dq.reshape(8, 8) * qt
                        )
            mcu_i += 1
    planes = []
    for c in comps:
        pix = _idct2(c["coef"]) + 128.0
        bh, bw_ = c["bh"], c["bw"]
        plane = (
            pix.reshape(bh, bw_, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw_ * 8)
        )
        # upsample subsampled chroma to full MCU grid, then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(planes)}")
    yy, cb, cr = planes
    r = yy + 1.402 * (cr - 128.0)
    g = yy - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = yy + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )
