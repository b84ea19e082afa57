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
    plane: np.ndarray, q: np.ndarray, center: float = 128.0
) -> tuple[np.ndarray, int, int]:
    h, w = plane.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    coefs = _dct2(blocks.astype(np.float64) - center)
    quant = np.round(coefs / q).astype(np.int64)
    return quant.reshape(-1, 64)[:, ZIGZAG], bh, bw


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _ycbcr_planes(im: np.ndarray, mid: float) -> list[np.ndarray]:
    """[Y] or [Y, Cb, Cr] float planes at the given chroma midpoint —
    the one RGB→YCbCr conversion all three encoders share."""
    if im.ndim == 2:
        return [im.astype(np.float64)]
    r, g, b = (im[..., i].astype(np.float64) for i in range(3))
    return [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + mid,
        0.5 * r - 0.418688 * g - 0.081312 * b + mid,
    ]


def _seq_block_events(zz: list[np.ndarray], restart_interval: int) -> list:
    """Sequential interleaved entropy events over 4:4:4 zigzag blocks:
    ("dc", ci, size) / ("ac", ci, sym) / ("b", value, nbits) / ("rst",)
    — the single DC-diff + AC run-length loop shared by the 8-bit and
    12-bit encoders (the progressive twin has its own per-scan shape)."""
    ev: list = []
    ncomp = len(zz)
    pred = [0] * ncomp
    for bi in range(zz[0].shape[0]):
        if restart_interval and bi and bi % restart_interval == 0:
            ev.append(("rst",))
            pred = [0] * ncomp
        for ci in range(ncomp):
            blk = zz[ci][bi]
            diff = int(blk[0]) - pred[ci]
            pred[ci] = int(blk[0])
            size = _category(diff)
            ev.append(("dc", ci, size))
            if size:
                ev.append(("b", _amp_bits(diff, size), size))
            run = 0
            for k in range(1, 64):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ev.append(("ac", ci, 0xF0))
                    run -= 16
                size = _category(v)
                ev.append(("ac", ci, (run << 4) | size))
                ev.append(("b", _amp_bits(v, size), size))
                run = 0
            if run:
                ev.append(("ac", ci, 0x00))
    return ev


def _write_events(ev: list, dc_codes: list[dict], ac_codes: list[dict]) -> bytes:
    """Serialize an event stream against per-component code tables."""
    bw_ = _BitWriter()
    rst = 0
    for e in ev:
        if e[0] == "rst":
            bw_.flush()  # byte-align (B.2.1.2)
            bw_.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
        elif e[0] == "dc":
            code, ln = dc_codes[e[1]][e[2]]
            bw_.put(code, ln)
        elif e[0] == "ac":
            code, ln = ac_codes[e[1]][e[2]]
            bw_.put(code, ln)
        else:
            bw_.put(e[1], e[2])
    bw_.flush()
    return bytes(bw_.out)


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
    planes = _ycbcr_planes(im, 128.0)
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
    body = _write_events(
        _seq_block_events(zz, restart_interval), dc_tabs, ac_tabs
    )

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, b"\x00" + bytes(ql.reshape(64)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += _seg(
            0xFFDB, b"\x01" + bytes(qc.reshape(64)[ZIGZAG].astype(np.uint8))
        )
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += struct.pack("BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    out += _seg(0xFFC0, sof)
    for cls, tid, spec in (
        (0, 0, _DC_LUMA),
        (1, 0, _AC_LUMA),
        (0, 1, _DC_CHROMA),
        (1, 1, _AC_CHROMA),
    )[: 2 if gray else 4]:
        out += _seg(
            0xFFC4,
            bytes([(cls << 4) | tid]) + bytes(spec[0]) + bytes(spec[1]),
        )
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += _seg(0xFFDA, sos)
    out += body
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
        if marker == 0xFF:  # fill byte before a marker (B.1.1.2)
            pos -= 1
            continue
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
    progressive = False
    lossless = False
    n = len(data)
    while pos + 1 < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker == 0xFF:  # fill byte before a marker (B.1.1.2)
            pos -= 1
            continue
        if marker in (0x00, 0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + ln]
        if marker in (0xDB, 0xC4, 0xDD):
            _parse_tables(data[pos - 2 : pos + ln], state)
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive
            progressive = marker == 0xC2
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec not in (8, 12):
                raise ValueError(
                    f"{prec}-bit JPEG unsupported (8/12-bit DCT only); "
                    "inject a page_reader for exotic streams"
                )
            state["prec"] = prec
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker == 0xC3:  # lossless sequential (Annex H)
            lossless = True
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if not 2 <= prec <= 16:
                raise ValueError(f"bad lossless JPEG precision {prec}")
            state["prec"] = prec
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if hv != 0x11:
                    raise ValueError(
                        "subsampled lossless JPEG unsupported (Annex H "
                        "components are full-resolution here)"
                    )
                comps.append(
                    {"id": cid, "h": 1, "v": 1, "tq": tq}
                )
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "arithmetic/hierarchical JPEG unsupported; "
                "inject a page_reader for exotic streams"
            )
        elif marker == 0xDA:  # SOS: entropy-coded data follows
            ns = body[0]
            sel = []
            for si in range(ns):
                cid, tt = body[1 + 2 * si : 3 + 2 * si]
                for c in comps:
                    if c["id"] == cid:
                        c["dc"], c["ac"] = tt >> 4, tt & 0xF
                        sel.append(c)
            if lossless:
                if len(sel) != len(comps):
                    # a legal non-interleaved lossless stream (one scan
                    # per component) would otherwise decode to just the
                    # first component as a grayscale image — silent wrong
                    # pixels; raise like the restart-marker guard does
                    raise ValueError(
                        "multi-scan lossless JPEG unsupported; "
                        "inject a page_reader for exotic streams"
                    )
                ss = body[1 + 2 * ns]  # predictor selector (1-7)
                al = body[3 + 2 * ns] & 0xF  # point transform
                return _decode_lossless_scan(
                    data, pos + ln, state, sel, h, w, ss, al
                )
            if not progressive:
                return _decode_scan(data, pos + ln, state, comps, h, w)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            aa = body[3 + 2 * ns]
            if comps and "coefz" not in comps[0]:
                _init_progressive(comps, h, w)
            pos = _decode_prog_scan(
                data, pos + ln, state, sel, aa >> 4, aa & 0xF, ss, se
            )
            continue
        pos += ln
    if progressive and comps and "coefz" in comps[0]:
        return _finish_progressive(comps, state, h, w)
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
    return _assemble(comps, h, w, hmax, vmax, state.get("prec", 8))


def _assemble(
    comps: list[dict], h: int, w: int, hmax: int, vmax: int, prec: int = 8
) -> np.ndarray:
    """Dequantized coefficient blocks (c["coef"], float (N,8,8)) → pixel
    array: IDCT, chroma upsample, crop, YCbCr→RGB — shared by the
    sequential and progressive paths. ``prec`` sets the level shift and
    output dtype (8 → uint8, 12 → uint16 clipped to 4095)."""
    mid = float(1 << (prec - 1))
    top = float((1 << prec) - 1)
    dtype = np.uint8 if prec == 8 else np.uint16
    planes = []
    for c in comps:
        pix = _idct2(c["coef"]) + mid
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
        return np.clip(np.round(planes[0]), 0, top).astype(dtype)
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(planes)}")
    yy, cb, cr = planes
    r = yy + 1.402 * (cr - mid)
    g = yy - 0.344136 * (cb - mid) - 0.714136 * (cr - mid)
    b = yy + 1.772 * (cb - mid)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, top).astype(
        dtype
    )


# ---------------------------------------------------------------------------
# Progressive decoder (T.81 Annex G: spectral selection + successive
# approximation). Coefficients accumulate across scans in ZIGZAG order per
# component; reconstruction happens once, at EOI.
# ---------------------------------------------------------------------------


def _init_progressive(comps: list[dict], h: int, w: int) -> None:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        raise ValueError("JPEG sampling factors beyond 2 unsupported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        # padded MCU-grid dims (interleaved DC scans) and the tighter
        # per-component dims non-interleaved scans iterate (T.81 A.2.2)
        c["bw"], c["bh"] = mcux * c["h"], mcuy * c["v"]
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        c["nbw"], c["nbh"] = (cw + 7) // 8, (ch + 7) // 8
        c["coefz"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
    comps[0]["_grid"] = (hmax, vmax, mcux, mcuy)


def _finish_progressive(
    comps: list[dict], state: dict, h: int, w: int
) -> np.ndarray:
    hmax, vmax, _, _ = comps[0]["_grid"]
    for c in comps:
        qt = state["quant"].get(c["tq"])
        if qt is None:
            raise ValueError("JPEG scan references missing tables")
        nat = np.zeros_like(c["coefz"], dtype=np.float64)
        nat[:, ZIGZAG] = c["coefz"]
        c["coef"] = nat.reshape(-1, 8, 8) * qt
    return _assemble(comps, h, w, hmax, vmax, state.get("prec", 8))


def _refine_nonzero(rd: "_BitReader", coef, k: int, p1: int) -> None:
    """One correction bit for an already-nonzero coefficient (G.1.2.3):
    appends the bit at position Al when the approximation lacks it."""
    if rd.bit() and (coef[k] & p1) == 0:
        coef[k] += p1 if coef[k] > 0 else -p1


def _ac_first_block(rd, act, coef, ss, se, al, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(rd, act)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += rd.bits(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG AC run overflow")
        coef[k] = _extend(rd.bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(rd, act, coef, ss, se, al, eobrun) -> int:
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(rd, act)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rd.bits(r)
                    break
                newval = 0  # ZRL: 16 zero-history positions
            elif s == 1:
                newval = p1 if rd.bit() else -p1
            else:
                raise ValueError("invalid AC refinement magnitude")
            # advance past r zero-history positions, emitting correction
            # bits for every nonzero-history coefficient passed over
            while k <= se:
                if coef[k]:
                    _refine_nonzero(rd, coef, k, p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                coef[k] = newval
            k += 1
    if eobrun > 0:
        # EOB region: only correction bits for remaining nonzeros
        while k <= se:
            if coef[k]:
                _refine_nonzero(rd, coef, k, p1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(
    data: bytes,
    pos: int,
    state: dict,
    sel: list[dict],
    ah: int,
    al: int,
    ss: int,
    se: int,
) -> int:
    """One progressive scan (DC or AC, first or refinement pass) into the
    selected components' zigzag coefficient arrays; returns the byte
    position where the entropy-coded data ends."""
    rd = _BitReader(data, pos)
    dri = state["dri"]

    def _restart(unit_i: int) -> bool:
        return bool(dri) and unit_i and unit_i % dri == 0

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("DC progressive scan must have Se=0")
        pred = {c["id"]: 0 for c in sel}
        dcts = {}
        if ah == 0:
            for c in sel:
                dcts[c["id"]] = state["huff"].get((0, c["dc"]))
                if dcts[c["id"]] is None:
                    raise ValueError("JPEG scan references missing tables")

        def _dc_one(c, bi):
            coef = c["coefz"][bi]
            if ah == 0:
                size = _decode_huff(rd, dcts[c["id"]])
                diff = _extend(rd.bits(size), size) if size else 0
                pred[c["id"]] += diff
                coef[0] = pred[c["id"]] << al
            else:
                coef[0] |= rd.bit() << al

        if len(sel) > 1:  # interleaved, MCU order over the frame grid
            mcux = sel[0]["bw"] // sel[0]["h"]
            mcuy = sel[0]["bh"] // sel[0]["v"]
            unit = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if _restart(unit):
                        if rd.align_to_marker() is None:
                            raise ValueError("missing JPEG restart marker")
                        pred = {c["id"]: 0 for c in sel}
                    for c in sel:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                bi = (my * c["v"] + by) * c["bw"] + (
                                    mx * c["h"] + bx
                                )
                                _dc_one(c, bi)
                    unit += 1
        else:  # non-interleaved: the component's own block raster
            c = sel[0]
            unit = 0
            for row in range(c["nbh"]):
                for col in range(c["nbw"]):
                    if _restart(unit):
                        if rd.align_to_marker() is None:
                            raise ValueError("missing JPEG restart marker")
                        pred = {c["id"]: 0 for c in sel}
                    _dc_one(c, row * c["bw"] + col)
                    unit += 1
        return rd.pos

    # AC scan: exactly one component, its own block raster (T.81 G.1.1)
    if len(sel) != 1:
        raise ValueError("progressive AC scan must have one component")
    c = sel[0]
    act = state["huff"].get((1, c["ac"]))
    if act is None:
        raise ValueError("JPEG scan references missing tables")
    coefz = c["coefz"]
    block_fn = _ac_first_block if ah == 0 else _ac_refine_block
    eobrun = 0
    unit = 0
    for row in range(c["nbh"]):
        for col in range(c["nbw"]):
            if _restart(unit):
                if rd.align_to_marker() is None:
                    raise ValueError("missing JPEG restart marker")
                eobrun = 0
            eobrun = block_fn(
                rd, act, coefz[row * c["bw"] + col], ss, se, al, eobrun
            )
            unit += 1
    return rd.pos


# ---------------------------------------------------------------------------
# Progressive encoder twin (T.81 Annex G, Huffman): a libjpeg-style scan
# script — DC first+refine, spectrally-split AC first passes, AC refine —
# so every decoder path (EOBRUN, ZRL-in-refine, correction bits, restart
# resets) has a first-party vector. Tables are built per stream as flat
# fixed-length canonical codes over the symbols actually emitted (the
# Annex K AC tables lack the EOBn symbols progressive needs).
# ---------------------------------------------------------------------------


def _pt(v: int, al: int) -> int:
    """AC point transform: magnitude shift toward zero (G.1.2.1)."""
    return v >> al if v >= 0 else -((-v) >> al)


def _flat_table(symbols) -> tuple[list[int], list[int]]:
    """All-one-length canonical table over the used symbols (≤ 2^L - 1 of
    length L keeps the all-ones prefix reserved, F.1.4.4.1)."""
    syms = sorted(set(symbols))
    L = 2
    while len(syms) > (1 << L) - 1:
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(syms)
    return bits, syms


def _enc_ac_first(tv: np.ndarray, ss: int, se: int, state: dict) -> list:
    """One block's AC-first events; EOB runs batch across blocks via
    state['eob'] (flushed by _flush_eob)."""
    ev: list = []
    nz = [k for k in range(ss, se + 1) if tv[k]]
    if not nz:
        state["eob"] += 1
        if state["eob"] == 32767:
            ev += _flush_eob(state)
        return ev
    ev += _flush_eob(state)
    run = 0
    for k in range(ss, se + 1):
        v = int(tv[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ev.append(("ac", 0xF0))
            run -= 16
        size = _category(v)
        ev.append(("ac", (run << 4) | size))
        ev.append(("b", _amp_bits(v, size), size))
        run = 0
    if nz[-1] < se:
        state["eob"] += 1  # band ends in zeros: EOB covers this block
    return ev


def _flush_eob(state: dict) -> list:
    n = state["eob"]
    if not n:
        return []
    state["eob"] = 0
    r = n.bit_length() - 1
    ev = [("ac", r << 4)]
    if r:
        ev.append(("b", n - (1 << r), r))
    ev += [("b", b, 1) for b in state.pop("eob_bits", [])]
    state["eob_bits"] = []
    return ev


def _enc_ac_refine(tv: np.ndarray, ss: int, se: int, state: dict) -> list:
    """One block's AC-refinement events (G.1.2.3 encoder side): newly
    significant coefficients as (run,1) codes over ZERO-HISTORY runs,
    correction bits for already-nonzero coefficients interleaved in
    positional order, tails joining the batched EOB run."""
    ev: list = []
    # classify: None = zero-history zero, 'N' = newly significant,
    # int bit = correction bit for a nonzero-history coefficient
    kinds: list = []
    for k in range(ss, se + 1):
        t = int(tv[k])
        if t == 0:
            kinds.append(None)
        elif abs(t) == 1:
            kinds.append(("N", 1 if t > 0 else 0))
        else:
            kinds.append(abs(t) & 1)
    if not any(isinstance(x, tuple) for x in kinds):
        # no newly-significant coefficient: whole band joins the EOB run
        state["eob"] += 1
        state.setdefault("eob_bits", []).extend(
            x for x in kinds if isinstance(x, int)
        )
        if state["eob"] == 32767:
            ev += _flush_eob(state)
        return ev
    ev += _flush_eob(state)
    i = 0
    while i < len(kinds):
        # find next newly-significant position
        j = i
        while j < len(kinds) and not isinstance(kinds[j], tuple):
            j += 1
        if j == len(kinds):
            # tail after the last new coefficient → EOB region
            tail_bits = [x for x in kinds[i:] if isinstance(x, int)]
            state["eob"] += 1
            state.setdefault("eob_bits", []).extend(tail_bits)
            return ev
        seg = kinds[i:j]
        zrun = sum(1 for x in seg if x is None)
        # split off ZRLs of exactly 16 zero-history positions each,
        # carrying the correction bits interleaved within each span
        p = 0
        while zrun > 15:
            ev.append(("ac", 0xF0))
            seen = 0
            while seen < 16:
                if seg[p] is None:
                    seen += 1
                else:
                    ev.append(("b", seg[p], 1))
                p += 1
            zrun -= 16
        sign = kinds[j][1]
        ev.append(("ac", (zrun << 4) | 1))
        ev.append(("b", sign, 1))
        ev += [("b", x, 1) for x in seg[p:] if isinstance(x, int)]
        i = j + 1
    return ev  # last new coefficient sat exactly at se: no EOB needed


def encode_jpeg_progressive(
    im: np.ndarray, quality: int = 90, restart_interval: int = 0
) -> bytes:
    """uint8 (H, W) or (H, W, 3) → progressive JFIF bytes (4:4:4). Scan
    script: interleaved DC first (Al=1) + DC refine, per-component AC
    spectral halves (1-5, 6-63) at Al=1, then AC full-band refinement to
    Al=0 — the shape libjpeg's default progression uses, covering every
    Annex G decoder path."""
    if im.dtype != np.uint8:
        raise ValueError("progressive twin is 8-bit only")
    gray = im.ndim == 2
    if not gray and (im.ndim != 3 or im.shape[2] != 3):
        raise ValueError("expected (H, W) or (H, W, 3)")
    h, w = im.shape[:2]
    ql = _scale_q(_Q_LUMA, quality)
    qc = _scale_q(_Q_CHROMA, quality)
    planes = _ycbcr_planes(im, 128.0)
    qts = [ql] + ([] if gray else [qc, qc])
    zz = [
        _encode_plane_blocks(np.clip(p, 0, 255), q)[0]
        for p, q in zip(planes, qts)
    ]
    n_blocks = zz[0].shape[0]
    ncomp = len(planes)

    # ---- scan script ----
    scans = [("dc_first", list(range(ncomp)), 0, 0, 0, 1),
             ("dc_refine", list(range(ncomp)), 0, 0, 1, 0)]
    for ci in range(ncomp):
        scans += [
            ("ac_first", [ci], 1, 5, 0, 1),
            ("ac_first", [ci], 6, 63, 0, 1),
            ("ac_refine", [ci], 1, 63, 1, 0),
        ]

    # ---- pass 1: event streams ----
    all_events: list[list] = []
    for kind, cis, ss, se, ah, al in scans:
        ev: list = []
        if kind == "dc_first":
            pred = {ci: 0 for ci in cis}
            for bi in range(n_blocks):
                if restart_interval and bi and bi % restart_interval == 0:
                    ev.append(("rst",))
                    pred = {ci: 0 for ci in cis}
                for ci in cis:
                    val = int(zz[ci][bi][0]) >> al
                    diff = val - pred[ci]
                    pred[ci] = val
                    size = _category(diff)
                    ev.append(("dc", size))
                    if size:
                        ev.append(("b", _amp_bits(diff, size), size))
        elif kind == "dc_refine":
            for bi in range(n_blocks):
                if restart_interval and bi and bi % restart_interval == 0:
                    ev.append(("rst",))
                for ci in cis:
                    ev.append(("b", (int(zz[ci][bi][0]) >> al) & 1, 1))
        else:
            ci = cis[0]
            state: dict = {"eob": 0, "eob_bits": []}
            fn = _enc_ac_first if kind == "ac_first" else _enc_ac_refine
            for bi in range(n_blocks):
                if restart_interval and bi and bi % restart_interval == 0:
                    ev += _flush_eob(state)
                    ev.append(("rst",))
                tv = np.array(
                    [_pt(int(v), al) for v in zz[ci][bi]], dtype=np.int64
                )
                ev += fn(tv, ss, se, state)
            ev += _flush_eob(state)
        all_events.append(ev)

    # ---- tables from the union of emitted symbols ----
    dc_syms = [e[1] for ev in all_events for e in ev if e[0] == "dc"]
    ac_syms = [e[1] for ev in all_events for e in ev if e[0] == "ac"]
    dc_spec = _flat_table(dc_syms or [0])
    ac_spec = _flat_table(ac_syms or [0])
    dc_codes = _huff_codes(*dc_spec)
    ac_codes = _huff_codes(*ac_spec)

    # ---- pass 2: serialize ----
    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, b"\x00" + bytes(ql.reshape(64)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += _seg(
            0xFFDB, b"\x01" + bytes(qc.reshape(64)[ZIGZAG].astype(np.uint8))
        )
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += struct.pack("BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    out += _seg(0xFFC2, sof)  # SOF2: progressive DCT
    out += _seg(0xFFC4, b"\x00" + bytes(dc_spec[0]) + bytes(dc_spec[1]))
    out += _seg(0xFFC4, b"\x10" + bytes(ac_spec[0]) + bytes(ac_spec[1]))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    for (kind, cis, ss, se, ah, al), ev in zip(scans, all_events):
        sos = bytes([len(cis)])
        for ci in cis:
            sos += bytes([ci + 1, 0x00])  # dc table 0, ac table 0
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xFFDA, sos)
        bw_ = _BitWriter()
        rst = 0
        for e in ev:
            if e[0] == "rst":
                bw_.flush()
                bw_.out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
            elif e[0] == "dc":
                code, ln = dc_codes[e[1]]
                bw_.put(code, ln)
            elif e[0] == "ac":
                code, ln = ac_codes[e[1]]
                bw_.put(code, ln)
            else:
                bw_.put(e[1], e[2])
        bw_.flush()
        out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# 12-bit extended sequential encoder twin (SOF1, precision 12). Annex K
# Huffman tables stop at DC size 11 / AC size 10, so 12-bit streams build
# flat per-stream tables exactly like the progressive twin.
# ---------------------------------------------------------------------------


def encode_jpeg_12bit(im: np.ndarray, quality: int = 90) -> bytes:
    """uint16 (H, W) or (H, W, 3) with values < 4096 → 12-bit extended
    sequential JFIF bytes (4:4:4). The medical/microscopy JPEG flavor
    tifffile reads via its codec plugins; here it is the round-trip twin
    for the TIFF 12-bit JPEG path."""
    if im.dtype != np.uint16:
        raise ValueError("12-bit JPEG twin takes uint16 (values < 4096)")
    if int(im.max(initial=0)) > 4095:
        raise ValueError("12-bit JPEG values must be < 4096")
    gray = im.ndim == 2
    if not gray and (im.ndim != 3 or im.shape[2] != 3):
        raise ValueError("expected (H, W) or (H, W, 3)")
    h, w = im.shape[:2]
    # scale the 8-bit Annex K tables into the 12-bit range so quality
    # keeps its usual meaning (quantizer steps grow 16x with the range)
    ql = _scale_q(_Q_LUMA, quality) * 16
    qc = _scale_q(_Q_CHROMA, quality) * 16
    planes = _ycbcr_planes(im, 2048.0)
    qts = [ql] + ([] if gray else [qc, qc])
    zz = [
        _encode_plane_blocks(np.clip(p, 0, 4095), q, center=2048.0)[0]
        for p, q in zip(planes, qts)
    ]
    ncomp = len(planes)

    # pass 1: the shared sequential event stream; pass 2 builds flat
    # tables over the symbols it used and serializes against them
    ev = _seq_block_events(zz, restart_interval=0)
    dc_spec = _flat_table([e[2] for e in ev if e[0] == "dc"] or [0])
    ac_spec = _flat_table([e[2] for e in ev if e[0] == "ac"] or [0])
    dc_codes = [_huff_codes(*dc_spec)] * ncomp
    ac_codes = [_huff_codes(*ac_spec)] * ncomp
    body = _write_events(ev, dc_codes, ac_codes)

    out = bytearray(b"\xff\xd8")
    # 16-bit DQT entries (Pq=1): 12-bit quantizers exceed one byte
    out += _seg(
        0xFFDB,
        b"\x10" + ql.reshape(64)[ZIGZAG].astype(">u2").tobytes(),
    )
    if not gray:
        out += _seg(
            0xFFDB,
            b"\x11" + qc.reshape(64)[ZIGZAG].astype(">u2").tobytes(),
        )
    sof = struct.pack(">BHHB", 12, h, w, ncomp)
    for ci in range(ncomp):
        sof += struct.pack("BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    out += _seg(0xFFC1, sof)  # SOF1: extended sequential
    out += _seg(0xFFC4, b"\x00" + bytes(dc_spec[0]) + bytes(dc_spec[1]))
    out += _seg(0xFFC4, b"\x10" + bytes(ac_spec[0]) + bytes(ac_spec[1]))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += _seg(0xFFDA, sos)
    out += body
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Lossless JPEG (T.81 Annex H, Huffman) — the old-DICOM / medical transfer
# syntax. Each sample is a Huffman-coded DIFFERENCE (DC-style category +
# amplitude bits, plus the SSSS=16 "32768" special) from one of the 7
# standard spatial predictors; arithmetic is modulo 2^16, reconstruction
# is bit-exact. Restart markers are not supported in the lossless path
# (the prediction-reset rules interact with row state; real medical
# streams rarely carry them) and raise clearly.
# ---------------------------------------------------------------------------


def _predict(ra: int, rb: int, rc: int, sel: int) -> int:
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    if sel == 7:
        return (ra + rb) >> 1
    raise ValueError(f"bad lossless predictor selector {sel}")


def _decode_lossless_scan(
    data: bytes,
    pos: int,
    state: dict,
    sel: list[dict],
    h: int,
    w: int,
    pred_sel: int,
    al: int,
) -> np.ndarray:
    prec = state["prec"]
    if state.get("dri"):
        raise ValueError(
            "restart markers in lossless JPEG are unsupported; inject a "
            "page_reader"
        )
    tables = []
    for c in sel:
        t = state["huff"].get((0, c["dc"]))
        if t is None:
            raise ValueError("JPEG scan references missing tables")
        tables.append(t)
    ncomp = len(sel)
    default = 1 << (prec - 1 - al)
    planes = np.zeros((ncomp, h, w), dtype=np.int32)
    rd = _BitReader(data, pos)
    for y in range(h):
        for x in range(w):
            for ci in range(ncomp):
                size = _decode_huff(rd, tables[ci])
                if size == 16:
                    diff = 32768
                elif size:
                    diff = _extend(rd.bits(size), size)
                else:
                    diff = 0
                if y == 0 and x == 0:
                    pred = default
                elif y == 0:
                    pred = int(planes[ci, 0, x - 1])
                elif x == 0:
                    pred = int(planes[ci, y - 1, 0])
                else:
                    pred = _predict(
                        int(planes[ci, y, x - 1]),
                        int(planes[ci, y - 1, x]),
                        int(planes[ci, y - 1, x - 1]),
                        pred_sel,
                    )
                planes[ci, y, x] = (pred + diff) & 0xFFFF
    out = (planes << al).astype(np.uint16 if prec > 8 else np.uint8)
    if ncomp == 1:
        return out[0]
    return np.moveaxis(out, 0, -1)


def encode_jpeg_lossless(
    im: np.ndarray, predictor: int = 4, point_transform: int = 0
) -> bytes:
    """uint8/uint16 (H, W[, 3]) → lossless JPEG (SOF3) — BIT-EXACT round
    trip through decode_jpeg (masked by ``point_transform`` low bits if
    nonzero). Components are kept full-resolution; samples are coded as
    modulo-2^16 prediction differences over flat per-stream tables."""
    im = np.asarray(im)
    if im.dtype == np.uint8:
        prec = 8
    elif im.dtype == np.uint16:
        prec = 16 if int(im.max(initial=0)) > 4095 else 12
    else:
        raise ValueError("lossless JPEG twin takes uint8/uint16")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1-7")
    gray = im.ndim == 2
    if not gray and (im.ndim != 3 or im.shape[2] != 3):
        raise ValueError("expected (H, W) or (H, W, 3)")
    h, w = im.shape[:2]
    ncomp = 1 if gray else 3
    planes = (
        im[None].astype(np.int32)
        if gray
        else np.moveaxis(im.astype(np.int32), -1, 0)
    )
    al = point_transform
    if al:
        planes = planes >> al
    default = 1 << (prec - 1 - al)
    ev: list = []
    for y in range(h):
        for x in range(w):
            for ci in range(ncomp):
                if y == 0 and x == 0:
                    pred = default
                elif y == 0:
                    pred = int(planes[ci, 0, x - 1])
                elif x == 0:
                    pred = int(planes[ci, y - 1, 0])
                else:
                    pred = _predict(
                        int(planes[ci, y, x - 1]),
                        int(planes[ci, y - 1, x]),
                        int(planes[ci, y - 1, x - 1]),
                        predictor,
                    )
                diff = (int(planes[ci, y, x]) - pred + 32768) & 0xFFFF
                diff -= 32768  # wrapped into [-32768, 32767]
                if diff == -32768:
                    ev.append(("dc", 16))  # the 32768 special: no bits
                    continue
                size = _category(diff)
                ev.append(("dc", size))
                if size:
                    ev.append(("b", _amp_bits(diff, size), size))
    spec = _flat_table([e[1] for e in ev if e[0] == "dc"] or [0])
    codes = _huff_codes(*spec)
    bw_ = _BitWriter()
    for e in ev:
        if e[0] == "dc":
            code, ln = codes[e[1]]
            bw_.put(code, ln)
        else:
            bw_.put(e[1], e[2])
    bw_.flush()

    out = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", prec, h, w, ncomp)
    for ci in range(ncomp):
        sof += struct.pack("BBB", ci + 1, 0x11, 0)
    out += _seg(0xFFC3, sof)  # SOF3: lossless sequential
    out += _seg(0xFFC4, b"\x00" + bytes(spec[0]) + bytes(spec[1]))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, al])
    out += _seg(0xFFDA, sos)
    out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)
