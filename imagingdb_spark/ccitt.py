"""CCITT Group 3 / Group 4 fax codecs for bilevel TIFF strips — closes the
last natively-undecodable compression family the reference can read via
tifffile (ometif_splitter.py:68-106 hands any tifffile-supported stack to
`page.asarray()`; scanned bilevel masks arrive as Compression 2/3/4).

Pure-Python/numpy implementations of the public ITU-T specs:

- **Modified Huffman (MH)** run-length code (ITU-T T.4 §2, tables 1-3):
  white/black terminating codes 0-63, makeup codes 64-1728, shared
  extended makeups 1792-2560 (chained for longer runs).
- **Group 3 one-dimensional** (TIFF Compression 3 with T4Options bit 0
  clear): each row is MH-coded, rows separated by EOL (eleven 0s + 1),
  fill bits tolerated (T4Options bit 2 / byte-aligned EOL).
- **Group 3 two-dimensional** (T4Options bit 0 set): EOL + tag bit per
  row selecting a 1-D MH row or a 2-D row coded against the previous
  row with the T.6 mode set (T.4 §2.2.4); the encoder emits the K-factor
  error-containment schedule, the decoder follows the tag bits.
- **TIFF Compression 2** ("CCITT RLE", TIFF 6.0 §10): MH rows with no
  EOLs, each row starting on a byte boundary.
- **Group 4 / MMR** (ITU-T T.6, TIFF Compression 4): 2-D coding against
  the previous row via pass / horizontal / vertical modes, imaginary
  all-white reference line above row 0, optional EOFB terminator.

Decoders return a boolean array with True = black; the TIFF layer maps it
through PhotometricInterpretation (0 = WhiteIsZero, the fax default).
Encoders exist as the synthetic round-trip twin (the repo's codec test
discipline: no fixture binaries, every byte reproducible) and to let
`write_tiff` emit fax pages. Only the uncompressed-mode extensions
(T.4 §A / T.6 §2.2.5) raise with a clear message — the injectable
page_reader seam still covers those.

Executor contract: pure functions of bytes, no module state mutation —
safe inside mapInPandas batches.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Modified Huffman code tables (ITU-T T.4, tables 1-3), as (run, bits, nbits)
# ---------------------------------------------------------------------------

_WHITE_CODES = [
    (0, 0b00110101, 8), (1, 0b000111, 6), (2, 0b0111, 4), (3, 0b1000, 4),
    (4, 0b1011, 4), (5, 0b1100, 4), (6, 0b1110, 4), (7, 0b1111, 4),
    (8, 0b10011, 5), (9, 0b10100, 5), (10, 0b00111, 5), (11, 0b01000, 5),
    (12, 0b001000, 6), (13, 0b000011, 6), (14, 0b110100, 6), (15, 0b110101, 6),
    (16, 0b101010, 6), (17, 0b101011, 6), (18, 0b0100111, 7),
    (19, 0b0001100, 7), (20, 0b0001000, 7), (21, 0b0010111, 7),
    (22, 0b0000011, 7), (23, 0b0000100, 7), (24, 0b0101000, 7),
    (25, 0b0101011, 7), (26, 0b0010011, 7), (27, 0b0100100, 7),
    (28, 0b0011000, 7), (29, 0b00000010, 8), (30, 0b00000011, 8),
    (31, 0b00011010, 8), (32, 0b00011011, 8), (33, 0b00010010, 8),
    (34, 0b00010011, 8), (35, 0b00010100, 8), (36, 0b00010101, 8),
    (37, 0b00010110, 8), (38, 0b00010111, 8), (39, 0b00101000, 8),
    (40, 0b00101001, 8), (41, 0b00101010, 8), (42, 0b00101011, 8),
    (43, 0b00101100, 8), (44, 0b00101101, 8), (45, 0b00000100, 8),
    (46, 0b00000101, 8), (47, 0b00001010, 8), (48, 0b00001011, 8),
    (49, 0b01010010, 8), (50, 0b01010011, 8), (51, 0b01010100, 8),
    (52, 0b01010101, 8), (53, 0b00100100, 8), (54, 0b00100101, 8),
    (55, 0b01011000, 8), (56, 0b01011001, 8), (57, 0b01011010, 8),
    (58, 0b01011011, 8), (59, 0b01001010, 8), (60, 0b01001011, 8),
    (61, 0b00110010, 8), (62, 0b00110011, 8), (63, 0b00110100, 8),
    # makeup codes (T.4 table 2)
    (64, 0b11011, 5), (128, 0b10010, 5), (192, 0b010111, 6),
    (256, 0b0110111, 7), (320, 0b00110110, 8), (384, 0b00110111, 8),
    (448, 0b01100100, 8), (512, 0b01100101, 8), (576, 0b01101000, 8),
    (640, 0b01100111, 8), (704, 0b011001100, 9), (768, 0b011001101, 9),
    (832, 0b011010010, 9), (896, 0b011010011, 9), (960, 0b011010100, 9),
    (1024, 0b011010101, 9), (1088, 0b011010110, 9), (1152, 0b011010111, 9),
    (1216, 0b011011000, 9), (1280, 0b011011001, 9), (1344, 0b011011010, 9),
    (1408, 0b011011011, 9), (1472, 0b010011000, 9), (1536, 0b010011001, 9),
    (1600, 0b010011010, 9), (1664, 0b011000, 6), (1728, 0b010011011, 9),
]

_BLACK_CODES = [
    (0, 0b0000110111, 10), (1, 0b010, 3), (2, 0b11, 2), (3, 0b10, 2),
    (4, 0b011, 3), (5, 0b0011, 4), (6, 0b0010, 4), (7, 0b00011, 5),
    (8, 0b000101, 6), (9, 0b000100, 6), (10, 0b0000100, 7),
    (11, 0b0000101, 7), (12, 0b0000111, 7), (13, 0b00000100, 8),
    (14, 0b00000111, 8), (15, 0b000011000, 9), (16, 0b0000010111, 10),
    (17, 0b0000011000, 10), (18, 0b0000001000, 10), (19, 0b00001100111, 11),
    (20, 0b00001101000, 11), (21, 0b00001101100, 11), (22, 0b00000110111, 11),
    (23, 0b00000101000, 11), (24, 0b00000010111, 11), (25, 0b00000011000, 11),
    (26, 0b000011001010, 12), (27, 0b000011001011, 12),
    (28, 0b000011001100, 12), (29, 0b000011001101, 12),
    (30, 0b000001101000, 12), (31, 0b000001101001, 12),
    (32, 0b000001101010, 12), (33, 0b000001101011, 12),
    (34, 0b000011010010, 12), (35, 0b000011010011, 12),
    (36, 0b000011010100, 12), (37, 0b000011010101, 12),
    (38, 0b000011010110, 12), (39, 0b000011010111, 12),
    (40, 0b000001101100, 12), (41, 0b000001101101, 12),
    (42, 0b000011011010, 12), (43, 0b000011011011, 12),
    (44, 0b000001010100, 12), (45, 0b000001010101, 12),
    (46, 0b000001010110, 12), (47, 0b000001010111, 12),
    (48, 0b000001100100, 12), (49, 0b000001100101, 12),
    (50, 0b000001010010, 12), (51, 0b000001010011, 12),
    (52, 0b000000100100, 12), (53, 0b000000110111, 12),
    (54, 0b000000111000, 12), (55, 0b000000100111, 12),
    (56, 0b000000101000, 12), (57, 0b000001011000, 12),
    (58, 0b000001011001, 12), (59, 0b000000101011, 12),
    (60, 0b000000101100, 12), (61, 0b000001011010, 12),
    (62, 0b000001100110, 12), (63, 0b000001100111, 12),
    # makeup codes (T.4 table 3)
    (64, 0b0000001111, 10), (128, 0b000011001000, 12),
    (192, 0b000011001001, 12), (256, 0b000001011011, 12),
    (320, 0b000000110011, 12), (384, 0b000000110100, 12),
    (448, 0b000000110101, 12), (512, 0b0000001101100, 13),
    (576, 0b0000001101101, 13), (640, 0b0000001001010, 13),
    (704, 0b0000001001011, 13), (768, 0b0000001001100, 13),
    (832, 0b0000001001101, 13), (896, 0b0000001110010, 13),
    (960, 0b0000001110011, 13), (1024, 0b0000001110100, 13),
    (1088, 0b0000001110101, 13), (1152, 0b0000001110110, 13),
    (1216, 0b0000001110111, 13), (1280, 0b0000001010010, 13),
    (1344, 0b0000001010011, 13), (1408, 0b0000001010100, 13),
    (1472, 0b0000001010101, 13), (1536, 0b0000001011010, 13),
    (1600, 0b0000001011011, 13), (1664, 0b0000001100100, 13),
    (1728, 0b0000001100101, 13),
]

# extended makeups 1792-2560 are colour-independent (T.4 table 3 note)
_EXT_CODES = [
    (1792, 0b00000001000, 11), (1856, 0b00000001100, 11),
    (1920, 0b00000001101, 11), (1984, 0b000000010010, 12),
    (2048, 0b000000010011, 12), (2112, 0b000000010100, 12),
    (2176, 0b000000010101, 12), (2240, 0b000000010110, 12),
    (2304, 0b000000010111, 12), (2368, 0b000000011100, 12),
    (2432, 0b000000011101, 12), (2496, 0b000000011110, 12),
    (2560, 0b000000011111, 12),
]

# decode: (nbits, bits) -> run, per colour (extended makeups merged in)
_DEC = (
    {(n, b): run for run, b, n in _WHITE_CODES + _EXT_CODES},
    {(n, b): run for run, b, n in _BLACK_CODES + _EXT_CODES},
)
# encode: run -> (bits, nbits), per colour, split terminating / makeup
_ENC_TERM = (
    {run: (b, n) for run, b, n in _WHITE_CODES if run < 64},
    {run: (b, n) for run, b, n in _BLACK_CODES if run < 64},
)
_ENC_MAKEUP = (
    {run: (b, n) for run, b, n in _WHITE_CODES + _EXT_CODES if run >= 64},
    {run: (b, n) for run, b, n in _BLACK_CODES + _EXT_CODES if run >= 64},
)
_MAX_CODE_LEN = 14  # longest MH code is 13 bits; one spare for safety


class _BitReader:
    """MSB-first bit cursor with O(1) peeking via int.from_bytes chunks."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise ValueError("CCITT stream truncated")
        i = self.pos >> 3
        chunk = int.from_bytes(self.data[i : i + 4].ljust(4, b"\0"), "big")
        val = (chunk >> (32 - (self.pos & 7) - n)) & ((1 << n) - 1)
        self.pos += n
        return val

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self, slack_bits: int = 8) -> bool:
        return self.pos + slack_bits > self.nbits


def _decode_run(br: _BitReader, colour: int) -> int:
    """One MH-coded run of `colour` (0 white / 1 black), chaining makeups
    until a terminating code (<64) closes the run."""
    table = _DEC[colour]
    total = 0
    while True:
        bits = 0
        for nbits in range(1, _MAX_CODE_LEN):
            bits = (bits << 1) | br.read(1)
            run = table.get((nbits, bits))
            if run is not None:
                break
        else:
            raise ValueError(
                f"invalid MH {'black' if colour else 'white'} code"
            )
        total += run
        if run < 64:
            return total


def _encode_run(out: "_BitWriter", run: int, colour: int) -> None:
    while run >= 64:
        makeup = min(2560, (run >> 6) << 6)
        b, n = _ENC_MAKEUP[colour][makeup]
        out.write(b, n)
        run -= makeup
    b, n = _ENC_TERM[colour][run]
    out.write(b, n)


class _BitWriter:
    __slots__ = ("buf", "acc", "nacc")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, bits: int, n: int) -> None:
        self.acc = (self.acc << n) | bits
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)

    def align(self) -> None:
        if self.nacc:
            self.buf.append((self.acc << (8 - self.nacc)) & 0xFF)
            self.acc = 0
            self.nacc = 0

    def bytes(self) -> bytes:
        self.align()
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# Group 3 one-dimensional (+ TIFF Compression 2 byte-aligned variant)
# ---------------------------------------------------------------------------

_EOL_ZEROS = 11


def _consume_eol(br: _BitReader) -> bool:
    """Consume fill bits + one EOL (>=11 zeros then a 1) if present at the
    cursor; rewind and return False otherwise."""
    save = br.pos
    zeros = 0
    while not br.exhausted(1):
        bit = br.read(1)
        if bit == 0:
            zeros += 1
            continue
        if zeros >= _EOL_ZEROS:
            return True
        break
    br.pos = save
    return False


def _decode_mh_row(br: _BitReader, width: int) -> np.ndarray:
    row = np.zeros(width, dtype=bool)
    pos, colour = 0, 0
    while pos < width:
        run = _decode_run(br, colour)
        if pos + run > width:
            raise ValueError("MH row overruns declared width")
        if colour:
            row[pos : pos + run] = True
        pos += run
        colour ^= 1
    return row


def decode_g3_1d(
    data: bytes, width: int, height: int, byte_aligned: bool = False
) -> np.ndarray:
    """MH-coded rows → (height, width) bool, True = black.

    byte_aligned=True is TIFF Compression 2 (no EOLs, every row starts on
    a byte boundary); False is Compression 3 with 1-D T4Options, where
    rows are delimited by EOL codes (leading EOL and fill bits tolerated,
    covering the byte-aligned-EOL option too).
    """
    br = _BitReader(data)
    rows = []
    for _ in range(height):
        if byte_aligned:
            br.align()
        else:
            while _consume_eol(br):
                pass
        rows.append(_decode_mh_row(br, width))
    return np.stack(rows)


def encode_g3_1d(
    black: np.ndarray, byte_aligned: bool = False
) -> bytes:
    """(H, W) bool/0-1 array → MH bitstream (the decode twin)."""
    black = np.asarray(black, dtype=bool)
    out = _BitWriter()
    for row in black:
        if byte_aligned:
            out.align()
        else:
            out.write(1, _EOL_ZEROS + 1)  # EOL before every line (T.4 §2.2)
        for run, colour in _runs(row):
            _encode_run(out, run, colour)
    return out.bytes()


def _runs(row: np.ndarray):
    """Alternating (run_length, colour) pairs, white first (possibly 0)."""
    changes = _transitions(row)
    pos, colour = 0, 0
    for t in changes:
        yield t - pos, colour
        pos, colour = t, colour ^ 1
    yield len(row) - pos, colour


def _transitions(row: np.ndarray) -> list[int]:
    """Changing-element positions: index i where row[i] != row[i-1]
    (row[-1] imagined white). Even indices are white→black."""
    prev = np.concatenate(([False], row[:-1]))
    return np.nonzero(row != prev)[0].tolist()


# ---------------------------------------------------------------------------
# Group 4 / MMR (ITU-T T.6; TIFF Compression 4)
# ---------------------------------------------------------------------------

# vertical/pass/horizontal mode codes (T.6 table 4)
_MODE_V0 = (0b1, 1)
_MODE_VR = ((0b011, 3), (0b000011, 6), (0b0000011, 7))
_MODE_VL = ((0b010, 3), (0b000010, 6), (0b0000010, 7))
_MODE_H = (0b001, 3)
_MODE_P = (0b0001, 4)


def _b1_b2(ref: list[int], a0: int, colour: int, width: int):
    """b1 = first changing element on the reference line right of a0 with
    colour opposite to the coding colour; b2 = the next one (T.6 §2.2.2).
    `ref` holds transition positions (even index = white→black) with no
    sentinels; positions ≥ width mean 'none'."""
    from bisect import bisect_right

    i = bisect_right(ref, a0)
    # a transition INTO the opposite colour has index parity == colour
    if i < len(ref) and (i & 1) != colour:
        i += 1
    b1 = ref[i] if i < len(ref) else width
    b2 = ref[i + 1] if i + 1 < len(ref) else width
    return b1, b2


def decode_g4(data: bytes, width: int, height: int) -> np.ndarray:
    """T.6 MMR stream → (height, width) bool, True = black. Every row is
    2-D-coded against the previous one (imaginary all-white line above
    row 0). EOFB (two EOLs) is accepted but not required; the
    uncompressed-mode extension raises."""
    br = _BitReader(data)
    ref: list[int] = []  # imaginary all-white line above row 0
    rows = []
    for _ in range(height):
        cur = _decode_2d_row(br, ref, width)
        rows.append(_expand_transitions(cur, width))
        # drop trailing transitions at exactly `width` — they carry no
        # pixels and would break the parity convention for the next row
        ref = [t for t in cur if t < width]
    return np.stack(rows)


def _decode_2d_row(
    br: _BitReader, ref: list[int], width: int
) -> list[int]:
    """One 2-D-coded row against ``ref`` (shared by T.6 and T.4 2-D):
    returns the row's transition list. Factored from decode_g4 so the
    Group 3 2-D path reuses the exact mode decoder."""
    cur: list[int] = []
    a0, colour = -1, 0
    while a0 < width:
        b1, b2 = _b1_b2(ref, a0, colour, width)
        if br.read(1):
            a1 = b1  # V0
            cur.append(a1)
            a0, colour = a1, colour ^ 1
            continue
        if br.read(1):  # 01x → VR1/VL1
            a1 = b1 + 1 if br.read(1) else b1 - 1
            cur.append(a1)
            a0, colour = a1, colour ^ 1
            continue
        if br.read(1):  # 001 → horizontal
            start = 0 if a0 < 0 else a0
            r1 = _decode_run(br, colour)
            r2 = _decode_run(br, colour ^ 1)
            cur.extend((start + r1, start + r1 + r2))
            a0 = start + r1 + r2
            continue
        if br.read(1):  # 0001 → pass
            a0 = b2
            continue
        if br.read(1):  # 00001x → VR2/VL2
            a1 = b1 + 2 if br.read(1) else b1 - 2
            cur.append(a1)
            a0, colour = a1, colour ^ 1
            continue
        if br.read(1):  # 000001x → VR3/VL3
            a1 = b1 + 3 if br.read(1) else b1 - 3
            cur.append(a1)
            a0, colour = a1, colour ^ 1
            continue
        if br.read(1):  # 0000001 → uncompressed-mode extension
            raise ValueError(
                "T.6 uncompressed-mode extension is unsupported "
                "(inject a page_reader)"
            )
        raise ValueError("unexpected EOL inside 2-D image data")
    if a0 != width or (cur and cur[-1] > width):
        raise ValueError("2-D row overruns declared width")
    return cur


def _expand_transitions(cur: list[int], width: int) -> np.ndarray:
    row = np.zeros(width, dtype=bool)
    pos, c = 0, False
    for t in cur:
        if t < pos:
            raise ValueError("transitions out of order (corrupt)")
        if c:
            row[pos:t] = True
        pos, c = t, not c
    if c:
        row[pos:] = True
    return row


def decode_g3_2d(data: bytes, width: int, height: int) -> np.ndarray:
    """Group 3 TWO-dimensional stream (TIFF Compression 3, T4Options bit
    0 set) → (height, width) bool. Every row is preceded by EOL + one tag
    bit — 1 selects a 1-D (MH) row, 0 a 2-D row coded against the
    previous row with the T.6 modes (T.4 §2.2.4); fill bits before each
    EOL are tolerated. The K factor is the ENCODER's error-containment
    choice; the decoder just follows the tag bits."""
    br = _BitReader(data)
    ref: list[int] = []
    rows = []
    for _ in range(height):
        if not _consume_eol(br):
            raise ValueError("G3 2-D row must be preceded by EOL")
        if br.read(1):  # tag: 1-D row
            row = _decode_mh_row(br, width)
            cur = _transitions(row)
        else:
            cur = _decode_2d_row(br, ref, width)
            row = _expand_transitions(cur, width)
        rows.append(row)
        ref = [t for t in cur if t < width]
    return np.stack(rows)


def encode_g3_2d(black: np.ndarray, k: int = 4) -> bytes:
    """T.4 2-D encoder twin: every K-th row 1-D (MH), the rest 2-D
    against the previous row — the fax error-containment schedule (K=2
    at standard / 4 at fine resolution; any K ≥ 1 decodes)."""
    black = np.asarray(black, dtype=bool)
    h, width = black.shape
    out = _BitWriter()
    ref: list[int] = []
    for r in range(h):
        out.write(1, _EOL_ZEROS + 1)  # EOL
        if r % max(1, k) == 0:
            out.write(1, 1)  # tag: 1-D
            for run, colour in _runs(black[r]):
                _encode_run(out, run, colour)
            ref = _transitions(black[r])
        else:
            out.write(0, 1)  # tag: 2-D
            ref = _encode_2d_row(out, black[r], ref, width)
    return out.bytes()


def _encode_2d_row(
    out: "_BitWriter", row: np.ndarray, ref: list[int], width: int
) -> list[int]:
    """Emit one 2-D-coded row against ``ref``; returns the row's
    transitions (the next row's reference). Factored from encode_g4."""
    cur = _transitions(row)
    a0, colour, i = -1, 0, 0
    while a0 < width:
        a1 = cur[i] if i < len(cur) else width
        b1, b2 = _b1_b2(ref, a0, colour, width)
        if b2 < a1:
            out.write(*_MODE_P)
            a0 = b2
        elif abs(a1 - b1) <= 3:
            d = a1 - b1
            if d == 0:
                out.write(*_MODE_V0)
            elif d > 0:
                out.write(*_MODE_VR[d - 1])
            else:
                out.write(*_MODE_VL[-d - 1])
            a0, colour, i = a1, colour ^ 1, i + 1
        else:
            a2 = cur[i + 1] if i + 1 < len(cur) else width
            start = 0 if a0 < 0 else a0
            out.write(*_MODE_H)
            _encode_run(out, a1 - start, colour)
            _encode_run(out, a2 - a1, colour ^ 1)
            a0, i = a2, i + 2
    return cur


def encode_g4(black: np.ndarray, eofb: bool = True) -> bytes:
    """(H, W) bool/0-1 array → T.6 MMR stream (the decode twin). Mode
    choice follows the spec's decision order: pass when b2 < a1, vertical
    when |a1-b1| ≤ 3, horizontal otherwise."""
    black = np.asarray(black, dtype=bool)
    h, width = black.shape
    out = _BitWriter()
    ref: list[int] = []
    for r in range(h):
        ref = _encode_2d_row(out, black[r], ref, width)
    if eofb:
        out.write(1, _EOL_ZEROS + 1)
        out.write(1, _EOL_ZEROS + 1)
    return out.bytes()
