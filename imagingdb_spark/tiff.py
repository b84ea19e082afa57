"""Minimal pure-numpy TIFF reader/writer — makes the multi-page splitter
seam RUNNABLE without tifffile/cv2 (neither ships in this container).

The reference splits multi-page TIFF stacks into 2-D frames
(ometif_splitter.py:68-106, tif_id_splitter.py:111-175) via tifffile, with
payloads constrained to uint8/uint16 grayscale or RGB
(ometif_splitter.py:45-56, tif_id_splitter.py:55-58). That subset of the
public TIFF 6.0 spec (Adobe, 1992) is small: a 8-byte header (byte order +
magic 42 + first-IFD offset), a linked list of IFDs (one per page), and
per-page strip-organized uncompressed sample data. This module implements
exactly that:

- ``read_tiff_pages``: walks the IFD chain, handles both byte orders
  (II/MM), BitsPerSample 8/16, SamplesPerPixel 1/3, strip-based storage
  (any RowsPerStrip), Compression 1 (none), 5 (LZW, TIFF §13 variant:
  MSB-first variable-width codes with early change), 8/32946 (Deflate,
  stdlib zlib), 6/7 (JPEG — old-style via the JPEGInterchangeFormat
  full-stream tags, new-style per-strip streams with the shared
  JPEGTables tag; baseline 8-bit, decoded by the pure-numpy codec in
  imagingdb_spark/jpeg.py), and Predictor 2 (horizontal differencing,
  §14), and 32773 (PackBits RLE, §9) — the codecs real microscopy
  writers emit. Bilevel pages (BitsPerSample 1) decode natively too:
  uncompressed packed bits and the FULL CCITT fax family — Compression
  2 (byte-aligned MH), 3 (Group 3, both 1-D and 2-D per T4Options bit
  0), 4 (Group 4 / T.6 MMR) — via imagingdb_spark/ccitt.py, expanded
  to uint8 0/255 through PhotometricInterpretation. JPEG pages decode
  baseline, progressive, and 12-bit extended sequential (stored
  uint16). The remaining exotica (fax uncompressed-mode options,
  arithmetic/lossless JPEG) still raise with a clear message and the
  injectable page_reader seam covers them.
- ``write_tiff``: emits a valid multi-page TIFF (little-endian, one
  strip per page; compression="none"/"lzw"/"deflate") — used by tests
  and as the synthetic-data twin.
- ``png_page_reader``: the `split_tiff_pages` plug — TIFF bytes → list of
  PNG-encoded frame payloads, mirroring the reference's TIFF-in /
  PNG-frames-out pipeline (data_uploader FRAME_FILE_FORMAT '.png').

Executor contract: pure functions of bytes, no state — safe inside
mapInPandas batches.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# IFD tag ids (TIFF 6.0 §8; 347/513/514 from TIFF TechNote 2)
_WIDTH, _LENGTH, _BITS, _COMPRESSION = 256, 257, 258, 259
_PHOTOMETRIC, _DESCRIPTION, _STRIP_OFFSETS = 262, 270, 273
_SAMPLES, _ROWS_PER_STRIP, _STRIP_COUNTS = 277, 278, 279
_PREDICTOR = 317
_FILL_ORDER = 266
_JPEG_TABLES, _JPEG_IF, _JPEG_IF_LEN = 347, 513, 514

_COMP_NONE, _COMP_LZW, _COMP_DEFLATE, _COMP_DEFLATE_OLD = 1, 5, 8, 32946
_COMP_JPEG_OLD, _COMP_JPEG = 6, 7
_COMP_PACKBITS = 32773
_COMP_CCITT_RLE, _COMP_G3, _COMP_G4 = 2, 3, 4
_T4_OPTIONS, _T6_OPTIONS = 292, 293

# field type → (struct code, byte size); the subset real writers use
# (2 = ASCII, one byte per char incl. the NUL terminator; 7 = UNDEFINED
# raw bytes — the JPEGTables tag's type)
_TYPES = {1: ("B", 1), 2: ("B", 1), 3: ("H", 2), 4: ("I", 4), 7: ("B", 1)}




# ---------------------------------------------------------------------------
# TIFF LZW (spec §13) and Deflate strip codecs (VERDICT r3 item 8)
# ---------------------------------------------------------------------------
# TIFF's LZW flavor: MSB-first bitstream, 9→12-bit variable-width codes,
# ClearCode=256, EOI=257, table grows from 258, and the "early change"
# quirk — the code width bumps when the NEXT code to be assigned is
# 2^width - 1 (one entry earlier than plain LZW), on both sides.

_LZW_CLEAR, _LZW_EOI, _LZW_FIRST = 256, 257, 258
_LZW_MAX_TABLE = 4094  # encoder emits Clear before the 12-bit table fills


def _lzw_decode(data: bytes) -> bytes:
    out = bytearray()
    table: list[bytes] = []
    width = 9
    next_code = _LZW_FIRST

    def reset() -> None:
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        next_code = _LZW_FIRST

    reset()
    prev: bytes | None = None
    bitpos, nbits = 0, len(data) * 8
    while True:
        # the decoder's table lags the encoder's by ONE entry (it inserts
        # on the NEXT code), so it must widen one entry earlier than the
        # encoder's next_code == 2^width - 1 rule: width is the smallest
        # w with next_code + 1 < 2^w - 1
        while width < 12 and next_code >= (1 << width) - 2:
            width += 1
        if bitpos + width > nbits:
            break
        i = bitpos >> 3
        chunk = int.from_bytes(data[i : i + 4].ljust(4, b"\0"), "big")
        code = (chunk >> (32 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == _LZW_CLEAR:
            reset()
            prev = None
            continue
        if code == _LZW_EOI:
            break
        if prev is None:
            entry = table[code]
        else:
            if code < next_code:
                entry = table[code]
            elif code == next_code:  # the KwKwK case
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt LZW stream (code beyond table)")
            table.append(prev + entry[:1])
            next_code += 1  # width re-derived from next_code at loop top
        out += entry
        prev = entry
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    bits = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nacc
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            nacc -= 8
            bits.append((acc >> nacc) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    width = 9
    next_code = _LZW_FIRST
    emit(_LZW_CLEAR, width)
    w = b""
    for b in data:
        c = w + bytes([b])
        if c in table:
            w = c
            continue
        emit(table[w], width)
        table[c] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:  # early change
            width += 1
        if next_code >= _LZW_MAX_TABLE:
            emit(_LZW_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            width = 9
            next_code = _LZW_FIRST
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(_LZW_EOI, width)
    if nacc:
        bits.append((acc << (8 - nacc)) & 0xFF)
    return bytes(bits)


def _packbits_decode(data: bytes) -> bytes:
    """Apple PackBits RLE (TIFF 6.0 §9): n in 0..127 copies n+1 literal
    bytes; n in -127..-1 repeats the next byte 1-n times; -128 is a
    no-op."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:  # literal run of c+1
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:  # replicate next byte 257-c times
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # c == 128: no-op
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """PackBits encoder (runs never shorter than 3; literals batch up to
    128) — the synthetic twin for round-trip tests, one row at a time so
    runs never cross row boundaries (the spec's recommendation)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            out += bytes([257 - (j - i), data[i]])
            i = j
            continue
        # literal: until a >=3 run starts or 128 bytes
        k = i
        while k < n and k - i < 128:
            if k + 2 < n and data[k] == data[k + 1] == data[k + 2]:
                break
            k += 1
        out += bytes([k - i - 1]) + data[i:k]
        i = k
    return bytes(out)


def _decode_strips(strips: list[bytes], comp: int) -> bytes:
    if comp == _COMP_NONE:
        return b"".join(strips)
    if comp in (_COMP_DEFLATE, _COMP_DEFLATE_OLD):
        return b"".join(zlib.decompress(s) for s in strips)
    if comp == _COMP_LZW:
        return b"".join(_lzw_decode(s) for s in strips)
    if comp == _COMP_PACKBITS:
        return b"".join(_packbits_decode(s) for s in strips)
    raise ValueError(
        f"unsupported TIFF compression {comp} (built-in: none/LZW/Deflate/"
        "PackBits/baseline-JPEG/CCITT fax); inject a page_reader backed "
        "by tifffile for the remaining exotica"
    )


def _decode_jpeg_page(
    buf: bytes,
    tags: dict[int, list[int]],
    comp: int,
    w: int,
    h: int,
    samples: int,
    bits: int,
) -> np.ndarray:
    """One JPEG-compressed TIFF page (Compression 6 old-style / 7
    new-style) → (H, W[, 3]) uint8 via the pure-numpy baseline decoder
    (imagingdb_spark/jpeg.py). Old-style pages need the
    JPEGInterchangeFormat (513/514) full-stream tags — the strip-soup
    variant of Compression 6 that TechNote 2 deprecated still raises;
    new-style strips are each a complete stream, with the optional
    JPEGTables tag (347) folded into every strip's decoder state."""
    from imagingdb_spark.jpeg import decode_jpeg

    if bits not in (8, 12):
        raise ValueError(
            "JPEG-in-TIFF supports 8-bit baseline/progressive and 12-bit "
            "extended sequential; inject a page_reader otherwise"
        )
    if comp == _COMP_JPEG_OLD:
        if _JPEG_IF not in tags:
            raise ValueError(
                "old-style JPEG (Compression 6) without "
                "JPEGInterchangeFormat is unsupported (TechNote 2 "
                "deprecated it); inject a page_reader"
            )
        off = tags[_JPEG_IF][0]
        ln = tags.get(_JPEG_IF_LEN, [len(buf) - off])[0]
        page = decode_jpeg(buf[off : off + ln])
    else:
        tables = bytes(tags[_JPEG_TABLES]) if _JPEG_TABLES in tags else None
        strips = [
            decode_jpeg(buf[o : o + c], tables=tables)
            for o, c in zip(tags[_STRIP_OFFSETS], tags[_STRIP_COUNTS])
        ]
        page = strips[0] if len(strips) == 1 else np.concatenate(strips, axis=0)
    page = page[:h, :w]
    got_samples = 1 if page.ndim == 2 else page.shape[2]
    if page.shape[0] != h or page.shape[1] != w or got_samples != samples:
        raise ValueError(
            f"JPEG page decoded to {page.shape}, IFD says "
            f"{h}x{w}x{samples}"
        )
    want = np.uint8 if bits == 8 else np.uint16
    if page.dtype != want:
        raise ValueError(
            f"JPEG page decoded {page.dtype}, IFD says {bits}-bit"
        )
    return page


_BITREV = np.packbits(
    np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1)[:, ::-1],
    axis=1,
).ravel()


def _reverse_bits(data: bytes) -> bytes:
    """Per-byte bit reversal (FillOrder 2 → the MSB-first order every
    decoder here expects)."""
    return _BITREV[np.frombuffer(data, dtype=np.uint8)].tobytes()


def _decode_fax_page(
    buf: bytes, tags: dict[int, list[int]], comp: int, w: int, h: int
) -> np.ndarray:
    """One bilevel fax page (Compression 2/3/4) → (H, W) uint8 0/255.

    Coding restarts at every strip boundary (TIFF 6.0 §10-11: strips are
    independently decodable). True-in-the-bitmap means black; Photometric
    0 (WhiteIsZero, the fax default) maps white→255/black→0, Photometric
    1 inverts. Compression 3 decodes both 1-D and 2-D T4Options rows;
    FillOrder 2 (LSB-first bytes — common precisely in scanner fax
    files) is bit-reversed before decode. Only the fax uncompressed-mode
    options raise — the injectable page_reader seam covers them.
    """
    from imagingdb_spark import ccitt

    g3_2d = comp == _COMP_G3 and bool(tags.get(_T4_OPTIONS, [0])[0] & 1)
    if comp == _COMP_G3 and tags.get(_T4_OPTIONS, [0])[0] & 2:
        raise ValueError(
            "Group 3 uncompressed mode (T4Options bit 1) is unsupported; "
            "inject a page_reader"
        )
    if comp == _COMP_G4 and tags.get(_T6_OPTIONS, [0])[0] & 2:
        raise ValueError(
            "T.6 uncompressed-mode option is unsupported; inject a "
            "page_reader"
        )
    rows_per = tags.get(_ROWS_PER_STRIP, [h])[0]
    reverse = tags.get(_FILL_ORDER, [1])[0] == 2
    parts = []
    offs, cnts = tags[_STRIP_OFFSETS], tags[_STRIP_COUNTS]
    for i, (o, c) in enumerate(zip(offs, cnts)):
        nrows = min(rows_per, h - i * rows_per)
        strip = buf[o : o + c]
        if reverse:  # FillOrder 2: bits packed LSB-first within bytes
            strip = _reverse_bits(strip)
        if comp == _COMP_G4:
            parts.append(ccitt.decode_g4(strip, w, nrows))
        elif g3_2d:
            parts.append(ccitt.decode_g3_2d(strip, w, nrows))
        else:
            parts.append(
                ccitt.decode_g3_1d(
                    strip, w, nrows, byte_aligned=comp == _COMP_CCITT_RLE
                )
            )
    black = np.concatenate(parts, axis=0)
    photometric = tags.get(_PHOTOMETRIC, [0])[0]
    if photometric == 0:  # WhiteIsZero: white=255, black=0
        return np.where(black, 0, 255).astype(np.uint8)
    return np.where(black, 255, 0).astype(np.uint8)


def _unpack_bilevel(data: bytes, w: int, h: int, photometric: int) -> np.ndarray:
    """Uncompressed 1-bit page (rows padded to byte boundaries, MSB-first)
    → (H, W) uint8 0/255 through PhotometricInterpretation."""
    stride = (w + 7) // 8
    raw = np.frombuffer(data, dtype=np.uint8, count=h * stride)
    bits = np.unpackbits(raw.reshape(h, stride), axis=1)[:, :w]
    if photometric == 0:  # WhiteIsZero: sample 0 is white
        return np.where(bits == 0, 255, 0).astype(np.uint8)
    return np.where(bits == 0, 0, 255).astype(np.uint8)


def _read_entry(buf: bytes, pos: int, bo: str) -> tuple[int, list[int]]:
    """One 12-byte IFD entry → (tag, values)."""
    tag, ftype, count = struct.unpack(bo + "HHI", buf[pos : pos + 8])
    if ftype not in _TYPES:
        return tag, []  # rational/ascii tags (resolution, software): unused
    code, size = _TYPES[ftype]
    total = size * count
    if total <= 4:
        raw = buf[pos + 8 : pos + 8 + total]
    else:
        (off,) = struct.unpack(bo + "I", buf[pos + 8 : pos + 12])
        raw = buf[off : off + total]
    return tag, list(struct.unpack(f"{bo}{count}{code}", raw))


def read_tiff_pages(
    payload: bytes, max_pages: int | None = None
) -> list[np.ndarray]:
    """Multi-page TIFF bytes → one ndarray per page: (H, W) grayscale or
    (H, W, 3) RGB, dtype uint8/uint16 from BitsPerSample. ``max_pages``
    stops the IFD walk early — a crawl path wanting only the cover frame
    of a 500-page stack must not entropy-decode the other 499."""
    buf = bytes(payload)
    if buf[:4] == b"II*\x00":
        bo = "<"
    elif buf[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload (bad header)")
    (ifd_off,) = struct.unpack(bo + "I", buf[4:8])
    pages: list[np.ndarray] = []
    while ifd_off and (max_pages is None or len(pages) < max_pages):
        (n_entries,) = struct.unpack(bo + "H", buf[ifd_off : ifd_off + 2])
        tags: dict[int, list[int]] = {}
        for i in range(n_entries):
            tag, vals = _read_entry(buf, ifd_off + 2 + 12 * i, bo)
            tags[tag] = vals
        (ifd_off,) = struct.unpack(
            bo + "I",
            buf[ifd_off + 2 + 12 * n_entries : ifd_off + 6 + 12 * n_entries],
        )
        comp = tags.get(_COMPRESSION, [1])[0]
        pred = tags.get(_PREDICTOR, [1])[0]
        w, h = tags[_WIDTH][0], tags[_LENGTH][0]
        samples = tags.get(_SAMPLES, [1])[0]
        bits = tags.get(_BITS, [8])[0]
        if bits == 1 and samples == 1:
            # bilevel pages: fax-coded or packed-uncompressed, expanded to
            # uint8 0/255 (the reference's tifffile path does the same —
            # asarray() of a bilevel page yields a 2-D array)
            if comp in (_COMP_CCITT_RLE, _COMP_G3, _COMP_G4):
                pages.append(_decode_fax_page(buf, tags, comp, w, h))
                continue
            # packed-bit pages under the general strip codecs reuse the
            # same decoders as 8/16-bit pages (none/LZW/Deflate/PackBits)
            data = _decode_strips(
                [
                    buf[o : o + c]
                    for o, c in zip(tags[_STRIP_OFFSETS], tags[_STRIP_COUNTS])
                ],
                comp,
            )
            if tags.get(_FILL_ORDER, [1])[0] == 2:
                data = _reverse_bits(data)
            pages.append(
                _unpack_bilevel(
                    data, w, h, tags.get(_PHOTOMETRIC, [0])[0]
                )
            )
            continue
        if comp in (_COMP_JPEG, _COMP_JPEG_OLD):
            # 12-bit extended-sequential pages are legal here (stored as
            # uint16); the general strip path below stays 8/16-bit
            pages.append(
                _decode_jpeg_page(buf, tags, comp, w, h, samples, bits)
            )
            continue
        if bits not in (8, 16) or samples not in (1, 3):
            raise ValueError(
                f"unsupported TIFF page ({bits}-bit, {samples} samples); the "
                "frame contract is 8/16-bit grayscale or RGB"
            )
        data = _decode_strips(
            [
                buf[o : o + c]
                for o, c in zip(tags[_STRIP_OFFSETS], tags[_STRIP_COUNTS])
            ],
            comp,
        )
        dtype = np.dtype(f"{bo}u{bits // 8}")
        arr = np.frombuffer(data, dtype=dtype, count=h * w * samples).reshape(
            (h, w) if samples == 1 else (h, w, samples)
        )
        if pred == 2:
            # horizontal differencing (§14): undo by cumulative sum along
            # the width axis in the sample dtype (modular wraparound)
            arr = np.cumsum(arr, axis=1, dtype=arr.dtype)
        elif pred != 1:
            raise ValueError(f"unsupported TIFF predictor {pred}")
        pages.append(arr.astype(np.uint16 if bits == 16 else np.uint8))
    return pages


def read_description(payload: bytes) -> str | None:
    """First page's ImageDescription tag (270) as text, or None — the
    driver-side global-metadata read the reference's tif_id splitter does
    (tif_id_splitter.py:111-126, `page.tags['ImageDescription']`)."""
    buf = bytes(payload)
    if buf[:4] == b"II*\x00":
        bo = "<"
    elif buf[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload (bad header)")
    (ifd_off,) = struct.unpack(bo + "I", buf[4:8])
    if not ifd_off:
        return None
    (n_entries,) = struct.unpack(bo + "H", buf[ifd_off : ifd_off + 2])
    for i in range(n_entries):
        tag, vals = _read_entry(buf, ifd_off + 2 + 12 * i, bo)
        if tag == _DESCRIPTION and vals:
            raw = bytes(vals)
            return raw.rstrip(b"\x00").decode("ascii", errors="replace")
    return None


def parse_ij_description(description: str | None) -> dict[str, int]:
    """ImageJ-style `key=value` lines → frame-grid counts, defaults 1 —
    `_get_params_from_str` (tif_id_splitter.py:63-90): `channels=`,
    `slices=`, `positions=`, and `frames=` meaning timepoints. The
    acquisition-order assumption (channels fastest, then slices,
    positions, frames; tif_id_splitter.py:100-103) matches
    split_tiff_pages' grid."""
    out = {
        "nbr_channels": 1,
        "nbr_timepoints": 1,
        "nbr_slices": 1,
        "nbr_positions": 1,
    }
    for line in (description or "").split("\n"):
        for key, field in (
            ("channels", "nbr_channels"),
            ("frames", "nbr_timepoints"),
            ("slices", "nbr_slices"),
            ("positions", "nbr_positions"),
        ):
            if line.startswith(key + "="):
                out[field] = int(line.split("=")[1])
    return out


_WRITE_COMP = {
    "none": _COMP_NONE,
    "lzw": _COMP_LZW,
    "deflate": _COMP_DEFLATE,
    "jpeg": _COMP_JPEG,  # new-style: each strip a complete baseline stream
    "jpeg12": _COMP_JPEG,  # 12-bit extended sequential, BitsPerSample 12
    "packbits": _COMP_PACKBITS,
    # bilevel fax codecs: pages must be 2-D bool or uint8 {0,255};
    # written with PhotometricInterpretation 0 (WhiteIsZero, fax default)
    "ccitt_rle": _COMP_CCITT_RLE,
    "ccitt_g3": _COMP_G3,
    "ccitt_g3_2d": _COMP_G3,  # T.4 2-D rows; T4Options bit 0 set
    "ccitt_g4": _COMP_G4,
}
_FAX_COMPS = (_COMP_CCITT_RLE, _COMP_G3, _COMP_G4)


def _encode_fax_page(im: np.ndarray, comp_tag: int, g3_2d: bool) -> bytes:
    """Bilevel page → fax strip. Input is bool (True=black under
    WhiteIsZero) or uint8 where 255=white, 0=black."""
    from imagingdb_spark import ccitt

    if im.ndim != 2:
        raise TypeError("fax compression is single-sample 2-D only")
    if im.dtype == bool:
        black = im
    else:
        vals = np.unique(im)
        if not np.isin(vals, (0, 255)).all():
            raise TypeError(
                "fax pages must be bool or uint8 with values {0, 255}"
            )
        black = im == 0
    if comp_tag == _COMP_G4:
        return ccitt.encode_g4(black)
    if g3_2d:
        return ccitt.encode_g3_2d(black)
    return ccitt.encode_g3_1d(
        black, byte_aligned=comp_tag == _COMP_CCITT_RLE
    )


def write_tiff(
    pages: list[np.ndarray],
    description: str | None = None,
    compression: str = "none",
) -> bytes:
    """Multi-page little-endian TIFF from uint8/uint16 grayscale/RGB
    arrays — one strip per page, IFDs chained in order;
    compression="none"/"lzw"/"deflate". `description` lands in page 0's
    ImageDescription tag (the ImageJ grid-metadata convention the tif_id
    splitter reads)."""
    if compression not in _WRITE_COMP:
        raise ValueError(f"compression must be one of {sorted(_WRITE_COMP)}")
    comp_tag = _WRITE_COMP[compression]
    bo = "<"
    out = bytearray(b"II*\x00\x00\x00\x00\x00")

    def _entry(tag: int, ftype: int, values: list[int]) -> bytes:
        code, size = _TYPES[ftype]
        packed = struct.pack(f"{bo}{len(values)}{code}", *values)
        if len(packed) <= 4:
            return struct.pack(bo + "HHI", tag, ftype, len(values)) + packed.ljust(
                4, b"\x00"
            )
        off = len(out)
        out.extend(packed)
        return struct.pack(bo + "HHII", tag, ftype, len(values), off)

    prev_link = 4  # header slot pointing at the first IFD
    for page_idx, im in enumerate(pages):
        im = np.asarray(im)
        if comp_tag in _FAX_COMPS:
            if im.dtype != bool and im.dtype != np.uint8:
                raise TypeError(
                    f"fax pages are bool/uint8 only, got {im.dtype}"
                )
        elif im.dtype not in (np.uint8, np.uint16):
            raise TypeError(f"TIFF frames are uint8/uint16 only, got {im.dtype}")
        if im.ndim == 2:
            samples = 1
        elif im.ndim == 3 and im.shape[2] == 3:
            samples = 3
        else:
            raise TypeError(f"expected (H,W) or (H,W,3) page, got {im.shape}")
        h, w = im.shape[0], im.shape[1]
        bits = im.dtype.itemsize * 8
        if comp_tag in _FAX_COMPS:
            bits = 1
            strip = _encode_fax_page(im, comp_tag, compression == "ccitt_g3_2d")
        elif comp_tag == _COMP_JPEG and compression == "jpeg12":
            from imagingdb_spark.jpeg import encode_jpeg_12bit

            bits = 12
            strip = encode_jpeg_12bit(im, quality=95)
        elif comp_tag == _COMP_JPEG:
            if bits != 8:
                raise TypeError(
                    "compression='jpeg' is 8-bit; use 'jpeg12' for uint16"
                )
            from imagingdb_spark.jpeg import encode_jpeg

            strip = encode_jpeg(im, quality=95)
        else:
            strip = im.astype(f"{bo}u{bits // 8}").tobytes()
            if comp_tag == _COMP_LZW:
                strip = _lzw_encode(strip)
            elif comp_tag == _COMP_DEFLATE:
                strip = zlib.compress(strip)
            elif comp_tag == _COMP_PACKBITS:
                # encode PER ROW so runs never cross row boundaries
                row_bytes = w * samples * (bits // 8)
                strip = b"".join(
                    _packbits_encode(strip[r : r + row_bytes])
                    for r in range(0, len(strip), row_bytes)
                )
        strip_off = len(out)
        out.extend(strip)
        entries = [
            _entry(_WIDTH, 4, [w]),
            _entry(_LENGTH, 4, [h]),
            _entry(_BITS, 3, [bits] * samples),
            _entry(_COMPRESSION, 3, [comp_tag]),
            # JPEG RGB strips carry YCbCr inside the JFIF stream (PM 6);
            # fax pages are WhiteIsZero (PM 0, the CCITT default)
            _entry(
                _PHOTOMETRIC,
                3,
                [
                    (6 if comp_tag == _COMP_JPEG else 2)
                    if samples == 3
                    else (0 if comp_tag in _FAX_COMPS else 1)
                ],
            ),
            _entry(_STRIP_OFFSETS, 4, [strip_off]),
            _entry(_SAMPLES, 3, [samples]),
            _entry(_ROWS_PER_STRIP, 4, [h]),
            _entry(_STRIP_COUNTS, 4, [len(strip)]),
        ]
        if comp_tag == _COMP_G3:
            # bit 0: 2-D coding; never fill bits / uncompressed mode
            entries.append(
                _entry(
                    _T4_OPTIONS, 4, [1 if compression == "ccitt_g3_2d" else 0]
                )
            )
        elif comp_tag == _COMP_G4:
            entries.append(_entry(_T6_OPTIONS, 4, [0]))
        if page_idx == 0 and description is not None:
            entries.append(
                _entry(
                    _DESCRIPTION, 2, list(description.encode("ascii") + b"\x00")
                )
            )
        ifd_off = len(out)
        struct.pack_into(bo + "I", out, prev_link, ifd_off)
        out.extend(struct.pack(bo + "H", len(entries)))
        for e in sorted(entries, key=lambda b: struct.unpack(bo + "H", b[:2])[0]):
            out.extend(e)
        prev_link = len(out)
        out.extend(b"\x00\x00\x00\x00")  # next-IFD link (patched or final)
    return bytes(out)


def png_page_reader(payload: bytes) -> list[bytes]:
    """`split_tiff_pages` plug: TIFF stack → PNG payload per frame — the
    reference's TIFF-in / PNG-frames-out upload shape (data_uploader.py
    FRAME_FILE_FORMAT + file_splitter.py:82-93)."""
    from imagingdb_spark import png

    return [png.encode_png(p) for p in read_tiff_pages(payload)]
