"""Web raster formats for crawl ingest — BMP + GIF codecs, magic-byte
sniffing, and ONE `decode_image` entry point over every format the repo
decodes natively (PNG, JPEG, TIFF, BMP, GIF).

Why: the reference's storage layer is PNG-only by design (image_utils.py
serialize/deserialize), but the LLM-pipeline extension ingests CRAWLED
images through the streaming pHash gate (streaming/jobs.py) and the
frame/feature extractors (multimodal.py), and a web crawl's payload mix
is JPEG/PNG/GIF/BMP/TIFF. This module gives the gates a single decoder
whose dispatch is the payload's own magic bytes — never a filename
extension (crawl URLs lie).

Pure-numpy implementations of the public specs, same discipline as
png.py/jpeg.py/tiff.py (encoders exist as synthetic round-trip twins;
no fixture binaries):

- **BMP** (Windows BITMAPINFOHEADER, uncompressed): 8-bit paletted,
  24-bit BGR, 32-bit BGRA; bottom-up and top-down rows, 4-byte row
  padding. Gray palettes collapse to (H, W) grayscale.
- **GIF** (87a/89a): LZW with LSB-first variable-width codes (the
  OPPOSITE bit packing of TIFF §13 LZW — reimplemented, not shared),
  global/local palettes, interlace, first frame of an animation (the
  still-image semantics a dedup/feature pipeline wants; frame deltas
  are video territory — see x_scene_changes for that path). Gray
  palettes collapse to grayscale.

Formats beyond the native set (WebP/AVIF/HEIC — all require full VP8/AV1
entropy decoders) raise with a clear message; callers inject a decoder
there, same seam as tiff.py's page_reader.

Executor contract: pure functions of bytes — safe inside mapInPandas.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_format(payload: bytes) -> str | None:
    """Magic-byte format id: 'png' | 'jpeg' | 'tiff' | 'bmp' | 'gif' |
    'webp' | None (unrecognized). Dispatch on content, never extension."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    return None


def decode_image(payload: bytes) -> np.ndarray:
    """Any supported payload → (H, W) or (H, W, 3) uint8/uint16 ndarray.
    Multi-page TIFF yields its FIRST page without decoding the rest (the
    gate treats a stack's cover frame as the image); animated GIF its
    first frame. Malformed payloads of a recognized format always raise
    ValueError (never struct.error/IndexError) so callers can catch ONE
    exception class for per-row error isolation in crawl feeds."""
    payload = bytes(payload)
    fmt = sniff_format(payload)
    try:
        if fmt == "png":
            from imagingdb_spark import png

            return png.decode_png(payload)
        if fmt == "jpeg":
            from imagingdb_spark import jpeg

            return jpeg.decode_jpeg(payload)
        if fmt == "tiff":
            from imagingdb_spark import tiff

            return tiff.read_tiff_pages(payload, max_pages=1)[0]
        if fmt == "bmp":
            return decode_bmp(payload)
        if fmt == "gif":
            return decode_gif(payload)
    except ValueError:
        raise
    except Exception as e:  # truncated/corrupt: struct.error, index, ...
        raise ValueError(f"malformed {fmt} payload: {e}") from e
    raise ValueError(
        f"unsupported image payload ({fmt or 'unknown magic'}); native: "
        "png/jpeg/tiff/bmp/gif — inject a decoder for webp/avif/heic"
    )


# ---------------------------------------------------------------------------
# BMP (Windows DIB, BITMAPINFOHEADER, BI_RGB only)
# ---------------------------------------------------------------------------


def _pal_map(pal: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Palette-map index pixels; a fully-gray PALETTE collapses to
    (H, W). The gate is the palette, never the pixel content — a
    truecolor image that happens to be gray keeps its (H, W, 3) shape,
    so a source's decoded ndim is stable across frames."""
    if (pal[:, 0] == pal[:, 1]).all() and (pal[:, 1] == pal[:, 2]).all():
        return np.ascontiguousarray(pal[:, 0][idx])
    return pal[idx]


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed BMP → (H, W[, 3]) uint8. 8-bit paletted, 24-bit BGR,
    32-bit BGRA (alpha dropped); BI_RGB compression only — RLE4/RLE8 and
    bitfield DIBs raise."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER BMPs are unsupported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    comp = struct.unpack_from("<I", payload, 30)[0]
    if comp != 0:
        raise ValueError(f"BMP compression {comp} unsupported (BI_RGB only)")
    if bpp not in (8, 24, 32):
        raise ValueError(f"BMP bpp {bpp} unsupported (8/24/32)")
    top_down = h < 0
    h = abs(h)
    stride = ((w * bpp // 8) + 3) & ~3
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=h * stride, offset=data_off
    ).reshape(h, stride)
    if not top_down:
        raw = raw[::-1]
    if bpp == 8:
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal = np.frombuffer(
            payload, dtype=np.uint8, count=n_colors * 4, offset=14 + hdr_size
        ).reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRX → RGB
        idx = raw[:, :w]
        return _pal_map(pal, idx)
    px = raw[:, : w * (bpp // 8)].reshape(h, w, bpp // 8)
    rgb = px[:, :, 2::-1]  # BGR(A) → RGB: truecolor never collapses
    return np.ascontiguousarray(rgb)


def encode_bmp(im: np.ndarray) -> bytes:
    """(H, W) or (H, W, 3) uint8 → bottom-up BMP (8-bit gray palette /
    24-bit BGR) — the synthetic round-trip twin."""
    im = np.asarray(im)
    if im.dtype != np.uint8:
        raise TypeError("BMP twin is uint8 only")
    h, w = im.shape[:2]
    if im.ndim == 2:
        bpp, pal = 8, bytes(
            b for i in range(256) for b in (i, i, i, 0)
        )
        rows = im
    elif im.ndim == 3 and im.shape[2] == 3:
        bpp, pal = 24, b""
        rows = im[:, :, ::-1]  # RGB → BGR
    else:
        raise TypeError(f"expected (H,W) or (H,W,3), got {im.shape}")
    stride = ((w * bpp // 8) + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * bpp // 8] = rows.reshape(h, -1)
    body = body[::-1].tobytes()  # bottom-up
    data_off = 14 + 40 + len(pal)
    header = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(body), 2835, 2835,
            256 if bpp == 8 else 0, 0,
        )
    )
    return header + pal + body


# ---------------------------------------------------------------------------
# GIF (87a/89a) — LSB-first LZW, the mirror image of TIFF §13's packing
# ---------------------------------------------------------------------------


def _gif_lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    next_code = eoi + 1
    prev: bytes | None = None
    acc = nacc = 0
    for byte in data:
        acc |= byte << nacc
        nacc += 8
        while nacc >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nacc -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                next_code = eoi + 1
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table[code]
            else:
                if code < next_code:
                    entry = table[code]
                elif code == next_code:  # KwKwK
                    entry = prev + prev[:1]
                else:
                    raise ValueError("corrupt GIF LZW stream")
                if next_code < 4096:  # full table: deferred-clear mode
                    table.append(prev + entry[:1])
                    next_code += 1
                    # GIF widens AFTER the entry that fills the current
                    # width is assigned (no TIFF early-change quirk)
                    if next_code == (1 << width) and width < 12:
                        width += 1
            out += entry
            prev = entry
    return bytes(out)


def _gif_lzw_encode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nacc = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    w = b""
    for b in data:
        c = w + bytes([b])
        if c in table:
            w = c
            continue
        emit(table[w], width)
        table[c] = next_code
        next_code += 1
        # the decoder adds OUR n-th entry only while reading our (n+1)-th
        # code, so it widens one emission later than a self-centred
        # encoder would: widen when the just-assigned code OVERFLOWS the
        # width (next_code == 2^width + 1), not when it fills it
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a FIRST frame → (H, W[, 3]) uint8. Handles global/local
    palettes, interlacing, extension blocks; later animation frames are
    ignored (still-image semantics — the dedup/feature pipelines treat
    the cover frame as the image)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    pos = 6
    sw, sh, flags, bg, _ar = struct.unpack_from("<HHBBB", payload, pos)
    pos += 7
    gpal = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gpal = np.frombuffer(
            payload, dtype=np.uint8, count=n * 3, offset=pos
        ).reshape(n, 3)
        pos += n * 3
    tidx = None  # GCE transparent-color index (applies to the next frame)
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            label = payload[pos]
            pos += 1
            first_sub = None
            while payload[pos]:
                ln = payload[pos]
                if first_sub is None:
                    first_sub = payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            if label == 0xF9 and first_sub and len(first_sub) >= 4:
                # Graphic Control Extension: packed flags byte bit 0 is
                # the transparency flag, byte 3 the transparent index —
                # ignoring it painted transparent pixels as the opaque
                # palette color and broke the "same picture as PNG/BMP
                # hashes identically" dedup guarantee
                tidx = first_sub[3] if first_sub[0] & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        fx, fy, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        pal = gpal
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            pal = np.frombuffer(
                payload, dtype=np.uint8, count=n * 3, offset=pos
            ).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF frame has no palette")
        min_code_size = payload[pos]
        pos += 1
        chunks = []
        while payload[pos]:
            ln = payload[pos]
            chunks.append(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _gif_lzw_decode(b"".join(chunks), min_code_size),
            dtype=np.uint8,
            count=w * h,
        ).reshape(h, w)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            out = np.empty_like(idx)
            src = 0
            for start, step in _INTERLACE_PASSES:
                n_rows = len(range(start, h, step))
                out[start::step] = idx[src : src + n_rows]
                src += n_rows
            idx = out
        transparent = tidx is not None and bool((idx == tidx).any())
        if (fx, fy, w, h) != (0, 0, sw, sh) or transparent:
            # frame smaller than the logical screen (composite onto the
            # background-colored canvas at its declared offset — the
            # IMAGE is the canvas, not the sub-rectangle: a PNG of the
            # same picture decodes canvas-sized, and the pHash dedup
            # guarantee depends on the shapes agreeing) and/or a GCE
            # transparent index (transparent pixels show the background,
            # not the opaque palette entry). Compose in RGB: the frame's
            # (possibly local) palette and the global background index
            # need not share a table.
            bg_rgb = (
                gpal[bg] if gpal is not None and bg < len(gpal)
                else np.zeros(3, dtype=np.uint8)
            )
            canvas = np.empty((sh, sw, 3), dtype=np.uint8)
            canvas[:] = bg_rgb
            frame_rgb = pal[idx]
            if transparent:
                frame_rgb = frame_rgb.copy()
                frame_rgb[idx == tidx] = bg_rgb
            canvas[fy : fy + h, fx : fx + w] = frame_rgb
            # same palette-gated (never content-gated) collapse rule
            if (
                (pal[:, 0] == pal[:, 1]).all()
                and (pal[:, 1] == pal[:, 2]).all()
                and bg_rgb[0] == bg_rgb[1] == bg_rgb[2]
            ):
                return np.ascontiguousarray(canvas[..., 0])
            return canvas
        return _pal_map(pal, idx)
    raise ValueError("GIF contains no image frame")


def encode_gif(im: np.ndarray) -> bytes:
    """(H, W) uint8 gray, or (H, W, 3) uint8 with ≤256 distinct colors →
    single-frame GIF89a (the round-trip twin; color quantization is out
    of scope, a >256-color RGB raises)."""
    im = np.asarray(im)
    if im.dtype != np.uint8:
        raise TypeError("GIF twin is uint8 only")
    if im.ndim == 2:
        pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
        idx = im
    elif im.ndim == 3 and im.shape[2] == 3:
        flat = im.reshape(-1, 3)
        colors, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError(
                f"GIF twin needs <=256 distinct colors, got {len(colors)}"
            )
        pal = np.zeros((256, 3), dtype=np.uint8)
        pal[: len(colors)] = colors
        idx = inverse.astype(np.uint8).reshape(im.shape[:2])
    else:
        raise TypeError(f"expected (H,W) or (H,W,3), got {im.shape}")
    h, w = idx.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 7, 0, 0)  # 256-color GCT
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code_size = 8
    out.append(min_code_size)
    lzw = _gif_lzw_encode(idx.tobytes(), min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
