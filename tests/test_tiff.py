"""Pure-numpy TIFF codec: multi-page round trips over the frame contract,
big-endian (MM) reads against a hand-built file, compression rejection,
and the TIFF→PNG page-reader plug."""

import struct

import numpy as np
import pytest

from imagingdb_spark import png, tiff

rng = np.random.default_rng(11)


@pytest.mark.parametrize(
    "shapes,dtype",
    [
        ([(5, 7)], np.uint8),
        ([(5, 7), (5, 7), (5, 7)], np.uint16),
        ([(4, 6, 3), (4, 6, 3)], np.uint8),
        ([(3, 3, 3)], np.uint16),
        ([(8, 2), (2, 8)], np.uint8),  # per-page dims may differ
    ],
)
def test_multipage_roundtrip(shapes, dtype):
    hi = np.iinfo(dtype).max
    pages = [
        rng.integers(0, hi, size=s, endpoint=True).astype(dtype) for s in shapes
    ]
    back = tiff.read_tiff_pages(tiff.write_tiff(pages))
    assert len(back) == len(pages)
    for got, want in zip(back, pages):
        assert got.dtype == want.dtype and got.shape == want.shape
        np.testing.assert_array_equal(got, want)


def _build_mm_tiff(im: np.ndarray) -> bytes:
    """Hand-built single-page big-endian TIFF (one strip, uncompressed) —
    our writer emits II only, so MM coverage needs its own bytes."""
    h, w = im.shape
    strip = im.astype(">u1").tobytes()
    # layout: header(8) | strip | IFD
    strip_off = 8
    ifd_off = strip_off + len(strip)
    out = b"MM\x00*" + struct.pack(">I", ifd_off) + strip
    entries = [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, 1, 8 << 16),  # SHORT value left-justified in MM
        (259, 3, 1, 1 << 16),
        (262, 3, 1, 1 << 16),
        (273, 4, 1, strip_off),
        (277, 3, 1, 1 << 16),
        (278, 4, 1, h),
        (279, 4, 1, len(strip)),
    ]
    out += struct.pack(">H", len(entries))
    for tag, ftype, count, value in entries:
        out += struct.pack(">HHII", tag, ftype, count, value)
    out += b"\x00\x00\x00\x00"
    return out


def test_big_endian_read():
    im = rng.integers(0, 255, size=(4, 6), endpoint=True).astype(np.uint8)
    pages = tiff.read_tiff_pages(_build_mm_tiff(im))
    assert len(pages) == 1
    np.testing.assert_array_equal(pages[0], im)


class TestErrors:
    def test_bad_header(self):
        with pytest.raises(ValueError, match="TIFF"):
            tiff.read_tiff_pages(b"definitely not a tiff")

    def test_compressed_rejected(self):
        blob = bytearray(tiff.write_tiff([np.zeros((2, 2), np.uint8)]))
        # patch the Compression entry's value (type SHORT, little-endian)
        at = blob.find(struct.pack("<HH", 259, 3))
        assert at > 0
        struct.pack_into("<H", blob, at + 8, 5)  # 5 = LZW
        with pytest.raises(ValueError, match="Compression"):
            tiff.read_tiff_pages(bytes(blob))

    def test_writer_rejects_bad_dtype(self):
        with pytest.raises(TypeError, match="uint8/uint16"):
            tiff.write_tiff([np.zeros((2, 2), np.float64)])


def test_png_page_reader_plug():
    pages = [
        rng.integers(0, 65535, size=(5, 4), endpoint=True).astype(np.uint16)
        for _ in range(3)
    ]
    payloads = tiff.png_page_reader(tiff.write_tiff(pages))
    assert len(payloads) == 3
    for blob, want in zip(payloads, pages):
        np.testing.assert_array_equal(png.decode_png(blob), want)


class TestImageDescription:
    def test_description_roundtrip_and_parse(self):
        desc = "ImageJ=1.53\nimages=6\nchannels=2\nslices=3\nframes=1"
        pages = [np.zeros((2, 2), np.uint8) for _ in range(6)]
        blob = tiff.write_tiff(pages, description=desc)
        assert tiff.read_description(blob) == desc
        got = tiff.parse_ij_description(desc)
        assert got == {
            "nbr_channels": 2, "nbr_slices": 3,
            "nbr_timepoints": 1, "nbr_positions": 1,
        }
        # pages still decode identically with the extra ASCII entry
        assert len(tiff.read_tiff_pages(blob)) == 6

    def test_no_description_returns_none(self):
        blob = tiff.write_tiff([np.zeros((2, 2), np.uint8)])
        assert tiff.read_description(blob) is None
        assert tiff.parse_ij_description(None)["nbr_channels"] == 1
