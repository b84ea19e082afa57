"""Pure-numpy PNG codec: round trips for every (dtype, colors) the frame
contract allows, decode of all five spec filter types against
hand-filtered scanlines, corruption detection, and the codec running as
the DEFAULT decoder inside the Spark frame-features pipeline (the path
that was stubbed before round 3)."""

import struct
import zlib

import numpy as np
import pytest

from imagingdb_spark import multimodal, png

rng = np.random.default_rng(7)


@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((5, 7), np.uint8),
        ((5, 7), np.uint16),
        ((4, 6, 3), np.uint8),
        ((4, 6, 3), np.uint16),
        ((1, 1), np.uint8),
        ((32, 17), np.uint16),
    ],
)
def test_roundtrip(shape, dtype):
    hi = np.iinfo(dtype).max
    im = rng.integers(0, hi, size=shape, endpoint=True).astype(dtype)
    back = png.decode_png(png.encode_png(im))
    assert back.dtype == dtype and back.shape == im.shape
    np.testing.assert_array_equal(back, im)


def test_squeeze_matches_reference():
    # serialize_im squeezes singleton dims (image_utils.py:17)
    im = rng.integers(0, 255, size=(1, 5, 7, 1)).astype(np.uint8)
    back = png.decode_png(png.encode_png(im))
    np.testing.assert_array_equal(back, np.squeeze(im))


def _filter_scanlines(im: np.ndarray, filters: list[int]) -> bytes:
    """Inverse of the decoder's reconstruction: apply spec filters 0-4 to
    raw scanlines (bpp=1 greyscale uint8), building an images' IDAT body."""
    h, w = im.shape
    prior = np.zeros(w, dtype=np.int16)
    body = b""
    for y in range(h):
        r = im[y].astype(np.int16)
        f = filters[y % len(filters)]
        left = np.concatenate(([0], r[:-1]))
        upleft = np.concatenate(([0], prior[:-1]))
        if f == 0:
            d = r
        elif f == 1:
            d = r - left
        elif f == 2:
            d = r - prior
        elif f == 3:
            d = r - ((left + prior) >> 1)
        else:  # Paeth
            p = left + prior - upleft
            pa, pb, pc = (
                np.abs(p - left),
                np.abs(p - prior),
                np.abs(p - upleft),
            )
            pred = np.where(
                (pa <= pb) & (pa <= pc),
                left,
                np.where(pb <= pc, prior, upleft),
            )
            d = r - pred
        body += bytes([f]) + (d % 256).astype(np.uint8).tobytes()
        prior = r
    return body


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_decode_all_filter_types(filters):
    """Our encoder only emits filter 0; other encoders (cv2) use the rest.
    Build PNGs with hand-filtered scanlines and verify reconstruction."""
    im = rng.integers(0, 255, size=(9, 11), endpoint=True).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", 11, 9, 8, 0, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(_filter_scanlines(im, filters)))
        + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(png.decode_png(payload), im)


class TestErrors:
    def test_bad_signature(self):
        with pytest.raises(ValueError, match="signature"):
            png.decode_png(b"not a png at all")

    def test_crc_corruption_detected(self):
        blob = bytearray(png.encode_png(np.zeros((4, 4), np.uint8)))
        # flip a byte inside the IDAT payload
        idat_at = bytes(blob).index(b"IDAT") + 4
        blob[idat_at + 2] ^= 0xFF
        with pytest.raises(ValueError, match="CRC"):
            png.decode_png(bytes(blob))

    def test_unsupported_dtype(self):
        with pytest.raises(TypeError, match="uint8/uint16"):
            png.encode_png(np.zeros((4, 4), np.float32))

    def test_wrong_shape(self):
        with pytest.raises(TypeError, match="shape"):
            png.encode_png(np.zeros((4, 4, 2), np.uint8))


class TestMultimodalWiring:
    def test_serialize_deserialize_parity(self):
        im = rng.integers(0, 65535, size=(6, 8), endpoint=True).astype(np.uint16)
        np.testing.assert_array_equal(
            multimodal.deserialize_im(multimodal.serialize_im(im)), im
        )
        with pytest.raises(TypeError, match="Wrong file format"):
            multimodal.serialize_im(im, ".tif")

    def test_decode_png_checks_catalog_bit_depth(self):
        im = np.zeros((3, 3), np.uint8)
        blob = png.encode_png(im)
        np.testing.assert_array_equal(
            multimodal.decode_png(blob, "uint8"), im
        )
        with pytest.raises(ValueError, match="bit_depth"):
            multimodal.decode_png(blob, "uint16")

    def test_frame_features_with_default_decoder(self, spark):
        """End-to-end through Spark with NO injected fake: real PNG bytes
        in the payload column, decoded by the default codec inside
        mapInPandas — the exact path that was a stub before round 3."""
        ims = {
            (c, z): rng.integers(0, 65535, size=(4, 5), endpoint=True).astype(
                np.uint16
            )
            for c in range(2)
            for z in range(2)
        }
        rows = [
            ("DS-1", c, z, 0, 0, 5, 4, "uint16", png.encode_png(im))
            for (c, z), im in ims.items()
        ]
        df = spark.createDataFrame(rows, multimodal.FRAME_SCHEMA)
        got = {
            (r["channel_idx"], r["slice_idx"]): r
            for r in multimodal.frame_features(df).collect()
        }
        assert len(got) == 4
        for key, im in ims.items():
            r = got[key]
            assert r["mean_intensity"] == pytest.approx(float(im.mean()))
            assert r["max_intensity"] == float(im.max())
