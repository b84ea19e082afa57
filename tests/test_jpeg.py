"""Progressive JPEG (T.81 Annex G) — decoder + encoder twin in
imagingdb_spark/jpeg.py. The strongest check is COEFFICIENT parity: the
progressive and sequential encoders quantize identically, so decoding a
progressive stream must reproduce the sequential decode BIT-FOR-BIT
(any slip in EOBRUN, refinement bits, ZRL-in-refine, or scan bookkeeping
breaks exact equality)."""

import numpy as np
import pytest

from imagingdb_spark import jpeg

rng = np.random.default_rng(20260818)


def _smooth(h, w, seed, lo=0, hi=200):
    r = np.random.default_rng(seed)
    k = np.ones(5) / 5
    base = r.integers(lo, hi, (h, w)).astype(float)
    sm = np.apply_along_axis(lambda x: np.convolve(x, k, "same"), 0, base)
    sm = np.apply_along_axis(lambda x: np.convolve(x, k, "same"), 1, sm)
    return sm.astype(np.uint8)


class TestProgressive:
    @pytest.mark.parametrize(
        "shape", [(8, 8), (17, 23), (40, 56), (64, 129)]
    )
    def test_gray_matches_sequential_exactly(self, shape):
        im = _smooth(*shape, seed=shape[0] * 100 + shape[1])
        prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(im, 90))
        seq = jpeg.decode_jpeg(jpeg.encode_jpeg(im, 90))
        np.testing.assert_array_equal(prog, seq)

    def test_rgb_matches_sequential_exactly(self):
        im = np.stack(
            [_smooth(33, 47, s) for s in (1, 2, 3)], axis=-1
        )
        prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(im, 92))
        seq = jpeg.decode_jpeg(jpeg.encode_jpeg(im, 92))
        np.testing.assert_array_equal(prog, seq)

    def test_quality_bound_vs_original(self):
        im = _smooth(48, 48, 9)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(im, 95))
        assert int(np.abs(out.astype(int) - im.astype(int)).max()) <= 8

    def test_flat_image_exercises_long_eobruns(self):
        # constant image: every AC band is empty → one maximal EOB run
        # per scan; DC still varies nothing
        im = np.full((64, 64), 130, dtype=np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(im, 90))
        np.testing.assert_array_equal(out, np.full((64, 64), 130))

    def test_sparse_blocks_mix_eob_and_data(self):
        # mostly-flat image with a few busy blocks: EOBRUN interleaves
        # with coded blocks, and refinement sees long zero-history runs
        im = np.full((80, 80), 100, dtype=np.uint8)
        im[16:24, 40:48] = _smooth(8, 8, 4, lo=0, hi=255)
        im[64:72, 8:16] = rng.integers(0, 255, (8, 8)).astype(np.uint8)
        prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(im, 85))
        seq = jpeg.decode_jpeg(jpeg.encode_jpeg(im, 85))
        np.testing.assert_array_equal(prog, seq)

    def test_noise_exercises_zrl_in_refine(self):
        # pixel noise: high-frequency coefficients everywhere, many
        # newly-significant coeffs per refinement pass incl. 16+ runs
        im = rng.integers(0, 255, (48, 64)).astype(np.uint8)
        prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(im, 75))
        seq = jpeg.decode_jpeg(jpeg.encode_jpeg(im, 75))
        np.testing.assert_array_equal(prog, seq)

    @pytest.mark.parametrize("dri", [1, 3, 7])
    def test_restart_markers(self, dri):
        im = _smooth(40, 40, 11)
        prog = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(im, 90, restart_interval=dri)
        )
        seq = jpeg.decode_jpeg(jpeg.encode_jpeg(im, 90))
        np.testing.assert_array_equal(prog, seq)

    def test_rgb_restarts(self):
        im = np.stack([_smooth(24, 31, s) for s in (5, 6, 7)], axis=-1)
        prog = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(im, 90, restart_interval=2)
        )
        seq = jpeg.decode_jpeg(jpeg.encode_jpeg(im, 90))
        np.testing.assert_array_equal(prog, seq)

    def test_decode_image_dispatches_progressive(self):
        from imagingdb_spark import webimg

        im = _smooth(20, 20, 8)
        blob = jpeg.encode_jpeg_progressive(im, 95)
        assert webimg.sniff_format(blob) == "jpeg"
        out = webimg.decode_image(blob)
        assert out.shape == (20, 20)

    def test_arithmetic_streams_rejected(self):
        blob = bytearray(jpeg.encode_jpeg(_smooth(8, 8, 1)))
        i = blob.index(b"\xff\xc0")
        blob[i + 1] = 0xC9  # arithmetic sequential
        with pytest.raises(ValueError, match="arithmetic"):
            jpeg.decode_jpeg(bytes(blob))


class Test12Bit:
    """12-bit extended sequential (SOF1, precision 12) — the remaining
    DCT flavor microscopy/medical TIFFs carry."""

    def _im(self, h, w, seed):
        r = np.random.default_rng(seed)
        k = np.ones(5) / 5
        base = r.integers(0, 3500, (h, w)).astype(float)
        sm = np.apply_along_axis(lambda x: np.convolve(x, k, "same"), 0, base)
        sm = np.apply_along_axis(lambda x: np.convolve(x, k, "same"), 1, sm)
        return sm.astype(np.uint16)

    def test_gray_roundtrip_quality(self):
        im = self._im(40, 56, 1)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg_12bit(im, quality=95))
        assert out.dtype == np.uint16 and out.shape == im.shape
        # q95 error bound scales with the 16x range (8-bit bound was 8)
        assert int(np.abs(out.astype(int) - im.astype(int)).max()) <= 128

    def test_rgb_roundtrip(self):
        im = np.stack(
            [self._im(21, 33, s) for s in (2, 3, 4)], axis=-1
        ).astype(np.uint16)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg_12bit(im, quality=95))
        assert out.dtype == np.uint16 and out.shape == im.shape
        assert int(np.abs(out.astype(int) - im.astype(int)).max()) <= 256

    def test_tiff_jpeg12_page(self):
        from imagingdb_spark import tiff

        im = self._im(24, 31, 5)
        out = tiff.read_tiff_pages(
            tiff.write_tiff([im], compression="jpeg12")
        )[0]
        assert out.dtype == np.uint16
        assert int(np.abs(out.astype(int) - im.astype(int)).max()) <= 128

    def test_range_and_dtype_guards(self):
        with pytest.raises(ValueError, match="4096"):
            jpeg.encode_jpeg_12bit(
                np.full((8, 8), 5000, dtype=np.uint16)
            )
        with pytest.raises(ValueError, match="uint16"):
            jpeg.encode_jpeg_12bit(np.zeros((8, 8), dtype=np.uint8))
        with pytest.raises(ValueError, match="unsupported"):
            # 16-bit DCT precision stays behind the seam
            blob = bytearray(jpeg.encode_jpeg_12bit(self._im(8, 8, 6)))
            i = blob.index(b"\xff\xc1")
            blob[i + 4] = 16
            jpeg.decode_jpeg(bytes(blob))


class TestFillBytes:
    def test_fill_bytes_before_markers(self):
        """T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes;
        real camera streams pad this way."""
        im = _smooth(16, 16, 3)
        blob = jpeg.encode_jpeg(im, 90)
        i = blob.index(b"\xff\xc0")
        padded = blob[:i] + b"\xff\xff\xff" + blob[i:]
        np.testing.assert_array_equal(
            jpeg.decode_jpeg(padded), jpeg.decode_jpeg(blob)
        )


class TestLossless:
    """Lossless JPEG (SOF3, T.81 Annex H) — the old-DICOM transfer
    syntax. The contract is BIT-EXACT reconstruction, so every test
    asserts full equality, not a tolerance."""

    @pytest.mark.parametrize("pred", list(range(1, 8)))
    def test_all_predictors_bit_exact(self, pred):
        im = rng.integers(0, 255, (23, 31), endpoint=True).astype(np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg_lossless(im, predictor=pred))
        np.testing.assert_array_equal(out, im)

    def test_16bit_and_12bit_gray(self):
        g16 = rng.integers(0, 65535, (17, 19), endpoint=True).astype(
            np.uint16
        )
        out = jpeg.decode_jpeg(jpeg.encode_jpeg_lossless(g16))
        assert out.dtype == np.uint16
        np.testing.assert_array_equal(out, g16)
        g12 = rng.integers(0, 4095, (11, 13), endpoint=True).astype(
            np.uint16
        )
        out12 = jpeg.decode_jpeg(jpeg.encode_jpeg_lossless(g12))
        np.testing.assert_array_equal(out12, g12)

    def test_rgb_bit_exact(self):
        im = rng.integers(0, 255, (9, 14, 3), endpoint=True).astype(np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg_lossless(im, predictor=7))
        np.testing.assert_array_equal(out, im)

    def test_point_transform_masks_low_bits(self):
        im = rng.integers(0, 255, (8, 8), endpoint=True).astype(np.uint8)
        out = jpeg.decode_jpeg(
            jpeg.encode_jpeg_lossless(im, point_transform=2)
        )
        np.testing.assert_array_equal(out, (im >> 2) << 2)

    def test_smooth_content_compresses(self):
        im = _smooth(64, 64, 21)
        blob = jpeg.encode_jpeg_lossless(im, predictor=4)
        assert len(blob) < im.size  # < 8 bits/sample on smooth content

    def test_worst_case_diff_roundtrip(self):
        # alternating extremes force the modulo-2^16 wrap and SSSS=16
        im = np.zeros((4, 64), dtype=np.uint16)
        im[:, 1::2] = 65535
        out = jpeg.decode_jpeg(jpeg.encode_jpeg_lossless(im, predictor=1))
        np.testing.assert_array_equal(out, im)

    def test_magic_dispatch(self):
        from imagingdb_spark import webimg

        im = rng.integers(0, 255, (6, 6), endpoint=True).astype(np.uint8)
        blob = jpeg.encode_jpeg_lossless(im)
        assert webimg.sniff_format(blob) == "jpeg"
        np.testing.assert_array_equal(webimg.decode_image(blob), im)


class TestLosslessMultiScan:
    def test_multi_scan_lossless_raises_not_silent(self):
        """A non-interleaved lossless stream (SOS selecting fewer
        components than the SOF declares) must raise, not decode the
        first scan as a grayscale image (advice r8)."""
        im = rng.integers(0, 255, (9, 14, 3), endpoint=True).astype(np.uint8)
        blob = bytearray(jpeg.encode_jpeg_lossless(im, predictor=1))
        at = blob.find(b"\xff\xda")
        assert at > 0 and blob[at + 4] == 3  # ns: 3 interleaved comps
        blob[at + 4] = 1  # pretend scan 1 of a per-component stream
        with pytest.raises(ValueError, match="multi-scan lossless"):
            jpeg.decode_jpeg(bytes(blob))
