"""Web raster codecs (imagingdb_spark/webimg.py): BMP + GIF round trips,
magic-byte sniffing, and the unified decode_image dispatch the crawl
gates use (payload content decides the decoder, never the filename)."""

import struct

import numpy as np
import pytest

from imagingdb_spark import webimg

rng = np.random.default_rng(20260817)


class TestSniff:
    def test_magics(self):
        from imagingdb_spark import jpeg, png, tiff

        gray = rng.integers(0, 255, (9, 11), endpoint=True).astype(np.uint8)
        cases = {
            "png": png.encode_png(gray),
            "jpeg": jpeg.encode_jpeg(gray),
            "tiff": tiff.write_tiff([gray]),
            "bmp": webimg.encode_bmp(gray),
            "gif": webimg.encode_gif(gray),
        }
        for fmt, payload in cases.items():
            assert webimg.sniff_format(payload) == fmt
        assert webimg.sniff_format(b"RIFF\x00\x00\x00\x00WEBPVP8 ") == "webp"
        assert webimg.sniff_format(b"not an image") is None

    def test_decode_image_dispatch(self):
        from imagingdb_spark import png

        gray = rng.integers(0, 255, (7, 5), endpoint=True).astype(np.uint8)
        np.testing.assert_array_equal(
            webimg.decode_image(png.encode_png(gray)), gray
        )
        np.testing.assert_array_equal(
            webimg.decode_image(webimg.encode_bmp(gray)), gray
        )
        with pytest.raises(ValueError, match="webp"):
            webimg.decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
        with pytest.raises(ValueError, match="unknown magic"):
            webimg.decode_image(b"\x00\x01\x02")


class TestBmp:
    @pytest.mark.parametrize("w", [1, 3, 4, 13, 64])  # stride padding
    def test_gray_roundtrip(self, w):
        img = rng.integers(0, 255, (6, w), endpoint=True).astype(np.uint8)
        np.testing.assert_array_equal(
            webimg.decode_bmp(webimg.encode_bmp(img)), img
        )

    @pytest.mark.parametrize("w", [1, 2, 13, 32])
    def test_rgb_roundtrip(self, w):
        img = rng.integers(0, 255, (5, w, 3), endpoint=True).astype(np.uint8)
        out = webimg.decode_bmp(webimg.encode_bmp(img))
        np.testing.assert_array_equal(out, img)

    def test_top_down_rows(self):
        img = rng.integers(0, 255, (4, 6, 3), endpoint=True).astype(np.uint8)
        blob = bytearray(webimg.encode_bmp(img[::-1]))  # encoded bottom-up
        # flip the height sign: same pixel bytes now mean top-down
        struct.pack_into("<i", blob, 22, -4)
        np.testing.assert_array_equal(
            webimg.decode_bmp(bytes(blob)), img[::-1][::-1]
        )

    def test_32bpp_hand_built(self):
        img = rng.integers(0, 255, (2, 3, 3), endpoint=True).astype(np.uint8)
        h, w = 2, 3
        rows = []
        for r in range(h - 1, -1, -1):  # bottom-up
            row = b""
            for c in range(w):
                rr, gg, bb = img[r, c]
                row += bytes([bb, gg, rr, 0xFF])  # BGRA
            rows.append(row)  # stride 12: already 4-aligned
        body = b"".join(rows)
        hdr = (
            b"BM"
            + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
            + struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 32, 0, len(body), 0, 0, 0, 0
            )
        )
        np.testing.assert_array_equal(webimg.decode_bmp(hdr + body), img)

    def test_rle_rejected(self):
        blob = bytearray(webimg.encode_bmp(np.zeros((2, 2), np.uint8)))
        struct.pack_into("<I", blob, 30, 1)  # BI_RLE8
        with pytest.raises(ValueError, match="compression"):
            webimg.decode_bmp(bytes(blob))


class TestGif:
    def test_gray_roundtrip(self):
        img = rng.integers(0, 255, (13, 17), endpoint=True).astype(np.uint8)
        np.testing.assert_array_equal(
            webimg.decode_gif(webimg.encode_gif(img)), img
        )

    def test_rgb_palette_roundtrip(self):
        # 7 distinct colors over a 20x30 canvas
        pal = rng.integers(0, 255, (7, 3), endpoint=True).astype(np.uint8)
        idx = rng.integers(0, 7, (20, 30))
        img = pal[idx]
        out = webimg.decode_gif(webimg.encode_gif(img))
        np.testing.assert_array_equal(out, img)

    def test_large_image_exercises_width_growth_and_clear(self):
        # >4096 LZW entries: codes walk 9→12 bits and the encoder emits a
        # mid-stream Clear; pixel-random content defeats run reuse
        img = rng.integers(0, 255, (80, 200), endpoint=True).astype(np.uint8)
        np.testing.assert_array_equal(
            webimg.decode_gif(webimg.encode_gif(img)), img
        )

    def test_extension_blocks_skipped(self):
        img = rng.integers(0, 255, (5, 8), endpoint=True).astype(np.uint8)
        blob = webimg.encode_gif(img)
        i = 6 + 7 + 768  # header + LSD + 256-color GCT = image descriptor
        assert blob[i] == 0x2C
        # splice a Graphic Control Extension before the image descriptor
        gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        np.testing.assert_array_equal(
            webimg.decode_gif(blob[:i] + gce + blob[i:]), img
        )

    def test_interlaced_decode(self):
        img = rng.integers(0, 255, (13, 9), endpoint=True).astype(np.uint8)
        h = img.shape[0]
        order = [
            r
            for start, step in webimg._INTERLACE_PASSES
            for r in range(start, h, step)
        ]
        # encode rows pre-permuted into pass order, then set the
        # interlace flag so the decoder must un-permute them
        blob = bytearray(webimg.encode_gif(img[order]))
        i = 6 + 7 + 768
        assert blob[i] == 0x2C
        blob[i + 9] |= 0x40
        np.testing.assert_array_equal(
            webimg.decode_gif(bytes(blob)), img
        )

    def test_too_many_colors_rejected(self):
        img = np.arange(20 * 20 * 3, dtype=np.uint8).reshape(20, 20, 3)
        img[..., 0] = rng.integers(0, 255, (20, 20))
        img[..., 1] = rng.integers(0, 255, (20, 20))
        with pytest.raises(ValueError, match="distinct colors"):
            webimg.encode_gif(img)

    def test_first_frame_of_animation(self):
        a = rng.integers(0, 255, (4, 6), endpoint=True).astype(np.uint8)
        b = rng.integers(0, 255, (4, 6), endpoint=True).astype(np.uint8)
        blob_a, blob_b = webimg.encode_gif(a), webimg.encode_gif(b)
        ib = 6 + 7 + 768
        assert blob_a[ib] == blob_b[ib] == 0x2C
        # crude two-frame assembly: header+GCT from a, both image blocks
        two = blob_a[:-1] + blob_b[ib:]
        assert two.endswith(b"\x3b")
        np.testing.assert_array_equal(webimg.decode_gif(two), a)


class TestCrawlDecoderSeam:
    """multimodal.decode_any through the pHash pipeline: the same picture
    fetched as PNG / BMP / GIF / JPEG must hash together — the crawl
    gate's 'same image, different container' dedup case."""

    def test_mixed_format_payloads_hash_together(self, spark):
        from pyspark.sql import functions as F

        from imagingdb_spark import jpeg, multimodal, png

        r = np.random.default_rng(5)
        k = np.ones(7) / 7
        base = r.integers(0, 200, size=(64, 64)).astype(np.uint8)
        smooth = np.apply_along_axis(
            lambda x: np.convolve(x, k, mode="same"), 0, base
        )
        smooth = np.apply_along_axis(
            lambda x: np.convolve(x, k, mode="same"), 1, smooth
        ).astype(np.uint8)
        other = r.integers(0, 255, size=(64, 64)).astype(np.uint8)
        payloads = [
            png.encode_png(smooth),
            webimg.encode_bmp(smooth),
            webimg.encode_gif(smooth),
            jpeg.encode_jpeg(smooth, quality=95),  # lossy but near
            png.encode_png(other),
        ]
        rows = [
            (f"DS-{i}", 0, 0, 0, i, 64, 64, "uint8", p)
            for i, p in enumerate(payloads)
        ]
        frames = spark.createDataFrame(rows, multimodal.FRAME_SCHEMA)
        hashed = {
            r["pos_idx"]: r["phash"]
            for r in multimodal.phash_frames(
                frames, decoder=multimodal.decode_any
            ).collect()
        }

        def ham(a, b):
            return bin(a ^ b).count("1")

        assert hashed[0] == hashed[1] == hashed[2]  # lossless: identical
        assert ham(hashed[0], hashed[3]) <= multimodal.PHASH_MAX_DISTANCE
        assert ham(hashed[0], hashed[4]) > 20  # different image stays far

    def test_bit_depth_drift_check(self):
        from imagingdb_spark import multimodal

        gray = np.zeros((4, 4), dtype=np.uint8)
        payload = webimg.encode_bmp(gray)
        out = multimodal.decode_any(payload, "uint8")
        assert out.dtype == np.uint8
        with pytest.raises(ValueError, match="bit_depth"):
            multimodal.decode_any(payload, "uint16")
        # crawl rows carry no declaration: empty string skips the check
        assert multimodal.decode_any(payload, "").shape == (4, 4)


class TestReviewFixes:
    """Regressions for the round-8 review findings on the crawl seam."""

    def test_truecolor_gray_content_keeps_3d_shape(self):
        # collapse is PALETTE-gated, never content-gated: a 24-bit BMP
        # whose pixels happen to be gray must stay (H, W, 3)
        gray3 = np.repeat(
            rng.integers(0, 255, (4, 6, 1), endpoint=True), 3, axis=2
        ).astype(np.uint8)
        out = webimg.decode_bmp(webimg.encode_bmp(gray3))
        assert out.shape == (4, 6, 3)
        # while an 8-bit GRAY-PALETTE BMP still collapses
        g = gray3[..., 0]
        assert webimg.decode_bmp(webimg.encode_bmp(g)).shape == (4, 6)

    def test_gif_partial_frame_composites_onto_canvas(self):
        img = rng.integers(0, 255, (4, 4), endpoint=True).astype(np.uint8)
        blob = bytearray(webimg.encode_gif(img))
        i = 6 + 7 + 768
        assert blob[i] == 0x2C
        # grow the logical screen to 10x10 and offset the frame to (3,2)
        struct.pack_into("<HH", blob, 6, 10, 10)
        blob[11] = 7  # background color index (gray palette → 7)
        struct.pack_into("<HH", blob, i + 1, 3, 2)  # fx, fy
        out = webimg.decode_gif(bytes(blob))
        assert out.shape == (10, 10)
        np.testing.assert_array_equal(out[2:6, 3:7], img)
        assert (out != 7).sum() <= img.size  # background fills the rest

    def test_malformed_payloads_raise_valueerror(self):
        for payload in (
            b"GIF89a",                      # truncated header
            b"BM" + b"\x00" * 5,            # truncated BMP
            b"\x89PNG\r\n\x1a\n" + b"junk",  # truncated PNG
            b"II*\x00" + b"\xff" * 3,       # truncated TIFF
        ):
            with pytest.raises(ValueError):
                webimg.decode_image(payload)

    def test_tiff_first_page_only_decode(self):
        from imagingdb_spark import tiff

        pages = [
            np.full((8, 8), 10, dtype=np.uint8),
            np.full((8, 8), 20, dtype=np.uint8),
        ]
        blob = tiff.write_tiff(pages)
        out = webimg.decode_image(blob)
        np.testing.assert_array_equal(out, pages[0])
        assert len(tiff.read_tiff_pages(blob, max_pages=1)) == 1
        assert len(tiff.read_tiff_pages(blob)) == 2

    def test_phash_skip_drops_only_poisoned_rows(self, spark):
        from imagingdb_spark import multimodal, png

        good = rng.integers(0, 255, (16, 16), endpoint=True).astype(np.uint8)
        rows = [
            ("DS-0", 0, 0, 0, 0, 16, 16, "uint8", png.encode_png(good)),
            ("DS-1", 0, 0, 0, 1, 16, 16, "uint8", b"GIF89a"),  # truncated
            ("DS-2", 0, 0, 0, 2, 16, 16, "uint8", b"not an image"),
            ("DS-3", 0, 0, 0, 3, 16, 16, "uint8",
             webimg.encode_bmp(good)),
        ]
        frames = spark.createDataFrame(rows, multimodal.FRAME_SCHEMA)
        got = multimodal.phash_frames(
            frames, decoder=multimodal.decode_any, on_error="skip"
        ).collect()
        assert sorted(r["pos_idx"] for r in got) == [0, 3]
        hashes = {r["pos_idx"]: r["phash"] for r in got}
        assert hashes[0] == hashes[3]  # same picture, different container
        # and the surviving hashes are EXACT — a poisoned batch must not
        # round the good rows' 63-bit hashes through a float64 column
        clean = spark.createDataFrame(
            [rows[0]], multimodal.FRAME_SCHEMA
        )
        want = multimodal.phash_frames(
            clean, decoder=multimodal.decode_any
        ).collect()[0]["phash"]
        assert hashes[0] == want
        # default mode still surfaces the failure
        with pytest.raises(Exception):
            multimodal.phash_frames(
                frames, decoder=multimodal.decode_any
            ).collect()


class TestGifTransparency:
    """GIF89a Graphic Control Extension transparency (advice r8): a
    transparent pixel shows the BACKGROUND color, not the opaque palette
    entry — otherwise 'same picture, different container' dedup quietly
    diverges for transparent GIFs."""

    def _with_gce(self, blob: bytes, tidx: int, flag: int = 1) -> bytes:
        ib = 6 + 7 + 768  # header + screen descriptor + 256-entry GCT
        assert blob[ib] == 0x2C
        gce = b"\x21\xf9\x04" + bytes([flag, 0, 0, tidx]) + b"\x00"
        return blob[:ib] + gce + blob[ib:]

    def test_transparent_pixels_become_background(self):
        im = np.full((5, 7), 10, dtype=np.uint8)
        im[2, 3] = im[4, 6] = 200
        blob = self._with_gce(webimg.encode_gif(im), tidx=200)
        out = webimg.decode_gif(blob)
        want = im.copy()
        want[im == 200] = 0  # bg index 0 -> gray palette value 0
        assert out.shape == im.shape  # gray palette + gray bg collapse
        np.testing.assert_array_equal(out, want)

    def test_transparency_flag_off_keeps_opaque_decode(self):
        im = np.full((5, 7), 10, dtype=np.uint8)
        im[2, 3] = 200
        blob = self._with_gce(webimg.encode_gif(im), tidx=200, flag=0)
        np.testing.assert_array_equal(webimg.decode_gif(blob), im)

    def test_transparent_gif_hashes_like_composited_png(self):
        from imagingdb_spark import multimodal, png

        im = np.full((16, 16), 77, dtype=np.uint8)
        im[4:9, 6:11] = 190
        blob = self._with_gce(webimg.encode_gif(im), tidx=190)
        composited = im.copy()
        composited[im == 190] = 0
        assert multimodal._phash_one(webimg.decode_gif(blob)) == \
            multimodal._phash_one(png.decode_png(png.encode_png(composited)))
