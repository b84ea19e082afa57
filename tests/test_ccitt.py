"""CCITT fax codecs (imagingdb_spark/ccitt.py) + their TIFF integration
(Compression 2/3/4, bilevel pages) — the reference reads scanned bilevel
stacks through tifffile (ometif_splitter.py:68-106); these pin the native
path.

The known-vector tests re-derive the expected bitstreams BY HAND from the
published ITU-T T.4 code tables (terminating/makeup codes written out in
the test, not imported from the module) so an encoder/decoder that shares
a mistranscribed table cannot round-trip its way past them.
"""

import numpy as np
import pytest

from imagingdb_spark import ccitt, tiff

rng = np.random.default_rng(20260816)


def _blocky(h, w, seed, p=0.5):
    """Run-structured random bilevel image (fax-like content)."""
    r = np.random.default_rng(seed)
    base = r.random((max(1, h // 4), max(1, w // 8))) < p
    img = np.repeat(np.repeat(base, 4, axis=0), 8, axis=1)[:h, :w]
    if img.shape != (h, w):  # pad the clipped edge
        out = np.zeros((h, w), dtype=bool)
        out[: img.shape[0], : img.shape[1]] = img
        img = out
    return img


class TestKnownVectors:
    """Bitstreams hand-assembled from the published T.4 tables."""

    def test_mh_all_white_1728(self):
        # makeup 1728 = 010011011, terminating 0 white = 00110101
        # → 01001101 10011010 1(pad 0000000)
        row = np.zeros((1, 1728), dtype=bool)
        assert ccitt.encode_g3_1d(row, byte_aligned=True) == b"\x4d\x9a\x80"

    def test_mh_black3_white5(self):
        # white 0 = 00110101, black 3 = 10, white 5 = 1100
        # → 00110101 101100(pad 00)
        row = np.zeros((1, 8), dtype=bool)
        row[0, :3] = True
        assert ccitt.encode_g3_1d(row, byte_aligned=True) == b"\x35\xb0"

    def test_mh_decode_known(self):
        # black 2 = 11 after white 4 = 1011: 4 white, 2 black, 2 white
        # (white 2 = 0111) → 1011 11 0111 (pad 000000... 10 bits → 2B)
        data = bytes([0b10111101, 0b11000000])
        out = ccitt.decode_g3_1d(data, 8, 1, byte_aligned=True)
        np.testing.assert_array_equal(
            out[0], [False] * 4 + [True] * 2 + [False] * 2
        )

    def test_g4_all_white_with_eofb(self):
        # each all-white row = single V0 (bit 1); EOFB = 2×(11 zeros + 1)
        # → 11 000000000001 000000000001 (pad) = C0 04 00 40
        img = np.zeros((2, 8), dtype=bool)
        assert ccitt.encode_g4(img) == b"\xc0\x04\x00\x40"

    def test_g3_eol_delimits_rows(self):
        # EOL = 000000000001 before every line (T.4 §2.2)
        row = np.zeros((2, 8), dtype=bool)
        enc = ccitt.encode_g3_1d(row, byte_aligned=False)
        # white 8 = 10011; stream = EOL 10011 EOL 10011
        bits = "000000000001" + "10011" + "000000000001" + "10011"
        want = int(bits, 2) << (8 - len(bits) % 8)
        assert enc == want.to_bytes((len(bits) + 7) // 8, "big")

    def test_extended_makeup_2560(self):
        # 2560 white = 000000011111, then 000000 residual? no: 2560+0 →
        # makeup 2560 then terminating 0 white (00110101)
        row = np.zeros((1, 2560), dtype=bool)
        bits = "000000011111" + "00110101"
        want = int(bits, 2) << (8 - len(bits) % 8) if len(bits) % 8 else int(bits, 2)
        assert ccitt.encode_g3_1d(row, byte_aligned=True) == want.to_bytes(
            (len(bits) + 7) // 8, "big"
        )


class TestRoundTrip:
    @pytest.mark.parametrize("width", [1, 7, 8, 63, 64, 100, 333, 1728, 3000])
    def test_mh_widths(self, width):
        img = _blocky(6, width, seed=width)
        for aligned in (True, False):
            enc = ccitt.encode_g3_1d(img, byte_aligned=aligned)
            out = ccitt.decode_g3_1d(enc, width, 6, byte_aligned=aligned)
            np.testing.assert_array_equal(out, img)

    @pytest.mark.parametrize("width", [1, 7, 8, 63, 64, 100, 333, 1728, 3000])
    def test_g4_widths(self, width):
        img = _blocky(10, width, seed=1000 + width)
        out = ccitt.decode_g4(ccitt.encode_g4(img), width, 10)
        np.testing.assert_array_equal(out, img)

    @pytest.mark.parametrize(
        "img",
        [
            np.zeros((3, 16), dtype=bool),               # all white
            np.ones((3, 16), dtype=bool),                # all black
            np.eye(12, dtype=bool),                      # diagonal (VR/VL)
            np.tile([True, False], (4, 8)),              # 1-px stripes
            np.array([[False] * 2 + [True] * 4 + [False] * 2,
                      [False] * 8]),                     # pass mode next row
            np.array([[True] + [False] * 7]),            # starts black
            np.array([[False] * 7 + [True]]),            # ends black
        ],
        ids=["white", "black", "diag", "stripes", "pass", "lead", "trail"],
    )
    def test_g4_patterns(self, img):
        img = np.asarray(img, dtype=bool)
        h, w = img.shape
        out = ccitt.decode_g4(ccitt.encode_g4(img), w, h)
        np.testing.assert_array_equal(out, img)

    def test_g4_dense_random(self):
        # pixel-level randomness — worst case for 2-D coding, exercises
        # horizontal mode with tiny runs heavily
        img = rng.random((32, 47)) < 0.5
        out = ccitt.decode_g4(ccitt.encode_g4(img), 47, 32)
        np.testing.assert_array_equal(out, img)

    def test_g4_without_eofb(self):
        img = _blocky(5, 40, seed=7)
        enc = ccitt.encode_g4(img, eofb=False)
        np.testing.assert_array_equal(ccitt.decode_g4(enc, 40, 5), img)


class TestTiffIntegration:
    @pytest.mark.parametrize("comp", ["ccitt_rle", "ccitt_g3", "ccitt_g4"])
    def test_multipage_roundtrip(self, comp):
        pages = [
            _blocky(24, 33, seed=3),
            _blocky(16, 64, seed=4, p=0.2),
        ]
        blob = tiff.write_tiff([p for p in pages], compression=comp)
        out = tiff.read_tiff_pages(blob)
        assert len(out) == 2
        for want, got in zip(pages, out):
            assert got.dtype == np.uint8
            # WhiteIsZero: black (True) → 0, white → 255
            np.testing.assert_array_equal(
                got, np.where(want, 0, 255).astype(np.uint8)
            )

    def test_uint8_0_255_pages(self):
        page = np.where(_blocky(12, 20, seed=5), 0, 255).astype(np.uint8)
        out = tiff.read_tiff_pages(
            tiff.write_tiff([page], compression="ccitt_g4")
        )[0]
        np.testing.assert_array_equal(out, page)

    def test_fax_compresses_blocky_content(self):
        page = np.where(_blocky(64, 256, seed=6), 0, 255).astype(np.uint8)
        fax = tiff.write_tiff([page], compression="ccitt_g4")
        raw = tiff.write_tiff([page])
        assert len(fax) < len(raw) / 8  # 1-bit + MMR ≫ 8-bit raw

    def test_multi_strip_fax_restarts_per_strip(self):
        # hand-built tag dict: two strips of 3 rows each, G4-coded
        # independently (TIFF strips are independently decodable)
        img = _blocky(6, 40, seed=8)
        s1 = ccitt.encode_g4(img[:3])
        s2 = ccitt.encode_g4(img[3:])
        buf = s1 + s2
        tags = {
            tiff._STRIP_OFFSETS: [0, len(s1)],
            tiff._STRIP_COUNTS: [len(s1), len(s2)],
            tiff._ROWS_PER_STRIP: [3],
            tiff._PHOTOMETRIC: [0],
        }
        out = tiff._decode_fax_page(buf, tags, tiff._COMP_G4, 40, 6)
        np.testing.assert_array_equal(
            out, np.where(img, 0, 255).astype(np.uint8)
        )

    def test_blackiszero_photometric_inverts(self):
        img = _blocky(4, 16, seed=9)
        enc = ccitt.encode_g4(img)
        tags = {
            tiff._STRIP_OFFSETS: [0],
            tiff._STRIP_COUNTS: [len(enc)],
            tiff._PHOTOMETRIC: [1],
        }
        out = tiff._decode_fax_page(enc, tags, tiff._COMP_G4, 16, 4)
        np.testing.assert_array_equal(
            out, np.where(img, 255, 0).astype(np.uint8)
        )

    def test_unpack_bilevel_uncompressed(self):
        img = _blocky(5, 13, seed=10)
        packed = np.packbits(img.astype(np.uint8), axis=1).tobytes()
        out = tiff._unpack_bilevel(packed, 13, 5, 0)
        np.testing.assert_array_equal(
            out, np.where(img, 0, 255).astype(np.uint8)
        )

    def test_g3_2d_roundtrip_through_tiff(self):
        img = _blocky(20, 50, seed=12)
        blob = tiff.write_tiff([img], compression="ccitt_g3_2d")
        out = tiff.read_tiff_pages(blob)[0]
        np.testing.assert_array_equal(
            out, np.where(img, 0, 255).astype(np.uint8)
        )
        # denser than the pure-1D coding on 2-D-coherent content
        blob_1d = tiff.write_tiff([img], compression="ccitt_g3")
        assert len(blob) < len(blob_1d)

    def test_g3_uncompressed_mode_raises(self):
        tags = {
            tiff._T4_OPTIONS: [2],
            tiff._STRIP_OFFSETS: [0],
            tiff._STRIP_COUNTS: [0],
        }
        with pytest.raises(ValueError, match="uncompressed mode"):
            tiff._decode_fax_page(b"", tags, tiff._COMP_G3, 8, 1)

    def test_non_bilevel_page_rejected(self):
        page = np.full((4, 4), 128, dtype=np.uint8)
        with pytest.raises(TypeError, match="values \\{0, 255\\}"):
            tiff.write_tiff([page], compression="ccitt_g4")

    def test_png_page_reader_via_fax(self):
        from imagingdb_spark import png

        img = _blocky(10, 30, seed=11)
        blob = tiff.write_tiff([img], compression="ccitt_g4")
        frames = tiff.png_page_reader(blob)
        decoded = png.decode_png(frames[0])
        np.testing.assert_array_equal(
            decoded, np.where(img, 0, 255).astype(np.uint8)
        )


class TestG32D:
    """T.4 two-dimensional coding (Compression 3 + T4Options bit 0):
    EOL+tag-bit rows mixing 1-D MH and 2-D mode coding."""

    @pytest.mark.parametrize("width", [1, 7, 8, 64, 333, 1728, 3000])
    @pytest.mark.parametrize("k", [1, 2, 4, 100])
    def test_roundtrip_widths_and_k(self, width, k):
        img = _blocky(9, width, seed=width * 7 + k)
        enc = ccitt.encode_g3_2d(img, k=k)
        out = ccitt.decode_g3_2d(enc, width, 9)
        np.testing.assert_array_equal(out, img)

    def test_k1_is_all_1d(self):
        # K=1: every row 1-D — stream must equal the EOL-delimited MH
        # stream with a tag bit spliced after each EOL
        img = _blocky(4, 40, seed=13)
        enc = ccitt.encode_g3_2d(img, k=1)
        np.testing.assert_array_equal(
            ccitt.decode_g3_2d(enc, 40, 4), img
        )

    def test_dense_random(self):
        img = rng.random((16, 37)) < 0.5
        out = ccitt.decode_g3_2d(ccitt.encode_g3_2d(img), 37, 16)
        np.testing.assert_array_equal(out, img)

    def test_missing_eol_raises(self):
        img = _blocky(3, 16, seed=14)
        raw = ccitt.encode_g3_1d(img, byte_aligned=True)  # no EOLs
        with pytest.raises(ValueError, match="EOL"):
            ccitt.decode_g3_2d(raw, 16, 3)


class TestFillOrderAndBilevelCodecs:
    """Round-8 review fixes: FillOrder=2 fax streams and packed-bit
    pages under the general strip codecs."""

    def test_fillorder2_g4_page(self):
        img = _blocky(10, 40, seed=21)
        blob = bytearray(tiff.write_tiff([img], compression="ccitt_g4"))
        # hand-reverse the strip bytes and declare FillOrder=2: the
        # decoder must undo the LSB-first packing
        pages = tiff.read_tiff_pages(bytes(blob))  # sanity: decodes MSB
        enc = ccitt.encode_g4(img)
        rev = tiff._reverse_bits(enc)
        tags = {
            tiff._STRIP_OFFSETS: [0],
            tiff._STRIP_COUNTS: [len(rev)],
            tiff._PHOTOMETRIC: [0],
            tiff._FILL_ORDER: [2],
        }
        out = tiff._decode_fax_page(rev, tags, tiff._COMP_G4, 40, 10)
        np.testing.assert_array_equal(out, pages[0])

    @pytest.mark.parametrize("comp", [tiff._COMP_LZW, tiff._COMP_DEFLATE,
                                      tiff._COMP_PACKBITS])
    def test_bilevel_under_general_strip_codecs(self, comp):
        import struct as _s
        import zlib as _z

        img = _blocky(6, 20, seed=22)
        packed = np.packbits(img.astype(np.uint8), axis=1).tobytes()
        if comp == tiff._COMP_LZW:
            strip = tiff._lzw_encode(packed)
        elif comp == tiff._COMP_DEFLATE:
            strip = _z.compress(packed)
        else:
            strip = tiff._packbits_encode(packed)
        # hand-build a minimal 1-bit single-page TIFF
        out = bytearray(b"II*\x00\x00\x00\x00\x00")
        strip_off = len(out)
        out += strip

        def entry(tag, ftype, vals):
            code, size = tiff._TYPES[ftype]
            packed_v = _s.pack(f"<{len(vals)}{code}", *vals)
            return _s.pack("<HHI", tag, ftype, len(vals)) + packed_v.ljust(
                4, b"\x00"
            )

        entries = [
            entry(256, 4, [20]), entry(257, 4, [6]), entry(258, 3, [1]),
            entry(259, 3, [comp]), entry(262, 3, [1]),  # BlackIsZero
            entry(273, 4, [strip_off]), entry(277, 3, [1]),
            entry(278, 4, [6]), entry(279, 4, [len(strip)]),
        ]
        ifd_off = len(out)
        _s.pack_into("<I", out, 4, ifd_off)
        out += _s.pack("<H", len(entries))
        for e in sorted(e for e in entries):
            out += e
        out += b"\x00\x00\x00\x00"
        got = tiff.read_tiff_pages(bytes(out))[0]
        # PhotometricInterpretation 1: bit set (1) = 255
        np.testing.assert_array_equal(
            got, np.where(img, 255, 0).astype(np.uint8)
        )
