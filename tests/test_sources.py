"""Filename-parser + TIFF-splitter tests mirroring the reference's cases
(tests/images/filename_parsers_tests.py) against the vectorized Spark
expressions, plus the mapInPandas splitter with a fake page reader."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from imagingdb_spark import sources


def one(spark, file_name, expr):
    df = spark.createDataFrame([(file_name,)], "file_name string")
    return df.select(expr.alias("r")).collect()[0]["r"]


class TestParseMlName:
    def test_basic(self, spark):
        # filename_parsers_tests.py::test_parse_ml_name
        r = one(
            spark,
            "/Volumes/MicroscopyData/p6A1_1_CTRL1_PyProcessed.tif",
            sources.parse_ml_name(F.col("file_name")),
        )
        assert (r["plate_id"], r["stack_nbr"], r["protein_name"]) == ("p6A1", 1, "CTRL1")
        assert r["valid"]

    def test_long_protein(self, spark):
        r = one(
            spark,
            "p6A1_5_FBXO9_Jin_G4_PyProcessed.tif",
            sources.parse_ml_name(F.col("file_name")),
        )
        assert (r["plate_id"], r["stack_nbr"], r["protein_name"]) == ("p6A1", 5, "FBXO9")

    def test_too_few_underscores_invalid(self, spark):
        # reference raises AssertionError; batch form flags the row
        r = one(
            spark,
            "/Volumes/MicroscopyData/p6A1_1CTRL1PyProcessed.tif",
            sources.parse_ml_name(F.col("file_name")),
        )
        assert not r["valid"]

    def test_nonint_stack_invalid(self, spark):
        r = one(
            spark, "p6A1_A_CTRL1_PyProcessed.tif", sources.parse_ml_name(F.col("file_name"))
        )
        assert not r["valid"]


class TestParseSmsName:
    def test_basic(self, spark):
        r = one(
            spark, "img_phase_t500_p400_z300.tif", sources.parse_sms_name(F.col("file_name"))
        )
        assert r["channel_name"] == "phase"
        assert (r["time_idx"], r["pos_idx"], r["slice_idx"]) == (500, 400, 300)

    def test_long_channel_extra_underscores(self, spark):
        r = one(
            spark,
            "img_long_c_name_t001_z002_p003.tif",
            sources.parse_sms_name(F.col("file_name")),
        )
        assert r["channel_name"] == "long_c_name"
        assert (r["time_idx"], r["pos_idx"], r["slice_idx"]) == (1, 3, 2)


class TestParseIdxFromName:
    def test_basic(self, spark):
        r = one(
            spark,
            "im_c600_z500_t400_p300.png",
            sources.parse_idx_from_name(F.col("file_name")),
        )
        assert r["channel_idx"] == 600 and r["channel_name"] == "600"
        assert (r["slice_idx"], r["time_idx"], r["pos_idx"]) == (500, 400, 300)
        assert r["valid"]

    def test_wrong_int_count_invalid(self, spark):
        r = one(
            spark,
            "img_phase_t500_p400_z300.tif",
            sources.parse_idx_from_name(F.col("file_name")),
        )
        assert not r["valid"]

    def test_custom_order(self, spark):
        r = one(
            spark,
            "im_t001_p002_c003_z004.png",
            sources.parse_idx_from_name(F.col("file_name"), order="tpcz"),
        )
        assert (r["time_idx"], r["pos_idx"], r["channel_idx"], r["slice_idx"]) == (
            1, 2, 3, 4,
        )

    def test_bad_order_rejected(self, spark):
        with pytest.raises(AssertionError):
            sources.parse_idx_from_name(F.col("file_name"), order="cczt")


class TestChannelIndexByFirstAppearance:
    def test_rank_follows_natsort_of_first_file(self, spark):
        rows = [
            ("im2_phase.tif", "phase"),
            ("im10_dapi.tif", "dapi"),
            ("im1_gfp.tif", "gfp"),
            ("im3_gfp.tif", "gfp"),
        ]
        df = spark.createDataFrame(rows, "file_name string, channel_name string")
        got = {
            r["channel_name"]: r["channel_idx"]
            for r in sources.channel_index_by_first_appearance(df).collect()
        }
        # natsort order of first files: im1_gfp < im2_phase < im10_dapi
        assert got == {"gfp": 0, "phase": 1, "dapi": 2}


class TestSplitTiffPages:
    def test_pages_become_rows_with_grid_indices(self, spark):
        # local closure: cloudpickle ships it by value (a module-level
        # function in tests/ would be imported by name on workers and fail)
        def fake_reader(payload):
            # deterministic fake: N pages of 4 bytes where N = payload[0]
            return [bytes([i] * 4) for i in range(payload[0])]

        df = spark.createDataFrame(
            [("f1.tif", bytes([12])), ("f2.tif", bytes([2]))],
            "path string, content binary",
        )
        got = sources.split_tiff_pages(
            df, page_reader=fake_reader, nbr_channels=2, nbr_slices=3,
            nbr_positions=2,
        ).collect()
        assert len(got) == 14
        by_key = {(r["file_path"], r["page_idx"]): r for r in got}
        # page 7 of f1: c = 7%2 = 1, z = (7//2)%3 = 0, p = (7//6)%2 = 1, t = 0
        r = by_key[("f1.tif", 7)]
        assert (r["channel_idx"], r["slice_idx"], r["pos_idx"], r["time_idx"]) == (
            1, 0, 1, 0,
        )
        assert r["payload"] == bytes([7] * 4)
        assert r["sha256"] == hashlib.sha256(bytes([7] * 4)).hexdigest()

    def test_default_reader_rejects_non_tiff(self, spark):
        # round 3: the default reader is the real TIFF codec; junk bytes
        # fail the header check (ValueError surfaces as PythonException)
        df = spark.createDataFrame([("f.tif", b"\x01")], "path string, content binary")
        with pytest.raises(Exception):
            sources.split_tiff_pages(df).collect()

    def test_default_reader_splits_real_tiff(self, spark):
        from imagingdb_spark import png, tiff

        rng2 = np.random.default_rng(3)
        pages = [
            rng2.integers(0, 65535, size=(6, 5), endpoint=True).astype(np.uint16)
            for _ in range(4)
        ]
        df = spark.createDataFrame(
            [("stack.tif", tiff.write_tiff(pages))], "path string, content binary"
        )
        got = sorted(
            sources.split_tiff_pages(df, nbr_channels=2, nbr_slices=2).collect(),
            key=lambda r: r["page_idx"],
        )
        assert len(got) == 4
        for i, r in enumerate(got):
            np.testing.assert_array_equal(
                png.decode_png(bytes(r["payload"])), pages[i]
            )
            assert r["sha256"] == hashlib.sha256(bytes(r["payload"])).hexdigest()

    def test_default_reader_splits_jpeg_compressed_tiff(self, spark):
        """A baseline-JPEG-compressed stack (TIFF Compression 7) clears
        the DEFAULT reader end-to-end — the input class that previously
        required an injected tifffile-backed page_reader. Lossy codec:
        compare decoded frames within the q95 bound."""
        from imagingdb_spark import png, tiff

        rng2 = np.random.default_rng(5)
        k = np.ones(5) / 5
        pages = []
        for _ in range(4):
            a = rng2.integers(0, 256, size=(24, 16)).astype("float64")
            a = np.apply_along_axis(
                lambda x: np.convolve(x, k, mode="same"), 0, a
            )
            pages.append(
                np.apply_along_axis(
                    lambda x: np.convolve(x, k, mode="same"), 1, a
                ).astype("uint8")
            )
        df = spark.createDataFrame(
            [("stack.tif", tiff.write_tiff(pages, compression="jpeg"))],
            "path string, content binary",
        )
        got = sorted(
            sources.split_tiff_pages(df, nbr_channels=2, nbr_slices=2).collect(),
            key=lambda r: r["page_idx"],
        )
        assert len(got) == 4
        for i, r in enumerate(got):
            frame = png.decode_png(bytes(r["payload"]))
            assert frame.shape == pages[i].shape
            assert (
                int(np.abs(frame.astype(int) - pages[i].astype(int)).max())
                <= 8
            )

    def test_grid_indices_expression_matches_python(self, spark):
        df = spark.range(12).select(F.col("id").cast("int").alias("page"))
        got = df.select(
            "page",
            sources.grid_indices(F.col("page"), F.lit(2), F.lit(3), F.lit(2)).alias("g"),
        ).collect()
        for r in got:
            i = r["page"]
            assert r["g"]["channel_idx"] == i % 2
            assert r["g"]["slice_idx"] == (i // 2) % 3
            assert r["g"]["pos_idx"] == (i // 6) % 2
            assert r["g"]["time_idx"] == i // 12


class TestSplitCompressedTiff:
    def test_lzw_stack_through_default_reader(self, spark):
        """An LZW-compressed multi-page stack splits through the DEFAULT
        page reader end-to-end — frames decode to the same PNG payloads
        as the uncompressed stack."""
        import numpy as np

        from imagingdb_spark import tiff

        rng = np.random.default_rng(23)
        pages = [
            rng.integers(0, 255, size=(6, 5), endpoint=True).astype(np.uint8)
            for _ in range(4)
        ]
        plain = tiff.write_tiff(pages)
        lzw = tiff.write_tiff(pages, compression="lzw")
        df = spark.createDataFrame(
            [("plain.tif", plain), ("lzw.tif", lzw)],
            "path string, content binary",
        )
        got = sources.split_tiff_pages(df, nbr_channels=2, nbr_slices=2).collect()
        assert len(got) == 8
        by = {}
        for r in got:
            by.setdefault(r["file_path"], {})[r["page_idx"]] = r["payload"]
        assert by["plain.tif"] == by["lzw.tif"]
