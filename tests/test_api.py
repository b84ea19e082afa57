"""Imaging-domain API tests — the query-and-assert paths the reference's own
DB tests cover (tests/database/db_operations_tests.py:100-136 filters,
172-226 joins, 290-343 subset polymorphism + error types)."""

import pytest
from pyspark.sql import functions as F

from imagingdb_spark import api


def serials(df):
    return [r["dataset_serial"] for r in df.select("dataset_serial").collect()]


class TestGetDatasets:
    def test_no_filters_returns_all_sorted(self, imaging):
        got = serials(api.get_datasets(imaging["data_set"]))
        assert got == sorted(got) and len(got) == 4

    def test_substring_filters(self, imaging):
        got = api.get_datasets(imaging["data_set"], {"dataset_serial": "MEOW"})
        assert serials(got) == ["MEOW-2006-01-01-08-00-00-0001"]
        got = api.get_datasets(imaging["data_set"], {"microscope": "scope2"})
        assert len(got.collect()) == 2
        got = api.get_datasets(imaging["data_set"], {"description": "dataset test"})
        assert len(got.collect()) == 2

    def test_date_range_inclusive(self, imaging):
        got = api.get_datasets(
            imaging["data_set"],
            {"start_date": "2005-10-09 20:00:00", "end_date": "2005-10-12 20:00:00"},
        )
        assert len(got.collect()) == 3  # both endpoints included

    def test_frames_flag(self, imaging):
        got = api.get_datasets(imaging["data_set"], {"frames": False})
        assert serials(got) == ["TEST-2005-10-12-20-00-00-0002"]


class TestUniqueness:
    def test_existing_serial_raises(self, imaging):
        with pytest.raises(AssertionError, match="already exists"):
            api.assert_unique_id(imaging["data_set"], "MEOW-2006-01-01-08-00-00-0001")

    def test_new_serial_passes(self, imaging):
        api.assert_unique_id(imaging["data_set"], "NEW-2020-01-01-00-00-00-0001")


class TestFramesMeta:
    def test_three_way_join_shape(self, imaging):
        fm = api.get_frames_meta(
            imaging["data_set"], imaging["frames_global"], imaging["frames"],
            "TEST-2005-10-09-20-00-00-0001",
        )
        rows = fm.collect()
        assert len(rows) == 6
        assert fm.columns == api.FRAMES_META_COLS  # ids dropped
        names = [r["file_name"] for r in rows]
        assert names == sorted(names)  # ordered by file_name

    def test_subset_channels_by_name(self, imaging):
        fm = api.get_frames_meta(
            imaging["data_set"], imaging["frames_global"], imaging["frames"],
            "TEST-2005-10-09-20-00-00-0001",
        )
        sub = api.select_frames_subset(fm, channels=["phase", "405"])
        assert {r["channel_name"] for r in sub.collect()} == {"phase", "405"}

    def test_subset_channels_by_idx_and_slices(self, imaging):
        fm = api.get_frames_meta(
            imaging["data_set"], imaging["frames_global"], imaging["frames"],
            "TEST-2005-10-09-20-00-00-0001",
        )
        sub = api.select_frames_subset(fm, channels=[0, 1], slices=[5])
        rows = sub.collect()
        assert len(rows) == 2
        assert all(r["slice_idx"] == 5 for r in rows)

    def test_subset_mixed_channels_type_error(self, imaging):
        fm = imaging["frames"]
        with pytest.raises(TypeError, match="all str .* or all int"):
            api.select_frames_subset(fm, channels=["phase", 1])

    def test_subset_is_subset_property(self, imaging):
        fm = api.get_frames_meta(
            imaging["data_set"], imaging["frames_global"], imaging["frames"],
            "TEST-2005-10-09-20-00-00-0001",
        )
        full = {tuple(r) for r in fm.collect()}
        sub = {tuple(r) for r in api.select_frames_subset(fm, slices=[6]).collect()}
        assert sub <= full and 0 < len(sub) < len(full)


class TestGlobalMeta:
    def test_computed_matches_stored(self, imaging):
        computed = api.compute_global_meta(imaging["frames"])
        joined = computed.join(
            imaging["frames_global"],
            computed.frames_global_id == imaging["frames_global"].id,
        )
        for r in joined.collect():
            assert r["nbr_frames"] == 6
            assert r["nbr_slices"] == 2 and r["nbr_channels"] == 3
            assert r["nbr_timepoints"] == 1 and r["nbr_positions"] == 1

    def test_get_global_meta_single_row(self, imaging):
        gm = api.get_global_meta(
            imaging["data_set"], imaging["frames_global"],
            "TEST-2005-10-09-20-00-00-0001",
        )
        rows = gm.collect()
        assert len(rows) == 1 and rows[0]["nbr_frames"] == 6


class TestStackCoordinates:
    def test_rank_not_raw_index(self, imaging):
        coords = api.stack_coordinates(imaging["frames"])
        rows = coords.filter(F.col("frames_global_id") == 1).collect()
        # slices are 5,6 (non-0-based) -> coords 0,1 by rank
        assert {r["slice_coord"] for r in rows} == {0, 1}
        assert {r["time_coord"] for r in rows} == {0}
        by_slice = {r["slice_idx"]: r["slice_coord"] for r in rows}
        assert by_slice == {5: 0, 6: 1}

    def test_shape_inference_squeezes_singletons(self, imaging):
        fm = imaging["frames"].filter(F.col("frames_global_id") == 1)
        shape = api.infer_stack_shape(fm, im_height=256, im_width=512, im_colors=1)
        # X=256,Y=512 kept; G=1 dropped; Z=2,C=3 kept; T=P=1 dropped
        assert shape.dim_order == "XYZC"
        assert shape.shape == (256, 512, 2, 3)


class TestSerialValidation:
    def test_valid_and_invalid(self, spark):
        df = spark.createDataFrame(
            [("ISP-2005-06-09-20-00-00-0001",),   # valid (reference README:24)
             ("ISP-2005-13-09-20-00-00-0001",),   # month 13
             ("no-dashes",),
             ("ISP-2005-06-09-20-00-00",)],       # 7 fields
            "serial string",
        )
        got = df.select("serial", api.validate_serial(F.col("serial")).alias("ok")).collect()
        assert [r["ok"] for r in got] == [True, False, False, False]

    def test_derived_date_time(self, spark):
        df = spark.createDataFrame([("ISP-2005-06-09-20-50-00-0001",)], "serial string")
        got = df.select(api.serial_to_date_time(F.col("serial")).alias("dt")).collect()
        assert str(got[0]["dt"]) == "2005-06-09 20:50:00"
