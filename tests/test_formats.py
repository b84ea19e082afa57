"""Multi-format table IO: every supported format round-trips the catalog
schema exactly, and the columnar formats (parquet, ORC) push predicates
into the scan — the property that makes them the 100 TB table formats
while CSV/JSON stay interchange-only."""

from __future__ import annotations

import contextlib
import io
from datetime import datetime

import pytest

from imagingdb_spark.catalog import DATA_SET_SCHEMA, read_table, write_table


ROWS = [
    (1, "AB-2024-01-02-03-04-05-0001", "d one", "scope1", True,
     datetime(2024, 1, 2, 3, 4, 5), None),
    (2, "CD-2024-02-02-03-04-05-0002", None, "scope2", False,
     datetime(2024, 2, 2, 3, 4, 5), 1),
]


@pytest.fixture()
def ds(spark):
    return spark.createDataFrame(ROWS, DATA_SET_SCHEMA)


class TestRoundTrip:
    @pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
    def test_round_trip(self, spark, ds, tmp_path, fmt):
        p = str(tmp_path / f"t_{fmt}")
        write_table(ds, p, fmt=fmt)
        back = read_table(spark, p, fmt=fmt, schema=DATA_SET_SCHEMA)
        # nullability does not survive a file round trip (Spark marks all
        # file columns nullable on read) — names and types must
        assert [(f.name, f.dataType) for f in back.schema] == [
            (f.name, f.dataType) for f in DATA_SET_SCHEMA
        ]
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, ds.collect())
        )

    def test_csv_requires_schema(self, spark, ds, tmp_path):
        p = str(tmp_path / "t_csv2")
        write_table(ds, p, fmt="csv")
        with pytest.raises(ValueError, match="explicit schema"):
            read_table(spark, p, fmt="csv")

    def test_unknown_format_rejected(self, spark, ds, tmp_path):
        with pytest.raises(ValueError, match="unsupported"):
            write_table(ds, str(tmp_path / "x"), fmt="avro")


class TestPushdown:
    @pytest.mark.parametrize("fmt", ["parquet", "orc"])
    def test_filter_reaches_scan(self, spark, ds, tmp_path, fmt):
        p = str(tmp_path / f"pd_{fmt}")
        write_table(ds, p, fmt=fmt)
        df = read_table(spark, p, fmt=fmt).filter("id = 2").select("id")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(extended=False)
        plan = buf.getvalue()
        assert "PushedFilters: [" in plan
        assert "IsNotNull(id)" in plan or "EqualTo(id,2" in plan, plan

    def test_partitioned_write_prunes(self, spark, ds, tmp_path):
        p = str(tmp_path / "part")
        write_table(ds, p, fmt="parquet", partition_by=["frames"])
        df = read_table(spark, p, fmt="parquet").filter("frames = true")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(extended=False)
        assert "PartitionFilters: [" in buf.getvalue()
