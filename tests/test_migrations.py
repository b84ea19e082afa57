"""Schema-evolution round-trips mirroring the reference's Alembic history
(alembic/versions/7a7422f19234, bae28d7da970, 8e0d2514fd1f): old-schema
table + new-schema appends must become ONE queryable view, logically
(read_evolved) and physically (migrate_in_place)."""

import os

import pytest
from pyspark.sql import functions as F

from imagingdb_spark import migrations as M


def _old_vintage(spark):
    """file_global rows written BEFORE any migration: s3_dir, no sha256,
    no file_name (the baseline-revision schema)."""
    return spark.createDataFrame(
        [(1, "raw/ds1", 100), (2, "raw/ds2", 200)],
        "id long, s3_dir string, total_bytes long",
    )


def _new_vintage(spark):
    """Rows written at head revision: storage_dir + sha256 + file_name."""
    return spark.createDataFrame(
        [(3, "raw/ds3", 300, "abc123", "ds3.tif")],
        "id long, storage_dir string, total_bytes long, "
        "sha256 string, file_name string",
    )


@pytest.fixture
def mixed_table(spark, tmp_path):
    path = str(tmp_path / "file_global")
    _old_vintage(spark).write.parquet(path)
    _new_vintage(spark).write.mode("append").parquet(path)
    return path


class TestReadEvolved:
    def test_mixed_vintage_one_view(self, spark, mixed_table):
        df = M.read_evolved(spark, mixed_table, M.FILE_GLOBAL_MIGRATIONS)
        assert sorted(df.columns) == [
            "file_name",
            "id",
            "sha256",
            "storage_dir",
            "total_bytes",
        ]
        rows = {r["id"]: r.asDict() for r in df.collect()}
        assert len(rows) == 3
        # rename preserved old values under the new name
        assert rows[1]["storage_dir"] == "raw/ds1"
        assert rows[3]["storage_dir"] == "raw/ds3"
        # added columns: null for pre-migration rows, real for new
        assert rows[1]["sha256"] is None and rows[1]["file_name"] is None
        assert rows[3]["sha256"] == "abc123" and rows[3]["file_name"] == "ds3.tif"

    def test_old_only_table(self, spark, tmp_path):
        """A table with ONLY baseline-vintage files still reads at head
        schema (add → null column, rename → plain rename)."""
        path = str(tmp_path / "fg_old")
        _old_vintage(spark).write.parquet(path)
        df = M.read_evolved(spark, path, M.FILE_GLOBAL_MIGRATIONS)
        assert "storage_dir" in df.columns and "s3_dir" not in df.columns
        assert df.filter(F.col("sha256").isNull()).count() == 2

    def test_add_column_default_backfills(self, spark, tmp_path):
        path = str(tmp_path / "t")
        spark.createDataFrame([(1,)], "id long").write.parquet(path)
        chain = [
            M.Migration("r1", None, "t", (M.AddColumn("state", "string", "ok"),))
        ]
        df = M.read_evolved(spark, path, chain)
        assert df.collect()[0]["state"] == "ok"

    def test_projection_folds_into_scan(self, spark, mixed_table):
        """The logical layer must stay a projection: no Exchange in the
        plan of a read_evolved + filter + select."""
        df = (
            M.read_evolved(spark, mixed_table, M.FILE_GLOBAL_MIGRATIONS)
            .filter(F.col("total_bytes") > 150)
            .select("id", "storage_dir")
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestMigrateInPlace:
    def test_round_trip(self, spark, mixed_table):
        out = M.migrate_in_place(spark, mixed_table, M.FILE_GLOBAL_MIGRATIONS)
        assert out["applied"] == [
            "7a7422f19234",
            "bae28d7da970",
            "8e0d2514fd1f",
        ]
        # a PLAIN read (no mergeSchema, no chain) now sees head schema
        df = spark.read.parquet(mixed_table)
        assert sorted(df.columns) == [
            "file_name",
            "id",
            "sha256",
            "storage_dir",
            "total_bytes",
        ]
        rows = {r["id"]: r.asDict() for r in df.collect()}
        assert rows[1]["storage_dir"] == "raw/ds1"
        assert rows[3]["sha256"] == "abc123"

    def test_idempotent(self, spark, mixed_table):
        M.migrate_in_place(spark, mixed_table, M.FILE_GLOBAL_MIGRATIONS)
        again = M.migrate_in_place(spark, mixed_table, M.FILE_GLOBAL_MIGRATIONS)
        assert again["applied"] == []
        assert M.applied_revisions(mixed_table) == [
            "7a7422f19234",
            "bae28d7da970",
            "8e0d2514fd1f",
        ]

    def test_sidecar_invisible_to_spark(self, spark, mixed_table):
        M.migrate_in_place(spark, mixed_table, M.FILE_GLOBAL_MIGRATIONS)
        assert os.path.exists(os.path.join(mixed_table, M.STATE_FILE))
        assert spark.read.parquet(mixed_table).count() == 3


class TestChainOrder:
    def test_orders_by_down_revision(self):
        shuffled = list(reversed(M.FILE_GLOBAL_MIGRATIONS))
        assert [m.revision for m in M._chain_order(shuffled)] == [
            "7a7422f19234",
            "bae28d7da970",
            "8e0d2514fd1f",
        ]

    def test_rejects_fork(self):
        a = M.Migration("a", None, "t")
        b = M.Migration("b", "a", "t")
        c = M.Migration("c", "a", "t")
        with pytest.raises(ValueError, match="fork"):
            M._chain_order([a, b, c])

    def test_rejects_gap(self):
        a = M.Migration("a", None, "t")
        c = M.Migration("c", "missing-b", "t")
        with pytest.raises(ValueError):
            M._chain_order([a, c])


class TestDowngrade:
    def test_full_downgrade_restores_baseline_schema(self, spark, mixed_table):
        df = M.read_evolved(spark, mixed_table, M.FILE_GLOBAL_MIGRATIONS)
        down = M.downgrade_df(df, M.FILE_GLOBAL_MIGRATIONS)
        assert sorted(down.columns) == ["id", "s3_dir", "total_bytes"]
        rows = {r["id"]: r["s3_dir"] for r in down.collect()}
        # the rename reverses losslessly — including rows written at head
        assert rows[1] == "raw/ds1" and rows[3] == "raw/ds3"

    def test_partial_downgrade(self, spark, mixed_table):
        df = M.read_evolved(spark, mixed_table, M.FILE_GLOBAL_MIGRATIONS)
        down = M.downgrade_df(
            df, M.FILE_GLOBAL_MIGRATIONS, to_revision="7a7422f19234"
        )
        # back to just-after-checksums: sha256 present, file_name gone,
        # rename reversed
        assert sorted(down.columns) == ["id", "s3_dir", "sha256", "total_bytes"]

    def test_unknown_revision_rejected(self, spark, mixed_table):
        df = M.read_evolved(spark, mixed_table, M.FILE_GLOBAL_MIGRATIONS)
        with pytest.raises(ValueError, match="unknown revision"):
            M.downgrade_df(df, M.FILE_GLOBAL_MIGRATIONS, to_revision="nope")

    def test_drop_column_not_invertible(self, spark, tmp_path):
        path = str(tmp_path / "t")
        spark.createDataFrame([(1, "x")], "id long, junk string").write.parquet(path)
        chain = [M.Migration("r1", None, "t", (M.DropColumn("junk"),))]
        df = M.read_evolved(spark, path, chain)
        with pytest.raises(ValueError, match="DropColumn"):
            M.downgrade_df(df, chain)
