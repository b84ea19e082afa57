"""Evidence for SCALING.md's partitioning strategy: writing the fact table
bucketed by its join/group key removes the shuffle from the join — the
layout the 100 TB deployment would use for `frames` (bucket by
frames_global_id) and `lineitem` (bucket by orderkey).

Bucketed tables need a catalog (saveAsTable); the session-local in-memory
catalog + spark-warehouse dir is enough — no Hive metastore required."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(extended=False)
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed(spark):
    # saveAsTable writes under the session's static warehouse dir
    # (./spark-warehouse, gitignored); tables are dropped on teardown
    frames = spark.range(0, 10_000).select(
        F.col("id").alias("frame_id"),
        (F.col("id") % 100).alias("frames_global_id"),
        (F.col("id") % 7).cast("int").alias("channel_idx"),
    )
    fg = spark.range(0, 100).select(
        F.col("id").alias("frames_global_id"),
        F.concat(F.lit("ds-"), F.col("id")).alias("dataset_serial"),
    )
    for name, df in (("frames_b", frames), ("frames_global_b", fg)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "frames_global_id")
            .sortBy("frames_global_id")
            .format("parquet")
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield spark
    for name in ("frames_b", "frames_global_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


class TestBucketedLayout:
    def test_bucketed_join_has_no_shuffle(self, bucketed):
        """Both sides bucketed on the key -> SortMergeJoin with ZERO
        Exchange: the co-located join SCALING.md's table promises."""
        spark = bucketed
        # disable auto-broadcast so the join strategy itself is tested
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("frames_b").join(
                spark.table("frames_global_b"), "frames_global_id"
            )
            plan = _plan(joined)
            assert "Exchange" not in plan, plan
            assert joined.count() == 10_000
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )

    def test_bucketed_groupby_has_no_shuffle(self, bucketed):
        """Aggregation on the bucket key is map-side only — the A3/A4
        per-dataset summary with no Exchange."""
        agg = (
            bucketed.table("frames_b")
            .groupBy("frames_global_id")
            .agg(F.countDistinct("channel_idx").alias("n_channels"))
        )
        plan = _plan(agg)
        assert "Exchange" not in plan, plan
        assert agg.count() == 100

    def test_unbucketed_join_does_shuffle(self, bucketed):
        """Control: the same join over plain (un-bucketed) frames has an
        Exchange — proving the bucketing, not the optimizer, removed it."""
        spark = bucketed
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plain = spark.table("frames_b").repartition(8)  # strips bucketing info
            joined = plain.join(spark.table("frames_global_b"), "frames_global_id")
            assert "Exchange" in _plan(joined)
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )


class TestPartitionPruning:
    """SCALING.md's other layout claim: facts partitioned by a time bucket
    prune to the queried partitions — the filter must show up as a
    PartitionFilter (directory pruning), not just a row-group filter."""

    @pytest.fixture(scope="class")
    def partitioned_events(self, spark, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("events_part"))
        events = spark.range(0, 10_000).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 24).cast("int").alias("hour"),
            (F.col("id") % 5).cast("double").alias("value"),
        )
        events.write.partitionBy("hour").mode("overwrite").parquet(root)
        return root

    @staticmethod
    def _partition_filters(plan: str) -> str:
        import re

        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m is not None, plan
        return m.group(1)

    def test_hour_filter_becomes_partition_filter(self, spark, partitioned_events):
        df = spark.read.parquet(partitioned_events).filter(F.col("hour") == 3)
        # the hour predicate must be in the partition filters, meaning
        # non-matching directories are never opened
        assert "hour" in self._partition_filters(_plan(df))
        assert df.count() == 10_000 // 24 + (1 if 3 < 10_000 % 24 else 0)

    def test_unpartitioned_column_is_data_filter(self, spark, partitioned_events):
        df = spark.read.parquet(partitioned_events).filter(F.col("value") == 1.0)
        plan = _plan(df)
        assert "value" not in self._partition_filters(plan)  # can't prune dirs
        assert "PushedFilters: [IsNotNull(value), EqualTo(value,1.0)]" in plan
