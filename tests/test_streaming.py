"""Structured Streaming tests: drive the streaming jobs with the parquet
file source to a memory sink and check against their batch twins (the
unified-API guarantee SURVEY.md §2.9 relies on)."""

import pytest

from imagingdb_spark.operators import streaming_batch
from imagingdb_spark.streaming import jobs

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream(spark):
    return jobs.read_events_stream(spark, SF_DIR)


def stop_all(spark):
    for q in spark.streams.active:
        q.stop()


def test_tumbling_stream_matches_batch(spark, events_stream):
    try:
        q = jobs.run_to_memory(jobs.tumbling_counts(events_stream), "t_tumbling")
        got = spark.sql(
            "SELECT window_start, event_type, n_events, sum_value FROM t_tumbling"
        ).collect()
        want = streaming_batch.st_tumbling(spark, SF_DIR).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))
        q.stop()
    finally:
        stop_all(spark)


def test_session_stream_matches_batch(spark, events_stream):
    try:
        q = jobs.run_to_memory(jobs.session_aggregate(events_stream), "t_session")
        got = spark.sql(
            "SELECT user_id, session_start, n_events, sum_value FROM t_session"
        ).collect()
        want = streaming_batch.st_session(spark, SF_DIR).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))
        q.stop()
    finally:
        stop_all(spark)


def test_streaming_dedup_drops_in_horizon_dups(spark, events_stream):
    try:
        q = jobs.run_to_memory(jobs.streaming_dedup(events_stream), "t_dedup")
        n = spark.sql("SELECT count(*) AS n FROM t_dedup").collect()[0]["n"]
        # event_id is unique in the source, so dedup is a passthrough here;
        # the semantics (bounded state) are what this exercises
        assert n == 1000
        q.stop()
    finally:
        stop_all(spark)
