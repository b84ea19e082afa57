"""Batch twins of the Structured Streaming surface (SURVEY.md §2.9).

The reference has no streaming (S3 sync is an external daily batch —
README.md:14); the north star adds windowed aggregation over the `events`
table. Spark's time-window functions are IDENTICAL between batch and
streaming — ``imagingdb_spark.streaming.jobs`` wraps these same
aggregations in readStream/writeStream with watermarks; the batch forms
below are what the DuckDB oracle can check.

Scale: windowed aggregation shuffles on (window, key) — at 100 TB the
event-time column should also be the physical partition column so each
window touches few input partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imagingdb_spark.catalog import table
from imagingdb_spark.registry import query


@query(
    "st_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           round(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY window_start, event_type
    """,
)
def st_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window per event_type. Spark window() is epoch-aligned,
    matching time_bucket/date_trunc for whole-hour widths."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "st_sliding",
    oracle="""
    SELECT window_start, event_type,
           COUNT(*) AS n_events,
           round(SUM(value), 4) AS sum_value
    FROM (
      SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
               AS window_start,
             event_type, value
      FROM events
      CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)
    )
    GROUP BY window_start, event_type
    """,
)
def st_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour window every 15 minutes: each event lands in exactly 4
    overlapping windows (Spark expands the same way internally)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "st_session",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           round(SUM(value), 4) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def st_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap (session_window works
    in batch since Spark 3.2). Spark session semantics: an event at exactly
    prev_ts + gap starts a NEW session (window is [start, last_ts + gap)),
    hence the `>=` in the oracle's gap test. The oracle reconstructs
    sessions with the lag + cumulative-sum idiom."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


@query("st_anomaly")  # rows-only: order-dependent Welford state is not ANSI-SQL
def st_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.jobs.anomaly_counts: per-user running anomaly
    counter via applyInPandas (UDTF-shaped: one group in → one summary row
    out). Same order-dependent semantics — an event is anomalous relative to
    the running mean/stddev at its arrival time — which no built-in windowed
    aggregate expresses; the streaming form keeps the Welford triple in
    applyInPandasWithState state instead of recomputing per batch.

    Scale: shuffles once on user_id; per-group work is O(events-per-user)
    with Arrow batch transfer, state O(1) per user."""
    import pandas as pd

    z_threshold = 3.0

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        n, mean, m2, anomalies = 0, 0.0, 0.0, 0
        for v in pdf.sort_values("ts")["value"]:
            if n >= 2:
                std = (m2 / (n - 1)) ** 0.5
                if std > 0 and abs(v - mean) > z_threshold * std:
                    anomalies += 1
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)
        std = (m2 / (n - 1)) ** 0.5 if n >= 2 else 0.0
        return pd.DataFrame(
            [
                {
                    "user_id": int(pdf["user_id"].iloc[0]),
                    "n_events": n,
                    "mean": round(mean, 4),
                    "stddev": round(std, 4),
                    "anomalies": anomalies,
                }
            ]
        )

    e = table(spark, sf_dir, "events")
    return (
        e.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(
            summarize,
            schema="user_id BIGINT, n_events BIGINT, mean DOUBLE, "
            "stddev DOUBLE, anomalies BIGINT",
        )
    )
