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
    counter (UDTF-shaped: one user in → one summary row out). Same
    order-dependent semantics — an event is anomalous relative to the
    running mean/stddev at its arrival time — which no built-in windowed
    aggregate expresses; the streaming form keeps the Welford triple in
    applyInPandasWithState state instead of recomputing per batch.

    Shape: repartition(user_id) + sortWithinPartitions + mapInPandas, with
    the whole partition processed as ONE pandas groupby of vectorized
    exclusive prefix sums — per-user applyInPandas was dominated by the
    ~per-group Python/DataFrame-construction overhead (1500 groups: 4.2 s;
    this shape: ~1 s at sf0.1). Hash partitioning guarantees every user’s
    rows land in exactly one partition; the per-partition concat bounds
    memory at (users-per-partition × events-per-user) — scale partitions
    up, not batch size.

    Scale: one shuffle on user_id; Python work is O(rows) fully vectorized."""
    from typing import Iterator

    import pandas as pd

    z_threshold = 3.0

    def summarize_partition(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # The "running mean/std BEFORE each event" is reconstructed from
        # per-user EXCLUSIVE prefix sums (s1, s2) — numerically equivalent
        # to a Welford pass at these magnitudes, and vectorized across all
        # users in the partition at once (pandas groupby cumsum).
        import numpy as np

        batches = list(it)
        if not batches:
            return
        df = pd.concat(batches, ignore_index=True)
        # rows arrive sorted by (user_id, ts) via sortWithinPartitions;
        # groupby(sort=False) preserves that order
        v = df["value"].to_numpy(dtype=np.float64)
        v2 = v * v
        g = df.groupby("user_id", sort=False)
        n_b = g.cumcount().to_numpy(dtype=np.float64)  # count BEFORE event
        c1 = df.assign(x=v).groupby("user_id", sort=False)["x"].cumsum().to_numpy() - v
        c2 = df.assign(x=v2).groupby("user_id", sort=False)["x"].cumsum().to_numpy() - v2
        denom = np.maximum(n_b, 1.0)
        mean_b = c1 / denom
        m2_b = np.maximum(c2 - c1 * c1 / denom, 0.0)
        std_b = np.sqrt(m2_b / np.maximum(n_b - 1.0, 1.0))
        hit = (n_b >= 2) & (std_b > 0) & (np.abs(v - mean_b) > z_threshold * std_b)
        out = (
            df.assign(v=v, v2=v2, hit=hit)
            .groupby("user_id", sort=False)
            .agg(n_events=("v", "size"), s1=("v", "sum"), s2=("v2", "sum"),
                 anomalies=("hit", "sum"))
            .reset_index()
        )
        n = out["n_events"].to_numpy(dtype=np.float64)
        s1 = out["s1"].to_numpy()
        s2 = out["s2"].to_numpy()
        mean = s1 / n
        m2 = np.maximum(s2 - s1 * s1 / n, 0.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            std = np.where(n >= 2, np.sqrt(m2 / np.maximum(n - 1.0, 1.0)), 0.0)
        yield pd.DataFrame(
            {
                "user_id": out["user_id"].astype("int64"),
                "n_events": out["n_events"].astype("int64"),
                "mean": np.round(mean, 4),
                "stddev": np.round(std, 4),
                "anomalies": out["anomalies"].astype("int64"),
            }
        )

    e = table(spark, sf_dir, "events")
    npart = spark.sparkContext.defaultParallelism
    return (
        e.select("user_id", "ts", "value")
        .repartition(npart, "user_id")
        .sortWithinPartitions("user_id", "ts")
        .mapInPandas(
            summarize_partition,
            schema="user_id BIGINT, n_events BIGINT, mean DOUBLE, "
            "stddev DOUBLE, anomalies BIGINT",
        )
    )


@query(
    "st_join",
    oracle="""
    SELECT v.event_id AS view_id,
           p.event_id AS purchase_id,
           v.user_id,
           CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS lag_seconds
    FROM events v
    JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view'
     AND p.event_type = 'purchase'
     AND p.ts > v.ts
     AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
)
def st_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream join (view→purchase attribution):
    each view matched to same-user purchases within the following 30
    minutes. Equi-key (user_id) first so the physical plan is a hash/merge
    join with the time range as a residual — never a cartesian; the
    streaming form (streaming/jobs.py::attribution_join) uses the same
    predicate with watermarks bounding both sides' state."""
    e = table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("v_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    return (
        v.join(p, "user_id")
        .filter(
            (F.col("p_ts") > F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("interval 30 minutes"))
        )
        .select(
            "view_id",
            "purchase_id",
            "user_id",
            (F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts")).alias(
                "lag_seconds"
            ),
        )
    )


@query(
    "x_gapfill",
    oracle="""
    WITH hourly AS (
      SELECT user_id, h, value FROM (
        SELECT user_id, date_trunc('hour', ts) AS h, value,
               row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1
    ),
    grid AS (
      SELECT user_id,
             unnest(generate_series(hmin, hmax, INTERVAL 1 HOUR)) AS hour_ts
      FROM (SELECT user_id, min(h) AS hmin, max(h) AS hmax
            FROM hourly GROUP BY user_id)
    )
    SELECT g.user_id, g.hour_ts,
           round(o.value, 4) AS filled_value,
           (o.h < g.hour_ts) AS is_gap
    FROM grid g
    ASOF JOIN hourly o ON g.user_id = o.user_id AND g.hour_ts >= o.h
    """,
)
def x_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap fill (the hypertable-rollup family): per
    user, a DENSE 1-hour grid from first to last observed hour, each slot
    carrying the most recent observed value (forward fill) and an is_gap
    flag for slots with no observation of their own.

    Shape: (1) last observation per (user, hour) via a partitioned
    row_number — deterministic under ts ties by event_id; (2) per-user
    [min, max] hour bounds → sequence() + explode builds the grid WITHOUT
    a cross join against a calendar table; (3) left join grid↔hourly on
    (user, hour) and forward-fill the matched row (struct) over the hour
    order. Every step shuffles on user_id (high cardinality); the grid is
    bounded by each user's own time span, so a 100 TB corpus with short-
    lived users never explodes. The oracle states the same semantics with
    DuckDB's native ASOF JOIN: forward fill IS an as-of match against the
    hourly lasts (same union+window trick as j_asof, here a plain left
    join because grid and observations share hour keys).

    Fill/flag semantics (round-3 fix, ADVICE r2): the join-miss itself —
    not value nullability — decides is_gap, and the fill carries the last
    MATCHED row's value via a forward-filled struct. A NULL-valued
    observation therefore fills NULL forward (exactly what the oracle's
    ASOF match does) instead of being skipped by last(ignorenulls) on the
    raw value column, and its own slot is is_gap=false."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    by_hour = e.select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
        "value",
        "ts",
        "event_id",
    )
    # ONE user_id exchange end to end (r11, guide §2.4): sort each user by
    # (hour asc, recency desc) so the FIRST row of every hour group is that
    # hour's last observation (lag-based group-edge test replaces the
    # (user, hour)-partitioned row_number — no second exchange), then
    # lead() finds the next observed hour and sequence() expands each
    # observation over its own fill range [obs, next). The dense grid,
    # the grid↔hourly join and the forward-fill window all disappear:
    # forward fill IS "each slot in [obs, next) carries obs.value".
    # Range semantics match the old grid exactly — the grid spanned
    # [min, max] per user, every slot ≥ its user's first observation, and
    # the last observation contributes only its own slot.
    w_user = Window.partitionBy("user_id").orderBy(
        F.col("hour_ts").asc(), F.col("ts").desc(), F.col("event_id").desc()
    )
    hourly = (
        by_hour.withColumn("__prev_h", F.lag("hour_ts").over(w_user))
        .filter(
            F.col("__prev_h").isNull()
            | (F.col("__prev_h") != F.col("hour_ts"))
        )
        .select("user_id", "hour_ts", "value", "ts", "event_id")
    )
    # same partitioning and ordering as w_user: the filter preserves both,
    # so this second Window stacks on the first without a new exchange
    nxt_h = F.lead("hour_ts").over(w_user)
    return (
        hourly.withColumn("__next_h", nxt_h)
        .select(
            "user_id",
            F.col("hour_ts").alias("__obs_h"),
            "value",
            F.explode(
                F.sequence(
                    "hour_ts",
                    F.coalesce(
                        F.col("__next_h") - F.expr("INTERVAL 1 HOUR"),
                        F.col("hour_ts"),
                    ),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("hour_ts"),
        )
        .select(
            "user_id",
            "hour_ts",
            F.round("value", 4).alias("filled_value"),
            (F.col("hour_ts") != F.col("__obs_h")).alias("is_gap"),
        )
    )


SESSIONIZE_GAP_S = 1800  # 30-minute inactivity gap, matching st_session


@query(
    "x_sessionize",
    oracle=f"""
    WITH g AS (
      SELECT event_id, user_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    ), f AS (
      SELECT event_id, user_id, ts,
             CASE WHEN prev_ts IS NULL
                    OR epoch_us(ts) - epoch_us(prev_ts)
                       >= {SESSIONIZE_GAP_S} * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM g
    )
    SELECT event_id, user_id,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS session_idx
    FROM f
    """,
)
def x_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EVENT session assignment — the row-level twin of st_session's
    per-session aggregates: every event gets its user's running session
    index (1-based), computed with the lag + cumulative-sum idiom. The
    gap test is `>=` on exact epoch micros, matching Spark's
    session_window boundary semantics (an event at exactly prev + gap
    opens a NEW session), so the two views of sessionization agree.

    This is the assignment a feature pipeline joins ON — aggregates alone
    can't tag the original events with their session.

    Scale shape: ONE exchange on user_id shared by both stacked windows
    (lag, then running sum — same partitioning AND same ordering, so
    Catalyst plans a single sort); integer state only, exact on both
    engines. The streaming twin is session_window + flatMapGroupsWithState
    at the cost of holding open-session state; batch recomputation is the
    cheaper shape for backfills."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.unix_micros(F.col("ts"))).over(w)
    is_new = F.when(
        prev.isNull()
        | (F.unix_micros(F.col("ts")) - prev >= SESSIONIZE_GAP_S * 1_000_000),
        1,
    ).otherwise(0)
    return (
        e.select("event_id", "user_id", "ts", is_new.alias("is_new"))
        .select(
            "event_id",
            "user_id",
            F.sum("is_new")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("bigint")
            .alias("session_idx"),
        )
    )


TREND_K = 3  # event types reported per sliding window


@query(
    "st_topk_trend",
    oracle=f"""
    WITH counts AS (
      SELECT window_start, event_type, COUNT(*) AS n_events
      FROM (
        SELECT time_bucket(INTERVAL '15 minutes', ts)
                 - k * INTERVAL '15 minutes' AS window_start,
               event_type
        FROM events
        CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)
      )
      GROUP BY window_start, event_type
    )
    SELECT window_start, event_type, n_events, rk FROM (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY window_start
               ORDER BY n_events DESC, event_type
             ) AS BIGINT) AS rk
      FROM counts
    ) WHERE rk <= {TREND_K}
    """,
)
def st_topk_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending items: top-{TREND_K} event types per sliding 1-hour window
    (15-minute slide) — the "what's hot right now" dashboard query.
    Deterministic tiebreak (count DESC, then event_type) so the result is
    engine-independent.

    Scale shape: the window expansion is map-side (each event lands in
    exactly 4 windows); counting is one map-side-combined groupBy on
    (window, type); ranking shuffles only the COUNTS (windows ×
    active-types rows, corpus-size-independent) — so the per-group sort
    behind row_number is over the type cardinality, never over events.
    The streaming twin is the same agg under `readStream` with a
    watermark, emitting per-window top-k on window close; at 100 TB/day
    the count frame is small enough that the rank stage is a single
    executor's work regardless of input volume."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    counts = e.groupBy(
        F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("w").orderBy(F.desc("n_events"), "event_type")
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= TREND_K)
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "rk",
        )
    )


@query(
    "x_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ), pairs AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
           round(n / SUM(n) OVER (PARTITION BY prev_type), 4) AS p
    FROM pairs
    """,
)
def x_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next event type | previous event type) — the user-behavior model
    behind next-action prediction, anomaly scoring (improbable
    transitions), and funnel design. Deterministic sequence order via the
    (ts, event_id) tiebreak.

    Scale shape: ONE shuffle on user_id for the lag window (sequences are
    per-user state), then a map-side-combined groupBy whose output is
    |event types|² rows — the probability-normalizing window runs over
    that tiny matrix, never over events. The classic two-phase shape:
    heavy work partitioned by entity, statistics finished on the
    cardinality-bounded result."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wp = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wp), 4).alias("p"),
    )


@query(
    "x_interp_linear",
    oracle="""
    WITH hourly AS (
      SELECT user_id, hour_ts, value FROM (
        SELECT user_id, date_trunc('hour', ts) AS hour_ts, value,
               row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ), bounds AS (
      SELECT user_id, MIN(hour_ts) AS hmin, MAX(hour_ts) AS hmax
      FROM hourly GROUP BY user_id
    ), grid AS (
      SELECT user_id,
             unnest(generate_series(hmin, hmax, INTERVAL 1 HOUR)) AS hour_ts
      FROM bounds
    ), j AS (
      SELECT g.user_id, g.hour_ts,
             CASE WHEN o.user_id IS NOT NULL
                  THEN {'h': g.hour_ts, 'v': o.value} END AS m
      FROM grid g LEFT JOIN hourly o
        ON g.user_id = o.user_id AND g.hour_ts = o.hour_ts
    ), f AS (
      SELECT user_id, hour_ts, m,
             last_value(m IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY hour_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
             first_value(m IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY hour_ts
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
      FROM j
    )
    SELECT user_id, hour_ts,
           -- floor(x*1e4 + 0.5)/1e4, NOT round(): Spark's round() works on
           -- the double's shortest decimal repr while DuckDB rounds the
           -- binary double, and interpolation halves LAND on .xxxx5
           -- boundaries constantly (same fix as x_rolling_zscore)
           floor(CASE
             WHEN nxt IS NULL THEN prev.v
             WHEN prev.h = nxt.h THEN prev.v
             ELSE prev.v + (nxt.v - prev.v)
                  * (date_diff('hour', prev.h, hour_ts)
                     / CAST(date_diff('hour', prev.h, nxt.h) AS DOUBLE))
           END * 10000.0 + 0.5) / 10000.0 AS value_interp,
           (m IS NULL) AS is_gap
    FROM f
    """,
)
def x_interp_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the dense per-user hour grid — the
    `interpolate()` sibling of x_gapfill's forward fill (the hypertable
    rollup pair every time-series store exposes): each gap slot gets the
    straight line between its surrounding observations, slots past the
    last observation carry it forward, observed slots pass through
    exactly (prev == next collapses the formula to the observed value).

    Shape: IDENTICAL exchange profile to x_gapfill — per-(user, hour)
    last-observation window, sequence()-built grid (bounded by each
    user's own span), one left join, then TWO frames over the same
    user_id partitioning (forward last-match, backward first-match; one
    exchange feeds both since key and ordering agree). The interpolation
    fraction is a ratio of INTEGER hour distances — both engines compute
    the same small-int division, then the same textual fma — so rounding
    at 4 decimals is engine-stable like every float contract in the
    registry. NULL-valued observations interpolate to NULL between their
    neighbors' span (arithmetic with NULL propagates on both engines)."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    by_hour = e.select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
        "value",
        "ts",
        "event_id",
    )
    # ONE user_id exchange end to end — the x_gapfill r11 restructure
    # (see there): lag-based per-hour dedup, then lead() hands each
    # observation its successor (hour, value), and sequence() expands the
    # fill range [obs, next). Between two observations, prev IS the range
    # owner and nxt IS its lead — the forward/backward ignore-nulls frame
    # pair collapses to per-row arithmetic; the dense grid, the join and
    # both fill windows disappear. The observed slot itself passes
    # through exactly (frac = 0 ⇒ prev.v); the last observation (lead
    # NULL) contributes only its own slot, matching the old grid's
    # [min, max] span.
    w_user = Window.partitionBy("user_id").orderBy(
        F.col("hour_ts").asc(), F.col("ts").desc(), F.col("event_id").desc()
    )
    hourly = (
        by_hour.withColumn("__prev_h", F.lag("hour_ts").over(w_user))
        .filter(
            F.col("__prev_h").isNull()
            | (F.col("__prev_h") != F.col("hour_ts"))
        )
        .select("user_id", "hour_ts", "value", "ts", "event_id")
    )
    expanded = (
        hourly.withColumn("__next_h", F.lead("hour_ts").over(w_user))
        .withColumn("__next_v", F.lead("value").over(w_user))
        .select(
            "user_id",
            F.col("hour_ts").alias("__obs_h"),
            F.col("value").alias("__obs_v"),
            "__next_h",
            "__next_v",
            F.explode(
                F.sequence(
                    "hour_ts",
                    F.coalesce(
                        F.col("__next_h") - F.expr("INTERVAL 1 HOUR"),
                        F.col("hour_ts"),
                    ),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("hour_ts"),
        )
    )
    hours = lambda a, b: (  # noqa: E731
        F.unix_timestamp(b) - F.unix_timestamp(a)
    ) / 3600
    # identical arithmetic to the pre-r11 join shape: prev := the range's
    # observation, nxt := its lead — same expression tree, same floats
    frac = hours(F.col("__obs_h"), F.col("hour_ts")) / hours(
        F.col("__obs_h"), F.col("__next_h")
    ).cast("double")
    val = (
        F.when(F.col("hour_ts") == F.col("__obs_h"), F.col("__obs_v"))
        .when(F.col("__next_h").isNull(), F.col("__obs_v"))
        .otherwise(
            F.col("__obs_v") + (F.col("__next_v") - F.col("__obs_v")) * frac
        )
    )
    return expanded.select(
        "user_id",
        "hour_ts",
        # floor-based 4-decimal quantization — F.round would round the
        # shortest decimal repr and disagree with DuckDB at the .xxxx5
        # boundaries interpolation halves produce (see oracle comment)
        (F.floor(val * 10000.0 + 0.5) / 10000.0).alias("value_interp"),
        (F.col("hour_ts") != F.col("__obs_h")).alias("is_gap"),
    )
