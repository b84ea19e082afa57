"""Window-function operators (SURVEY.md §2.5).

The reference has no SQL window functions, but its dense-stack coordinate
computation (data_storage.py:232-238: position = rank of the sorted unique
index values, `np.where(unique_ids == row.slice_idx)`) is exactly
``dense_rank() over (partition by dataset order by idx) - 1``. Windows
shuffle once on the partition key and sort within partitions — at 100 TB
the partition key must be high-cardinality (it is: order/user/dataset) so
no single partition exceeds executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from imagingdb_spark.catalog import table
from imagingdb_spark.registry import query


@query(
    "w_dense_rank",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey,
           DENSE_RANK() OVER (PARTITION BY l_orderkey ORDER BY l_partkey) - 1
             AS stack_coord
    FROM lineitem
    """,
)
def w_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-of-unique-index → dense stack coordinate (data_storage.py:
    232-238). Non-contiguous, non-0-based raw indices map to contiguous
    coordinates by rank, which is why this is dense_rank and not the raw
    index (data_storage.py:49-55)."""
    w = Window.partitionBy("l_orderkey").orderBy("l_partkey")
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        (F.dense_rank().over(w) - 1).alias("stack_coord"),
    )


@query(
    "w_running",
    oracle="""
    SELECT user_id, event_id, ts,
           round(SUM(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
    FROM events
    """,
)
def w_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per user over time. event_id tiebreak makes the frame
    deterministic (ts collisions would otherwise make the prefix sum
    engine-dependent)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )


@query(
    "w_lag_lead",
    oracle="""
    SELECT user_id, event_id, ts,
           date_diff('second',
                     LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                     ts) AS secs_since_prev,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS next_event_type
    FROM events
    """,
)
def w_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead per user — inter-event gaps (feeds sessionization, st_session)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)).alias("secs_since_prev"),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


@query(
    "w_rownum_page",
    oracle="""
    SELECT o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
      FROM orders
    )
    WHERE rn BETWEEN 11 AND 20
    """,
)
def w_rownum_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: offset slicing `datasets[2:5]` (database_queries.ipynb cells 7/11)
    as row_number pagination.

    Scale shape: rn <= 20 means only the 20 globally-smallest keys matter, so
    take them with a distributed top-k (TakeOrderedAndProject — per-partition
    heaps, no global sort/shuffle) and only then window over that tiny set.
    A bare Window.orderBy would move the whole fact table to one partition."""
    w = Window.orderBy("o_orderkey")
    page_end = 20
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(page_end)
        .select("o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter((F.col("rn") >= 11) & (F.col("rn") <= page_end))
    )


@query(
    "w_topk_group",
    oracle="""
    SELECT n_nationkey, c_custkey, c_name, round(c_acctbal, 4) AS acctbal, rk
    FROM (
      SELECT n.n_nationkey, c.c_custkey, c.c_name, c.c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n.n_nationkey
                                ORDER BY c.c_acctbal DESC, c.c_custkey) AS rk
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    WHERE rk <= 3
    """,
)
def w_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (top-3 customers by balance per nation) — the
    north-star top-k pattern partitioned so it scales: rank within groups,
    never a global sort. c_custkey tiebreak keeps it deterministic."""
    cust = table(spark, sf_dir, "customer")
    nation = F.broadcast(table(spark, sf_dir, "nation"))
    w = Window.partitionBy("n_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .select(
            "n_nationkey",
            "c_custkey",
            "c_name",
            "c_acctbal",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
        .select(
            "n_nationkey",
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal"), 4).alias("acctbal"),
            "rk",
        )
    )


@query(
    "w_range_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS trailing_n,
           round(SUM(value) OVER w, 4) AS trailing_sum
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY epoch_us(ts)
      RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW
    )
    """,
)
def w_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 10-minute per-user aggregate via a RANGE window frame —
    time-based frames are value-bounded (all rows whose ts falls in
    [current-10min, current]), unlike the row-counted frames in w_running.
    The frame is keyed on epoch MICROS (unix_micros / epoch_us agree
    exactly across engines; whole-second keys would truncate differently).
    Range frames include ORDER BY peers, so ts ties need no tiebreaker —
    the frame is deterministic by construction. One shuffle on user_id,
    sort within partitions; user_id is high-cardinality so partitions
    stay bounded at scale."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-600_000_000, 0)
    )
    return table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("trailing_n"),
        F.round(F.sum("value").over(w), 4).alias("trailing_sum"),
    )


ZSCORE_LOOKBACK = 19  # trailing frame = current row + 19 preceding
ZSCORE_MIN_N = 5      # frames smaller than this give no score


@query(
    "x_rolling_zscore",
    oracle=f"""
    WITH q AS (
      SELECT event_id, user_id, ts,
             CAST(round(value * 100) AS BIGINT) AS vc
      FROM events
    ), w AS (
      SELECT event_id, user_id, vc,
             COUNT(*) OVER fr AS n,
             SUM(vc) OVER fr AS s1,
             SUM(vc * vc) OVER fr AS s2
      FROM q
      WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN {ZSCORE_LOOKBACK} PRECEDING AND CURRENT ROW)
    ), s AS (
      SELECT event_id, user_id, vc, n, s1,
             s1 / (n * 100.0) AS mu,
             (s2 / 10000.0 - (s1 / 100.0) * (s1 / 100.0) / n) / (n - 1) AS var
      FROM w WHERE n >= 2
    )
    SELECT s.event_id, s.user_id,
           CAST(n AS BIGINT) AS roll_n,
           floor(s1 * 100.0 / n + 0.5) / 10000.0 AS roll_mean,
           CASE WHEN n >= {ZSCORE_MIN_N} AND var > 0
                THEN floor((vc / 100.0 - mu) / sqrt(var) * 10000.0 + 0.5)
                     / 10000.0 END AS z,
           CASE WHEN n >= {ZSCORE_MIN_N} AND var > 0
                THEN abs((vc / 100.0 - mu) / sqrt(var)) > 2 END AS is_spike
    FROM s
    """,
)
def x_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling z-score over a trailing {ZSCORE_LOOKBACK}+1-row
    frame — the sliding-window anomaly signal (the ROWS-frame, exact
    sibling of st_anomaly's streaming Welford state and x_mad_outlier's
    global robust score). Rows with fewer than 2 frame rows are dropped;
    short or zero-variance frames yield NULL scores on both sides.

    Exactness contract: a naive AVG/STDDEV oracle FAILS here — DuckDB
    evaluates moving-frame aggregates with segment trees, so its
    floating-point summation ORDER differs from Spark's and the last-ulp
    difference flips 4-decimal rounding on real data (observed on this
    very query). The fix is integer frame state: value quantizes to
    BIGINT cents, the window carries only COUNT/SUM/SUM-of-squares —
    integer addition is associative, so segment-tree order cannot change
    them — and mean/variance derive from those exact integers with the
    SAME double expression on both engines (textually mirrored), making
    every emitted double bit-identical, not just close.

    Scale shape: ONE shuffle on user_id + an in-partition sort — the same
    single-exchange shape as w_running/w_range_frame; the ROWS frame is
    bounded (20 rows) so window state is O(frame), not O(partition)."""
    e = table(spark, sf_dir, "events")
    fr = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZSCORE_LOOKBACK, 0)
    )
    vc = F.round(F.col("value") * 100).cast("bigint")
    q = e.select("event_id", "user_id", "ts", vc.alias("vc"))
    w = q.select(
        "event_id",
        "user_id",
        "vc",
        F.count(F.lit(1)).over(fr).alias("n"),
        F.sum("vc").over(fr).alias("s1"),
        F.sum(F.col("vc") * F.col("vc")).over(fr).alias("s2"),
    ).filter(F.col("n") >= 2)
    mu = F.col("s1") / (F.col("n") * 100.0)
    var = (
        F.col("s2") / 10000.0
        - (F.col("s1") / 100.0) * (F.col("s1") / 100.0) / F.col("n")
    ) / (F.col("n") - 1)
    s = w.select(
        "event_id", "user_id", "vc", "n", "s1",
        mu.alias("mu"), var.alias("var"),
    )
    ok = (F.col("n") >= ZSCORE_MIN_N) & (F.col("var") > 0)
    z_raw = (F.col("vc") / 100.0 - F.col("mu")) / F.sqrt("var")
    # NOT F.round: Spark rounds the double's shortest DECIMAL repr (Java
    # BigDecimal) while DuckDB rounds the BINARY value, and cent-quantized
    # means hit exact .xxxx5 boundaries constantly — the two engines split
    # them. floor(x*1e4 + 0.5)/1e4 is half-up rounding with bit-identical
    # semantics everywhere, given bit-identical x (which the integer frame
    # state guarantees). Mirrored textually in the oracle.
    mean4 = F.floor(F.col("s1") * 100.0 / F.col("n") + 0.5) / 10000.0
    z4 = F.floor(z_raw * 10000.0 + 0.5) / 10000.0
    return s.select(
        "event_id",
        "user_id",
        F.col("n").cast("bigint").alias("roll_n"),
        mean4.alias("roll_mean"),
        F.when(ok, z4).alias("z"),
        F.when(ok, F.abs(z_raw) > 2).alias("is_spike"),
    )
