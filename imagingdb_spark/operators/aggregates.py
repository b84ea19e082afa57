"""Aggregation operators (SURVEY.md §2.4, A1-A5 + rollup/cube/sum-avg).

The reference's only real aggregation is the imperative per-dataset global
metadata computation (file_splitter.py:127-148): counts + countDistinct of
each index dimension + frame-shape constants. That is exactly
``groupBy(dataset).agg(...)`` — Spark executes it as partial (map-side)
aggregation + final aggregation after a shuffle on the group key, which is
the scalable shape: the shuffle carries one row per (partition, group), not
one per input row.
"""

from __future__ import annotations

import pandas as pd  # module-level so stringified UDAF hints resolve

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from imagingdb_spark.catalog import table
from imagingdb_spark.registry import query


@query("a_count", oracle="SELECT COUNT(*) AS n_rows FROM lineitem")
def a_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: COUNT (query_data.py:95). Parquet count uses footer row counts —
    no data pages are read."""
    return table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


@query(
    "a_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def a_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: DISTINCT over low-cardinality columns (unique channel_name —
    database_queries.ipynb cell 17). Partial-agg dedups map-side first, so
    the shuffle moves at most (distinct values x partitions) rows."""
    return table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "a_count_distinct",
    oracle="""
    SELECT l_orderkey,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def a_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: per-group COUNT DISTINCT — `nbr_slices = len(np.unique(slice_idx))`
    per dataset (file_splitter.py:143-146, data_storage.py:50-55). Exact
    countDistinct (Spark expands then de-dups); for 100 TB dashboards the
    approx_count_distinct variant trades ~2% error for one fewer expand."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "a_group_summary",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           round(MIN(o_totalprice), 4) AS min_price,
           round(MAX(o_totalprice), 4) AS max_price,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def a_group_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+A5: the per-dataset global-metadata summary (file_splitter.py:
    127-148) — counts, distincts, min/max guards (tif_id_splitter.py:154) —
    as one grouped aggregation."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.min("o_totalprice"), 4).alias("min_price"),
            F.round(F.max("o_totalprice"), 4).alias("max_price"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
    )


@query(
    "a_sum_avg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(SUM(l_quantity), 2) AS sum_qty,
           round(SUM(l_extendedprice), 2) AS sum_base_price,
           round(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(AVG(l_quantity), 4) AS avg_qty,
           round(AVG(l_extendedprice), 4) AS avg_price,
           round(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a_sum_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (pricing summary report): the canonical scan-heavy
    partial+final aggregation. Groups are tiny (≤6) so virtually all
    reduction happens map-side; whole-stage codegen covers scan→project→
    partial agg in one generated loop."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "a_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(SUM(l_quantity), 2) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals — not in the reference (SURVEY §2.4 'to add').
    Spark expands the rollup into grouping sets before the shuffle; one pass."""
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "a_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           round(SUM(o_totalprice), 2) AS sum_price,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def a_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping-set combinations (SURVEY §2.4 'to add')."""
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "a_pivot",
    oracle="""
    SELECT l_returnflag,
           round(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
           round(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot = groupBy + conditional aggregation. Pivot values are given
    explicitly — at scale, letting Spark scan for distinct pivot values is
    an extra full pass over the fact table."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


@query("a_approx_sketch")  # rows-only: sketch estimates are engine-specific
def a_approx_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregation — the 100 TB cardinality/quantile path.
    approx_count_distinct is HyperLogLog++ (fixed ~kB sketch per group,
    mergeable map-side, ONE pass — exact countDistinct expands every
    distinct value through the shuffle); percentile_approx is a mergeable
    quantile sketch with bounded error. Estimates are engine-specific, so
    no value oracle; the error bound vs exact is asserted in
    tests/test_extensions.py."""
    li = table(spark, sf_dir, "lineitem")
    pcts = F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
            F.count(F.lit(1)).alias("n_rows"),
            pcts.alias("pcts"),
        )
        .select(
            "l_returnflag",
            "approx_orders",
            "n_rows",
            F.round(F.element_at("pcts", 1), 2).alias("p50_price"),
            F.round(F.element_at("pcts", 2), 2).alias("p95_price"),
            F.round(F.element_at("pcts", 3), 2).alias("p99_price"),
        )
        .orderBy("l_returnflag")
    )


MAD_K = 1.4826  # normal-consistency constant (public robust-stats standard)


@query(
    "x_mad_outlier",
    oracle=f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ), dev AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ), mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type,
           round((d.value - d.med) / ({MAD_K} * t.mad), 4) + 0.0 AS robust_z,
           (d.adev > 3 * {MAD_K} * t.mad) AS is_outlier
    FROM dev d JOIN mad t USING (event_type)
    """,
)
def x_mad_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier scoring per event_type: median/MAD z-score (the
    batch, exact-median sibling of the streaming Welford z-score in
    st_anomaly). robust_z = (value - median) / (1.4826 * MAD); flagged
    beyond 3 sigma-equivalents. Both engines compute the exact
    interpolated median (Spark `percentile` == DuckDB `quantile_cont`,
    index p*(n-1)), the flag compares the SAME raw arithmetic on both
    sides, and robust_z rounds to 4 decimals.

    Scale shape: two grouped EXACT percentiles (each buffers one
    event_type's values per task — event-type cardinality is tiny, value
    lists are per-group spillable sorts) + broadcast joins of the
    group-stats tables back to the fact. At 100 TB with huge groups the
    sketch twin is a_approx_sketch's percentile_approx — same plan with
    the buffered sort swapped for a mergeable sketch; this operator is
    the exact-arithmetic variant the oracle can verify."""
    e = table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_id",
        "event_type",
        (
            F.round((F.col("value") - F.col("med")) / (MAD_K * F.col("mad")), 4)
            + 0.0
        ).alias("robust_z"),
        (F.col("adev") > 3 * MAD_K * F.col("mad")).alias("is_outlier"),
    )


@query(
    "x_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_view_click,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_view_click_purchase
    """,
)
def x_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel conversion (view → click → purchase): users
    counted at each step only if the step's FIRST occurrence follows the
    previous step's first occurrence — the product-analytics sequencing
    query (strictly ordered min-timestamps, not mere co-occurrence).

    Scale shape: each step is a pruned scan (event_type pushed to
    parquet) → per-user min aggregate (map-side partial) → user-keyed
    equi-join with a time residual against the previous step's (small,
    converting-users-only) frame, which AQE broadcasts as the funnel
    narrows. Timestamps and counts are exact on both engines."""
    e = table(spark, sf_dir, "events")

    def first_after(event_type: str, prev: DataFrame, prev_t: str, out_t: str):
        step = e.filter(F.col("event_type") == event_type)
        if prev is not None:
            step = step.join(prev, "user_id").filter(F.col("ts") > F.col(prev_t))
        return step.groupBy("user_id").agg(F.min("ts").alias(out_t))

    v = first_after("view", None, "", "t1")
    c = first_after("click", v, "t1", "t2")
    p = first_after("purchase", c, "t2", "t3")
    counts = [
        df.agg(F.count(F.lit(1)).alias(name))
        for df, name in ((v, "n_view"), (c, "n_view_click"),
                         (p, "n_view_click_purchase"))
    ]
    out = counts[0]
    for nxt in counts[1:]:
        out = out.crossJoin(nxt)  # three 1-row frames
    return out


@query(
    "x_retention",
    oracle="""
    WITH u AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT u.cohort_week,
           CAST(datediff('day', CAST(u.cohort_week AS DATE),
                         CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INT)
             AS week_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM events e JOIN u USING (user_id)
    GROUP BY 1, 2
    """,
)
def x_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention analysis: users grouped by the ISO week of their
    FIRST event (the cohort), counted as active in each subsequent week —
    the product-analytics retention triangle (n_active at week_offset 0 is
    the cohort size). Both engines truncate weeks to Monday (ISO), week
    offsets are exact integer day-diffs between week starts divided by 7
    (always a multiple of 7, so the double division is exact), and the
    count is a plain distinct — fully deterministic.

    Scale shape: the cohort week is min(ts) over a user_id WINDOW — the
    fact table is scanned ONCE and shuffled ONCE (by user_id), where the
    old per-user min aggregate + join-back shape scanned it twice and
    shuffled it twice (r11, guide §2.4: the window reuses the exact rows
    the join would have re-keyed). The retention cells are then a
    low-cardinality groupBy. No global sort."""
    e = table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id")
    return (
        e.select(
            "user_id",
            "ts",
            F.date_trunc("week", F.min("ts").over(w_user)).alias(
                "cohort_week"
            ),
        )
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week").cast("date"),
                )
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


HIST_WIDTH = 5000.0  # equi-width bucket size over l_extendedprice


@query(
    "x_histogram",
    oracle=f"""
    WITH b AS (
      SELECT CAST(floor(l_extendedprice / {HIST_WIDTH}) AS INT) AS bucket,
             COUNT(*) AS n
      FROM lineitem GROUP BY 1
    )
    SELECT bucket,
           bucket * {HIST_WIDTH} AS lo,
           (bucket + 1) * {HIST_WIDTH} AS hi,
           CAST(n AS BIGINT) AS n,
           round(n / SUM(n) OVER (), 4) + 0.0 AS share
    FROM b
    """,
)
def x_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of l_extendedprice (the profiling op behind
    every data-quality dashboard and optimizer statistics collection).
    Bucket ids are exact integer floors of an exact double division, so
    both engines bin identically; the share denominator is an integer sum.

    Scale shape: a pure projection + tiny groupBy — the shuffle carries
    one row per (partition, bucket), i.e. dozens of rows regardless of
    corpus size. The share denominator rides a 1-row scalar broadcast
    (lm.attach_scalar) over the aggregated bucket table — no window at
    all, so the plan guard's no-unpartitioned-window rule needs no
    exception for this query (an earlier revision used an unpartitioned
    whole-frame window; bounded-by-construction, but indistinguishable
    in the plan from the hazard the guard exists to catch)."""
    from imagingdb_spark.operators.lm import attach_scalar

    li = table(spark, sf_dir, "lineitem")
    b = (
        li.select(
            F.floor(F.col("l_extendedprice") / HIST_WIDTH)
            .cast("int")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        # consumed twice (rows + total): persist the ~max_price/width-row
        # bucket table so the FACT TABLE is scanned once, not twice —
        # clearCache-between-queries convention (see lm.doc_term_counts)
        .persist()
    )
    tot = b.agg(F.sum("n").alias("__tot"))
    return attach_scalar(b, tot).select(
        "bucket",
        (F.col("bucket") * HIST_WIDTH).alias("lo"),
        ((F.col("bucket") + 1) * HIST_WIDTH).alias("hi"),
        F.col("n").cast("bigint").alias("n"),
        (F.round(F.col("n") / F.col("__tot"), 4) + 0.0).alias("share"),
    )


INCR_SPLIT_DAY = "2024-01-15"  # events before = standing state, after = new batch


@query(
    "x_incr_agg",
    oracle="""
    SELECT event_type,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0
             AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def x_incr_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a standing daily rollup (state
    from all events before INCR_SPLIT_DAY) is brought up to date by
    MERGING the new batch's partial aggregates — never by recomputing
    history. The oracle is the FULL recompute over all events, so the
    driver check proves the incremental merge is lossless: this is the
    mergeable-aggregate algebra (count and sum are commutative monoids —
    merging partial states equals aggregating the union) that makes
    hierarchical/resumable rollups possible at 100 TB, where the state
    table is millions of rows but the daily increment is the only data
    scanned.

    Determinism: values quantize to BIGINT cents before summation
    (integer addition is order-insensitive; a raw double SUM would differ
    between engines in the last ulp), and the final /100.0 of an integer
    is the same double everywhere.

    Scale shape: each side aggregates with map-side partial combine; the
    merge is a second groupBy over the UNION of two state-sized frames —
    shuffle rows = group cardinality, not event count. In production the
    state side is a parquet table written by the previous run; here both
    sides derive from deterministic date slices of the same table so the
    oracle can verify the algebra end-to-end."""
    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        ),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )

    # Both partial states in ONE fact pass (r11, guide §2.4): the side
    # flag joins the grouping key, so the state and increment partials
    # are disjoint groups of a single map-side-combined aggregate — the
    # old two-filter shape scanned the fact table twice and shuffled it
    # twice. The merge step below regroups the partials by
    # (event_type, day) — structurally a merge of partials; because the
    # split flag is a pure function of `day`, no group ever spans both
    # sides, so the cross-side summation is exercised vacuously (true of
    # the old two-filter shape as well — ADVICE r11).
    partials = (
        e.withColumn("__new", F.col("day") >= INCR_SPLIT_DAY)
        .groupBy("__new", "event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("s_cents"),
        )
    )
    merged = partials.groupBy("event_type", "day").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("s_cents").alias("s_cents"),
    )
    return merged.select(
        "event_type",
        "day",
        F.col("n_events").cast("bigint").alias("n_events"),
        (F.col("s_cents") / 100.0).alias("sum_value"),
    )


@query(
    "x_exact_quantiles",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def x_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (PERCENTILE_CONT semantics: linear
    interpolation between adjacent order statistics — identical math in
    Spark's `percentile` and DuckDB's `quantile_cont`). The exact twin of
    a_approx_sketch's approx_percentile row: exact answers when group
    count is small enough to sort, sketches when it is not.

    Scale shape: ONE shuffle on the group key, then a per-group sort
    inside the aggregate buffer. Exact grouped percentiles hold the whole
    group's values in the aggregation buffer — fine for a handful of
    groups at bench SF, memory-hazardous for billion-row groups, which is
    exactly when a_approx_sketch's fixed-size KLL/GK sketch replaces this
    operator (that tradeoff is the reason both rows exist)."""
    li = table(spark, sf_dir, "lineitem")
    pct = F.percentile("l_extendedprice", F.array(*[F.lit(x) for x in (0.25, 0.50, 0.75, 0.99)]))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            pct.alias("q"),
        )
        .select(
            "l_returnflag",
            "n",
            F.round(F.col("q")[0], 4).alias("p25"),
            F.round(F.col("q")[1], 4).alias("p50"),
            F.round(F.col("q")[2], 4).alias("p75"),
            F.round(F.col("q")[3], 4).alias("p99"),
        )
    )


PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@query(
    "x_profile_stats",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv,
           round(MIN({c}), 4) AS min_v,
           round(MAX({c}), 4) AS max_v
    FROM lineitem"""
        for c in PROFILE_COLS
    ),
)
def x_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (the ANALYZE TABLE / data-catalog stats pass):
    per-column row count, null count, exact distinct count, min and max —
    the numbers that feed cost-based optimization, data-quality
    monitoring, and partition-layout decisions. Long format (one row per
    column) so adding columns never changes the schema.

    Scale shape: ONE scan of the table computes every column's stats in
    a single aggregate (the oracle's UNION-of-scans form is for DuckDB
    clarity; Spark gets one pass + one 1-row-per-column unpivot). Exact
    NDV per column makes the aggregate carry a distinct-expand — at
    100 TB swap count_distinct for approx_count_distinct (HLL++, fixed
    memory) exactly as a_approx_sketch demonstrates; everything else is
    a constant-size partial agg."""
    li = table(spark, sf_dir, "lineitem")
    aggs = []
    for c in PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).cast("bigint").alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"{c}__n_null"),
            F.count_distinct(c).cast("bigint").alias(f"{c}__ndv"),
            F.round(F.min(c), 4).alias(f"{c}__min_v"),
            F.round(F.max(c), 4).alias(f"{c}__max_v"),
        ]
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__n_null, {c}__ndv, {c}__min_v, {c}__max_v"
        for c in PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(PROFILE_COLS)}, {stack_args}) "
        "AS (col_name, n, n_null, ndv, min_v, max_v)"
    )


@query(
    "a_geomean_udaf",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(exp(avg(ln(l_extendedprice))), 4) AS geomean
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a_geomean_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group geometric mean — the right average for multiplicative
    quantities (price relatives, growth factors) — via the monoid
    decomposition ln() → builtin AVG → exp(), which partial-aggregates
    map-side like any builtin average and therefore survives billion-row
    groups (VERDICT r4 item 9: this decomposed form is the DEFAULT; the
    GROUPED_AGG pandas UDAF below, ``geomean_grouped_udaf``, is kept as
    the extension-point demo for aggregation semantics that genuinely
    have no builtin decomposition, with a parity unit test proving the
    two agree). A GROUPED_AGG UDAF ships the whole group's column to one
    python worker — fine for bounded groups, a scale-killer for a hot
    key; an algebraic rewrite is always preferred when one exists."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.exp(F.avg(F.log("l_extendedprice"))), 4).alias("geomean"),
    )


def geomean_grouped_udaf(df: DataFrame, group_col: str, val_col: str) -> DataFrame:
    """The pandas GROUPED_AGG form of the geometric mean — the third leg
    of the UDF surface (SURVEY §2.10: pandas_udf scalar for codecs,
    applyInPandas for UDTF-shaped stack assembly, and THIS for custom
    aggregates). Whole-group Arrow transfer, NO map-side partials: use it
    only for semantics with no algebraic decomposition; a_geomean_udaf's
    builtin rewrite is the production path for this particular one.

    Domain: the geometric mean is defined over STRICTLY POSITIVE values.
    To match the builtin decomposition on dirty data, the kernel drops
    NULL and non-positive entries the same way ``F.avg(F.log(x))`` does
    (log of null/0/negative is NULL in Spark SQL and AVG skips nulls;
    parity on a dirty group is pinned in tests). The residual
    divergence is non-finite input (NaN or +inf) — the builtin AVG
    propagates those, this kernel's isfinite mask drops them; feed
    finite data. ``n`` counts ALL group rows
    on both forms, so it is the group size, not the geomean's support
    size."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    # Series -> scalar hints mark these GROUPED_AGG; `from __future__
    # import annotations` stringifies the hints, which resolve only
    # because pandas is imported at MODULE level (function-local imports
    # are invisible to typing.get_type_hints)
    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        x = v.to_numpy(dtype="float64")
        x = x[np.isfinite(x) & (x > 0)]
        if len(x) == 0:
            return None
        return float(np.exp(np.log(x).mean()))

    # Spark refuses mixed pandas/builtin aggregates in one agg(), so the
    # row count is a second GROUPED_AGG over the same Arrow batch
    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    return df.groupBy(group_col).agg(
        n_rows(val_col).alias("n"),
        F.round(geomean(val_col), 4).alias("geomean"),
    )


CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@query(
    "x_corr_matrix",
    oracle="""
    WITH a AS (
      SELECT corr(l_quantity, l_extendedprice) AS c01,
             corr(l_quantity, l_discount)      AS c02,
             corr(l_quantity, l_tax)           AS c03,
             corr(l_extendedprice, l_discount) AS c12,
             corr(l_extendedprice, l_tax)      AS c13,
             corr(l_discount, l_tax)           AS c23
      FROM lineitem
    )
    SELECT col_a, col_b, round(v, 4) + 0.0 AS pearson FROM a
    UNPIVOT (v FOR pair IN (c01, c02, c03, c12, c13, c23))
    CROSS JOIN LATERAL (SELECT
      CASE pair WHEN 'c01' THEN 'l_quantity' WHEN 'c02' THEN 'l_quantity'
                WHEN 'c03' THEN 'l_quantity' WHEN 'c12' THEN 'l_extendedprice'
                WHEN 'c13' THEN 'l_extendedprice' ELSE 'l_discount' END AS col_a,
      CASE pair WHEN 'c01' THEN 'l_extendedprice' WHEN 'c02' THEN 'l_discount'
                WHEN 'c03' THEN 'l_tax' WHEN 'c12' THEN 'l_discount'
                WHEN 'c13' THEN 'l_tax' ELSE 'l_tax' END AS col_b) t
    """,
)
def x_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of the lineitem measures — the
    multivariate leg of ANALYZE-style profiling (x_profile_stats covers
    per-column moments; this covers the cross-moments feature-selection
    and drift monitors read). Deterministic at 4 decimals: both engines
    compute textbook co-moment sums whose reordering error is ~1e-12
    relative — far below the rounding grain (the same argument every
    round(.., 4) float aggregate in the registry relies on).

    Scale shape: ALL pairs ride ONE aggregate over ONE scan — 6 corr
    accumulators evaluate map-side with partial merge (corr is a
    commutative monoid on (n, Σx, Σy, Σxy, Σx², Σy²)), so the shuffle is
    6 accumulator structs regardless of corpus size; the unpivot to
    (col_a, col_b, pearson) rows touches a 1-row table. For W columns
    the accumulator count is W(W-1)/2 — at W beyond ~100 switch to the
    Gram-matrix form (one pandas_udf pass + driver-side normalization,
    similarity.py's tiling notes apply)."""
    li = table(spark, sf_dir, "lineitem")
    agg = li.agg(
        *[
            F.corr(a, b).alias(f"{i}_{j}")
            for i, a in enumerate(CORR_COLS)
            for j, b in enumerate(CORR_COLS)
            if i < j
        ]
    )
    pairs = [
        (a, b, f"{i}_{j}")
        for i, a in enumerate(CORR_COLS)
        for j, b in enumerate(CORR_COLS)
        if i < j
    ]
    stack = ", ".join(
        f"'{a}', '{b}', `{c}`" for a, b, c in pairs
    )
    return agg.select(
        F.expr(
            f"stack({len(pairs)}, {stack}) AS (col_a, col_b, raw)"
        )
    ).select("col_a", "col_b", (F.round("raw", 4) + 0.0).alias("pearson"))
