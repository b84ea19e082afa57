"""Mergeable HyperLogLog sketches (Flajolet et al. 2007 / HLL++ family,
public) — the bounded-state answer to continuous COUNT(DISTINCT).

Spark's built-in approx_count_distinct is HLL++ internally but its sketch
never leaves the JVM aggregate, so it cannot be MERGED across triggers,
tables, or days — which is the whole point at 100 TB: per-window register
state (≤ 4096 rows per window) is stored, replay-safe (register max is
idempotent AND commutative, so at-least-once redelivery converges
bit-exactly), and a year of hourly windows is megabytes of state for any
key cardinality.

Everything stays JVM-side — this is the second design; the first built
register arrays in applyInPandas and spent 3.5 ms of per-group Python
overhead × 3600 groups (12.7 s at sf0.1 for a 0.3 s job):

- rank: for hash h, register index = top P bits
  (shiftrightunsigned(h, 64-P)) and rank = leading zeros of the
  remaining 64-P bits + 1. ``bin(w)`` returns the minimal binary string
  for positive longs (its LENGTH is the exact integer bit_length —
  no float log2, which loses exactness above 2^53) and the full 64-char
  two's-complement for negative ones (top bit set -> rank 1), so
  rank = CASE w=0 -> 64-P+1 ELSE 65 - length(bin(w)) is exact.
- registers: SPARSE rows (group, reg_idx, rank) via groupBy().max() —
  map-side combined, shuffle carries at most 4096 rows per group.
  Merging two sketches = union + the same max — no binary blobs, no
  Python, and the idempotence argument is the aggregate itself.
- estimate: sum over registers of 2^-rank, computed EXACTLY as scaled
  integers — shiftleft(1, 53-rank) summed into DECIMAL(38,0), divided by
  2^53 at the end — so the float never sees an order-dependent
  accumulation (run-to-run determinism for the rows-only driver check);
  absent registers contribute 2^0 = 1 each via (m - count). Small-range
  linear counting (m·ln(m/V)) applies below 2.5m as usual.

A numpy twin (registers_from_hashes / estimate_np) stays here for the
tests to pin the JVM bit tricks against an independent implementation.

Reference parity: the reference answers "how many distinct X" by
scanning Postgres (db_operations.py get_datasets + len); sketches are
that question made continuous and mergeable at data scale.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from imagingdb_spark.catalog import values_df
from imagingdb_spark.registry import query

HLL_P = 12                 # 2^12 = 4096 registers -> ~1.6% relative error
HLL_M = 1 << HLL_P
_MAX_RANK = 64 - HLL_P + 1  # rank when the low 64-P bits are all zero
_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def hll_partials(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """Sparse register rows (group_cols..., reg_idx int, rank int): the
    mergeable sketch of COUNT(DISTINCT key) per group. One JVM projection
    + one map-side-combined groupBy max — no Python anywhere."""
    h = F.xxhash64(F.col(key_col))
    w = F.shiftleft(h, HLL_P)
    rank = F.when(w == 0, F.lit(_MAX_RANK)).otherwise(
        F.lit(65) - F.length(F.bin(w))
    )
    return (
        df.select(
            *group_cols,
            F.shiftrightunsigned(h, 64 - HLL_P).cast("int").alias("reg_idx"),
            rank.cast("int").alias("rank"),
        )
        .groupBy(*group_cols, "reg_idx")
        .agg(F.max("rank").alias("rank"))
    )


def hll_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Union-max merge of two sparse sketches — associative, commutative,
    IDEMPOTENT (re-merging an absorbed partial is a no-op), which is the
    entire replay-safety argument of the streaming job."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "reg_idx")
        .agg(F.max("rank").alias("rank"))
    )


def hll_estimate_col() -> tuple[list[Column], Column]:
    """(aggregate exprs, post-agg estimate column) over sparse register
    rows. The 2^-rank sum rides DECIMAL(38,0) scaled integers
    (shiftleft(1, 53-rank)) so it is EXACT regardless of row order."""
    aggs = [
        # DataFrame-API shiftleft only takes a literal bit count; the SQL
        # form shifts by an expression. The cast sits INSIDE the sum so
        # the accumulator itself is DECIMAL(38,0) — terms reach 2^52 and
        # a long accumulator could wrap past 2048 rank-1 registers
        F.sum(F.expr("cast(shiftleft(1L, 53 - rank) as decimal(38,0))"))
        .alias("__scaled"),
        F.count(F.lit(1)).alias("__nreg"),
    ]
    m = float(HLL_M)
    s = (F.col("__scaled").cast("double") / F.lit(float(1 << 53))) + (
        F.lit(m) - F.col("__nreg")
    )
    raw = F.lit(_ALPHA * m * m) / s
    v = F.lit(m) - F.col("__nreg")  # zero registers (ranks are >= 1)
    linear = F.lit(m) * F.log(F.lit(m) / v)
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0), linear).otherwise(raw)
    return aggs, est


def hll_estimate_df(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group_cols..., approx_distinct long) from sparse register rows —
    the ONE estimate shape, shared by the batch twin and the streaming
    read side (jobs.hll_estimates) so the two can never drift apart on
    alias/rounding/cast."""
    aggs, est = hll_estimate_col()
    return (
        registers.groupBy(*group_cols)
        .agg(*aggs)
        .select(
            *group_cols,
            F.round(est).cast("long").alias("approx_distinct"),
        )
    )


def hll_distinct(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """Batch twin: approximate COUNT(DISTINCT key) per group off the
    mergeable sparse registers — deterministic (seedless xxhash64 + the
    exact scaled-integer estimator), so the streaming job's merged state
    must reproduce these registers EXACTLY on the same data (pinned by
    test)."""
    return hll_estimate_df(hll_partials(df, key_col, group_cols), group_cols)


@query("st_distinct_hll")  # rows-only: HLL estimates aren't ANSI-SQL
def st_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-cardinality batch twin: approximate distinct users per
    (hour, event_type) window over events — the registers are the same
    rows the streaming job (streaming_distinct_hll) accumulates, so this
    IS the query a dashboard runs against the maintained state. Accuracy
    pinned by test (~1.6% expected at 2^12 registers); determinism by the
    seedless JVM hash + exact estimator arithmetic."""
    from imagingdb_spark.catalog import table

    e = table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("window_start"),
        "event_type",
        "user_id",
    )
    return hll_distinct(e, "user_id", ["window_start", "event_type"])


# ---- numpy reference twin (tests pin the JVM bit tricks against it) ----


def _bit_length(v: np.ndarray) -> np.ndarray:
    """Vectorized exact bit_length for uint64 (no float log — log2 loses
    exactness above 2^53, which is precisely where hashes live)."""
    bl = np.zeros(v.shape, np.int64)
    x = v.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= np.uint64(1 << s)
        bl[big] += s
        x[big] >>= np.uint64(s)
    return bl + (x > 0)


def registers_from_hashes(hashes: np.ndarray) -> np.ndarray:
    """int64 hashes -> dense uint8[HLL_M] register array (reference)."""
    h = hashes.astype(np.int64).view(np.uint64)
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    w = h << np.uint64(HLL_P)
    rank = np.where(
        w == 0, np.int64(_MAX_RANK), np.int64(64) - _bit_length(w) + 1
    ).astype(np.uint8)
    regs = np.zeros(HLL_M, np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def estimate_np(regs: np.ndarray) -> float:
    """Reference estimator over a dense register array."""
    m = float(HLL_M)
    r = regs.astype(np.float64)
    e = _ALPHA * m * m / np.sum(np.exp2(-r))
    v = float(np.count_nonzero(r == 0))
    if e <= 2.5 * m and v > 0:
        e = m * np.log(m / v)
    return float(e)


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (St16/D22): DDSketch-style log-bucketed
# histogram ("DDSketch: a fast and fully-mergeable quantile sketch with
# relative-error guarantees", Masson et al., VLDB 2019 — public). Bucket
# index = ceil(log_gamma(v)) with gamma = (1+alpha)/(1-alpha): any value
# in bucket i sits within relative error alpha of the bucket estimate
# 2*gamma^i/(gamma+1). Merging = bucket-count SUM — commutative and
# associative but NOT idempotent (a replayed batch double-counts), so the
# streaming fold rides snapshot_rmw's txn marker exactly like the MG
# heavy-hitter state and unlike the HLL register max. State is
# O(log(max/min)/alpha) rows per group (~1-2k buckets across 18 decades
# at 1%) at ANY row count — the bounded-state property percentile_approx
# has inside one job but cannot persist across triggers/tables/days.
# All JVM: one log-projection + one groupBy sum.
# ---------------------------------------------------------------------------

DD_ALPHA = 0.01
DD_GAMMA = (1 + DD_ALPHA) / (1 - DD_ALPHA)
_DD_LN_GAMMA = float(np.log(DD_GAMMA))
# Hard per-group bucket ceiling (the paper's collapsing variant): real
# value distributions stay far below it (~2k buckets spans 18 decades at
# 1%), but an adversarial range (subnormal..1e300 doubles is ~60k
# buckets) must not grow the state — the LOWEST-value buckets merge into
# the collapse boundary, preserving the alpha guarantee for every
# quantile above the collapsed mass (upper quantiles are what latency/
# price monitoring reads; the paper proves this is the right end to give
# up).
DD_MAX_BUCKETS = 2048


def dd_partials(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Sparse bucket rows (group_cols..., sign tinyint, bkt int, cnt
    long): the mergeable sketch of `value_col`'s distribution per group.
    sign ∈ {-1, 0, 1} handles negatives (mirrored buckets) and exact
    zeros (their own bucket). One projection + one map-side-combined
    groupBy sum."""
    v = F.col(value_col).cast("double")
    sign = F.when(v > 0, F.lit(1)).when(v < 0, F.lit(-1)).otherwise(
        F.lit(0)
    )
    bkt = F.when(
        v == 0, F.lit(0)
    ).otherwise(F.ceil(F.log(F.abs(v)) / F.lit(_DD_LN_GAMMA)))
    return (
        # percentile semantics ignore NULL and NaN (the SQL
        # percentile/percentile_approx contract): unfiltered, a NULL
        # lands in the otherwise(0) sign branch and a NaN in sign=1 with
        # a null bucket — both inflate n_total and drag every quantile
        # toward 0 (round-7 review finding)
        df.filter(v.isNotNull() & ~F.isnan(v))
        .select(
            *group_cols,
            sign.cast("tinyint").alias("sign"),
            bkt.cast("int").alias("bkt"),
        )
        .groupBy(*group_cols, "sign", "bkt")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dd_collapse(
    buckets: DataFrame,
    group_cols: list[str],
    max_buckets: int = DD_MAX_BUCKETS,
) -> DataFrame:
    """The DDSketch collapsing rule as a plan: per group, when more than
    ``max_buckets`` bucket rows exist, the LOWEST-value buckets merge
    into the lowest KEPT bucket (the collapse boundary). Quantiles at or
    above the boundary keep the full alpha guarantee; quantiles inside
    the collapsed mass report the boundary estimate (an upward-biased,
    still-monotone floor). One per-group rank window + a boundary-row
    broadcast join-back; a no-op plan when every group is under the
    ceiling. Deterministic: the rank key is the exact value order."""
    from pyspark.sql.window import Window

    key = F.col("sign").cast("int") * F.col("bkt")
    # rank 1 = HIGHEST value bucket; ranks >= max_buckets collapse
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("sign").desc(), key.desc()
    )
    ranked = buckets.withColumn("__r", F.row_number().over(w))
    keep = ranked.filter(F.col("__r") < max_buckets).drop("__r")
    boundary = ranked.filter(F.col("__r") == max_buckets).select(
        *group_cols,
        F.col("sign").alias("__bsign"),
        F.col("bkt").alias("__bbkt"),
    )
    collapsed = (
        ranked.filter(F.col("__r") >= max_buckets)
        .join(F.broadcast(boundary), group_cols)
        .select(
            *group_cols,
            F.col("__bsign").alias("sign"),
            F.col("__bbkt").alias("bkt"),
            "cnt",
        )
    )
    return (
        keep.unionByName(collapsed)
        .groupBy(*group_cols, "sign", "bkt")
        .agg(F.sum("cnt").alias("cnt"))
    )


def dd_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union-sum merge + collapse to the bucket ceiling — associative +
    commutative, NOT idempotent: the replay screen is the caller's job
    (snapshot_rmw txn marker in the streaming fold)."""
    merged = (
        a.unionByName(b)
        .groupBy(*group_cols, "sign", "bkt")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return dd_collapse(merged, group_cols)


def dd_quantiles(
    buckets: DataFrame, group_cols: list[str], qs: list[float]
) -> DataFrame:
    """(group_cols..., q, value) per requested quantile off the sparse
    bucket rows: order buckets by true value order (sign asc, sign*bkt
    asc), running-sum the counts under ONE per-group window, and for each
    q pick the bucket whose cumulative range covers ceil(q*N). The
    estimate 2*gamma^bkt/(gamma+1) (sign-adjusted; 0 for the zero bucket)
    is within relative error DD_ALPHA of the true quantile value by the
    bucket invariant. Shuffle: one exchange on the group key; the window
    is per-group over <= a few thousand bucket rows."""
    from pyspark.sql.window import Window

    key = (F.col("sign").cast("int") * F.col("bkt")).alias("__key")
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("sign", "__key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*group_cols)
    cum = (
        buckets.select(*group_cols, "sign", "bkt", "cnt", key)
        .withColumn("cum", F.sum("cnt").over(w))
        .withColumn("n_total", F.sum("cnt").over(wn))
    )
    qlits = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    est = (
        F.when(F.col("sign") == 0, F.lit(0.0))
        .otherwise(
            F.col("sign")
            * F.lit(2.0 / (DD_GAMMA + 1))
            * F.pow(F.lit(DD_GAMMA), F.col("bkt"))
        )
    )
    rank = F.ceil(F.col("q") * F.col("n_total"))
    return (
        cum.select(*group_cols, "sign", "bkt", "cnt", "cum", "n_total", qlits)
        .filter(
            (F.col("cum") >= rank) & (F.col("cum") - F.col("cnt") < rank)
        )
        .select(*group_cols, "q", F.round(est, 6).alias("value"))
    )


@query("st_quantiles")  # rows-only: log-bucket quantile estimates aren't
#                         ANSI-SQL; the relative-error bound vs exact
#                         quantiles and the stream==batch fold parity are
#                         pinned in tests/test_sketches.py
def st_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-quantiles batch twin: p50/p90/p99 of lineitem extended
    price per return flag off the mergeable bucket sketch — the same rows
    the streaming job (streaming_quantiles) folds into snapshot state, so
    this IS the query a latency/price dashboard runs against the
    maintained sketch. Relative error <= DD_ALPHA by construction;
    deterministic (integer bucket counts + exact rank selection)."""
    from imagingdb_spark.catalog import table

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    parts = dd_partials(li, "l_extendedprice", ["l_returnflag"])
    return dd_quantiles(parts, ["l_returnflag"], [0.5, 0.9, 0.99]).orderBy(
        "l_returnflag", "q"
    )


# ---- numpy reference twin (tests pin the JVM bucket math against it) ----


def dd_bucket_np(values: np.ndarray) -> dict[tuple[int, int], int]:
    """(sign, bkt) -> count, independently of Spark."""
    out: dict[tuple[int, int], int] = {}
    for v in np.asarray(values, dtype=np.float64):
        if v == 0:
            k = (0, 0)
        else:
            s = 1 if v > 0 else -1
            k = (s, int(np.ceil(np.log(abs(v)) / _DD_LN_GAMMA)))
        out[k] = out.get(k, 0) + 1
    return out


def dd_quantile_np(
    buckets: dict[tuple[int, int], int], q: float
) -> float:
    """Reference rank selection over a (sign, bkt) -> count dict."""
    items = sorted(buckets.items(), key=lambda kv: (kv[0][0], kv[0][0] * kv[0][1]))
    n = sum(buckets.values())
    rank = int(np.ceil(q * n))
    cum = 0
    for (s, b), c in items:
        cum += c
        if cum >= rank:
            if s == 0:
                return 0.0
            return round(s * 2.0 / (DD_GAMMA + 1) * DD_GAMMA ** b, 6)
    raise ValueError("empty sketch")


# ---------------------------------------------------------------------------
# KMV / theta sketch (St17/D23): mergeable distinct sketches that support
# SET ALGEBRA — the question HLL registers cannot answer. K-minimum-values
# (Bar-Yossef et al. 2002; the Apache DataSketches theta family, public):
# keep the k smallest distinct hash values per group; theta = the k-th
# minimum (as a fraction of hash space) is an unbiased density, so
# distinct ≈ (k-1)/theta, and INTERSECTIONS estimate by counting common
# sample values below the pairwise min-theta. Relative error ~1/sqrt(k-2)
# (~3% at k=1024). The fold (union + re-truncate to the k smallest) is
# idempotent, commutative, and associative — replay-safe BY ALGEBRA like
# the HLL register max, and unlike the MG/DDSketch counter sums: the
# streaming twin deliberately carries NO txn marker, and the test suite
# pins that the algebraic path (not bookkeeping) absorbs replays.
# All JVM: hashes ride DECIMAL(20,0) exact unsigned values; one distinct
# + one per-group rank; floats appear only in the final estimate.
# ---------------------------------------------------------------------------

KMV_K = 1024
_U64 = "cast('18446744073709551616' as decimal(21,0))"   # 2^64
_BIAS = "cast('9223372036854775808' as decimal(20,0))"   # 2^63


def kmv_partials(
    df: DataFrame, key_col: str, group_cols: list[str], k: int = KMV_K
) -> DataFrame:
    """Sparse sample rows (group_cols..., u decimal(20,0)): the k smallest
    distinct unsigned-hash values of `key_col` per group. Shuffle carries
    (group, u) only; the rank window partitions by group."""
    from pyspark.sql.window import Window

    u = (
        F.xxhash64(F.col(key_col)).cast("decimal(20,0)") + F.expr(_BIAS)
    ).alias("u")
    # NOTE (r11 audit): the final per-group rank funnels each group's
    # distinct keys through one window task. A salted two-level
    # selection (rank within (group, pmod(u, S)) first, then the global
    # rank over <= S·k survivors — lossless because a global top-k value
    # is a top-k value of its salt slice) bounds that task's input at
    # any scale; it was measured here and NOT adopted for the bench tree
    # because it adds an exchange that costs more than the funnel saves
    # at bench SF. Flip to it when a single group's distinct count
    # approaches task memory.
    w = Window.partitionBy(*group_cols).orderBy("u")
    return (
        df.select(*group_cols, u)
        .dropDuplicates([*group_cols, "u"])
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


def kmv_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str], k: int = KMV_K
) -> DataFrame:
    """Union + re-truncate to the k smallest — idempotent (re-merging an
    absorbed sample is a no-op), so the streaming fold needs no replay
    bookkeeping."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*group_cols).orderBy("u")
    return (
        a.unionByName(b)
        .dropDuplicates([*group_cols, "u"])
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


def _kmv_stats(sketch: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """(group..., n long, theta_raw decimal(21,0)): theta is the sketch's
    largest kept value when FULL (k samples), else 2^64 — i.e. a partial
    sketch has seen its whole population and is exact."""
    return sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.when(F.count(F.lit(1)) < k, F.expr(_U64))
        .otherwise(F.max("u").cast("decimal(21,0)"))
        .alias("theta_raw"),
    )


def kmv_estimate_df(
    sketch: DataFrame, group_cols: list[str], k: int = KMV_K
) -> DataFrame:
    """(group..., approx_distinct long): exact when the population fit in
    the sketch, (k-1)/theta otherwise."""
    s = _kmv_stats(sketch, group_cols, k)
    theta = F.col("theta_raw").cast("double") / F.lit(float(1 << 64))
    est = F.when(F.col("n") < k, F.col("n").cast("double")).otherwise(
        F.lit(float(k - 1)) / theta
    )
    return s.select(
        *group_cols, F.round(est).cast("long").alias("approx_distinct")
    )


def kmv_overlaps(
    sketch: DataFrame, group_col: str, k: int = KMV_K
) -> DataFrame:
    """Pairwise set algebra over per-group sketches: for every group pair
    (a < b), the estimated common-key count and Jaccard. theta_pair =
    min(theta_a, theta_b); common samples strictly below it scale by
    1/theta (the DataSketches intersection rule). When both sketches are
    partial the estimate is EXACT (theta = 1, samples = whole
    populations) — pinned by test against a direct distinct intersection.

    Plan shape: the sketch materializes ONCE — persisted, with the stats
    collect right below doubling as the cache build (r11: an eager
    localCheckpoint plus a separate stats collect was two driver-blocking
    jobs where one suffices; it feeds the stats pass and both sides of
    the sample join; k rows per group, never the corpus); per-group
    stats are a GROUPS-sized collect
    (a segment taxonomy, bounded like every dim collect in the repo), so
    the group-pair frame is built driver-side with its thetas and
    per-group estimates as literals — a non-equi g_a < g_b join would be
    the quadratic-BNLJ shape the plan guard rejects. The only distributed
    join is the equi-join of sample rows on u (k × groups rows)."""
    from decimal import Decimal

    sketch = sketch.persist()
    spark = sketch.sparkSession
    stats = {
        r[group_col]: (int(r["n"]), int(r["theta_raw"]))
        for r in _kmv_stats(sketch, [group_col], k).collect()
    }

    def _est(g: str) -> float:
        n, th = stats[g]
        return float(n) if n < k else (k - 1) / (th / float(1 << 64))

    pair_rows = []
    groups = sorted(stats)
    for i, a in enumerate(groups):
        for b in groups[i + 1:]:
            th_pair = min(stats[a][1], stats[b][1])
            pair_rows.append(
                (a, b, Decimal(th_pair),
                 th_pair / float(1 << 64), _est(a), _est(b))
            )
    pairs = values_df(
        spark,
        pair_rows,
        "g_a string, g_b string, th_pair decimal(21,0), "
        "theta double, est_a double, est_b double",
    )
    common_n = (
        sketch.select(F.col(group_col).alias("g_a"), "u")
        .join(sketch.select(F.col(group_col).alias("g_b"), "u"), "u")
        .filter(F.col("g_a") < F.col("g_b"))
        .join(F.broadcast(pairs.select("g_a", "g_b", "th_pair")),
              ["g_a", "g_b"])
        .filter(F.col("u").cast("decimal(21,0)") < F.col("th_pair"))
        .groupBy("g_a", "g_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    est_common = (
        F.coalesce(F.col("n_common"), F.lit(0)) / F.col("theta")
    )
    union_est = F.col("est_a") + F.col("est_b") - est_common
    return (
        pairs.join(common_n, ["g_a", "g_b"], "left")
        .select(
            "g_a",
            "g_b",
            F.round(est_common).cast("long").alias("common_est"),
            F.round("est_a").cast("long").alias("distinct_a_est"),
            F.round("est_b").cast("long").alias("distinct_b_est"),
            F.round(est_common / union_est, 4).alias("jaccard_est"),
        )
    )


@query("st_theta_overlap")  # rows-only: KMV estimates aren't ANSI-SQL; the
#                             exact-when-partial parity and the error bound
#                             are pinned in tests/test_sketches.py
def st_theta_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous audience-overlap batch twin: for every event-type pair,
    the estimated common-user count, per-type distincts, and Jaccard off
    per-type KMV sketches — the segment-overlap question (users doing BOTH
    X and Y) that HLL registers cannot answer and an exact distinct
    intersection would answer with a corpus-sized shuffle per pair. The
    sketches are the same rows the streaming job (streaming_theta_sketch)
    maintains in snapshot state, so this IS the dashboard query over the
    maintained state. Deterministic: seedless hash, exact decimal order,
    float division only in the final estimate."""
    from imagingdb_spark.catalog import table

    e = table(spark, sf_dir, "events").select("event_type", "user_id")
    sk = kmv_partials(e, "user_id", ["event_type"])
    return kmv_overlaps(sk, "event_type").orderBy("g_a", "g_b")


# ---- python reference twin (tests pin the JVM decimal order against it) --


def kmv_sketch_py(hashes, k: int = KMV_K) -> list[int]:
    """Signed xxhash64 values -> the k smallest distinct unsigned values."""
    us = sorted({h + (1 << 63) for h in hashes})
    return us[:k]


def kmv_overlap_py(sa: list[int], sb: list[int], k: int = KMV_K) -> float:
    """Estimated |A ∩ B| from two KMV samples."""
    th_a = (1 << 64) if len(sa) < k else sa[-1]
    th_b = (1 << 64) if len(sb) < k else sb[-1]
    th = min(th_a, th_b)
    common = len({u for u in sa if u < th} & {u for u in sb if u < th})
    return common / (th / float(1 << 64))
