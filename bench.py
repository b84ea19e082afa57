"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect-count via a cheap
action). A warmup pass on sf's lineitem primes JVM/JIT/parquet footers so
numbers reflect steady-state execution, not first-query class loading.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from imagingdb_spark import registry
from imagingdb_spark.session import get_spark

HEADLINE = [
    "a_sum_avg",        # TPC-H Q1: scan-heavy partial+final agg
    "j_three_way",      # star join with pushed filters
    "j_outer_count",    # outer join + agg
    "a_count_distinct", # high-cardinality grouped distinct
    "a_rollup",         # grouping sets
    "w_running",        # window prefix sum
    "w_topk_group",     # per-group top-k
    "st_session",       # session windows
    "o_topk",           # global top-k
    "x_dedup_exact",    # content-hash dedup
    "x_dedup_minhash",  # MinHash LSH near-dup
    "x_dedup_embed",    # embedding-cosine near-dup (blocked exact)
    "x_token_freq",     # explode + agg
    "x_text_stats",     # per-doc quality stats
    "x_topk_sim",       # brute-force cosine top-k
    "j_asof",           # as-of join via union + window
    "st_anomaly",       # applyInPandas stateful scan
    "f_json_extract",   # JSON predicate pushline
    "x_dedup_incremental",  # batch-vs-corpus asymmetric PPJoin
    "x_chunk_docs",     # fixed-stride RAG chunking
    "w_range_frame",    # time-bounded RANGE window frame
    "x_gapfill",        # dense-grid resample + forward fill
    "x_tfidf",          # shared term-count pass + broadcast df join-back
    "x_retention",      # cohort retention triangle
    "x_incr_agg",       # mergeable-aggregate incremental rollup
    "x_span_dedup",     # cross-doc span removal + in-order reassembly
    "j_temporal_lookup",  # point-in-time SCD-2 interval join
    "x_cdc_apply",      # ordered change-log replay (LWW + deletes)
    "x_token_ids",      # numericalization w/ broadcast vocab + OOV hashing
    "x_ann_ivfpq",      # IVF x residual-PQ ADC serving + exact re-rank
    "st_quantiles",     # DDSketch mergeable quantiles (batch twin)
    "st_theta_overlap", # KMV set-algebra audience overlaps (batch twin)
    "x_perplexity_bucket",  # CCNet per-language LM terciles
    "x_containment",    # asymmetric containment near-dup (prefix-indexed)
    "st_perplexity",    # maintained-LM quality monitor (batch-fold twin)
    "x_snapshot_scan",  # manifest-resolved reads: time travel + stats + bloom
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    registry.load_all()
    spark = get_spark("bench")

    # warmup: prime JVM, codegen, parquet footer cache
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    # ... and the Python worker pool: fork one worker per core and import
    # pandas/numpy in each. Without this, the first wide pandas stage pays
    # ~32 simultaneous cold worker spawns (measured 15-60 s of wall clock
    # depending on contention); a real cluster's long-lived executors keep
    # their workers warm, so this mirrors steady-state.
    import pandas as _pd

    def _warm(it):
        for pdf in it:
            yield pdf

    spark.range(0, 3200, 1, numPartitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).mapInPandas(
        _warm, schema="id long"
    ).count()

    # untimed full lap: every headline plan's codegen/JIT paths (window,
    # rollup, pandas stages) get compiled before anything is timed. Round 1's
    # driver run recorded 6-9 s for sub-second queries because whichever
    # query FIRST hit a heavy new stage shape paid its JIT inside the timed
    # region; best-of-2 doesn't recover that in a cold, contended env.
    for name in HEADLINE:
        registry.QUERIES[name](spark, sf_dir).count()
        spark.catalog.clearCache()

    # min across 3 FULL LAPS (round 6; was min-of-3 back-to-back reps):
    # measured hypervisor CPU steal on this box arrives in multi-second
    # bursts (vmstat st column: 0-13% over 5s windows; one burst inflated
    # a 0.3s query 3x across all of its consecutive reps). Back-to-back
    # reps all sit inside one burst; lap-interleaving separates a query's
    # reps by minutes, so the per-query min across laps sees clean air
    # unless steal covers the entire run. Per-lap cache clearing keeps
    # the discipline: no query's persisted intermediates (minhash/jaccard
    # shingle tables) may serve a later rep or bill a later query.
    def _stat_ticks() -> tuple[int, int] | None:
        try:
            with open("/proc/stat") as f:
                parts = f.readline().split()
            vals = [int(x) for x in parts[1:]]
            return sum(vals), vals[7] if len(vals) > 7 else 0  # total, steal
        except Exception:
            return None

    # fixed calibration job: ~1 s of pure 32-way JVM compute (hash + agg
    # over a generated range — no I/O, no Python). Its time moves with
    # the MACHINE (noisy-neighbor core/memory-bandwidth contention that
    # steal ticks don't see moved this box 1.0->1.4x within one day,
    # round 6), not with this repo's code — so value/calib_sec is the
    # environment-normalized figure to compare across rounds.
    def _calibrate() -> float:
        # a SHUFFLE, not a codegen loop: pure register-resident compute
        # stayed fast (0.13 s) through a contention episode that inflated
        # every real query 1.4x, so the calibration must touch the same
        # resources the queries do — shuffle write/read + hash aggregation
        # over a million keys
        t0 = time.perf_counter()
        (
            spark.range(0, 20_000_000, 1, 32)
            .selectExpr("id % 1000000 as k", "shiftright(xxhash64(id), 32) as v")
            .groupBy("k")
            .sum("v")
            .count()
        )
        return time.perf_counter() - t0

    _calibrate()  # once untimed (codegen)
    calib = min(_calibrate() for _ in range(2))

    stat0 = _stat_ticks()
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for _ in range(3):
        for name in HEADLINE:
            t0 = time.perf_counter()
            df = registry.QUERIES[name](spark, sf_dir)
            rows[name] = df.count()
            elapsed = time.perf_counter() - t0
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
            spark.catalog.clearCache()
    for name in HEADLINE:
        timings[name] = round(timings[name], 3)
        print(f"# {name}: {timings[name]:.3f}s ({rows[name]} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "calib_sec": round(calib, 3),
    }
    # hypervisor CPU steal during the timed laps, so each recorded run
    # carries its own noise context: this box measures 0% at idle but has
    # shown 33-36% under full 32-core load when a noisy neighbor is active
    # — a 1.4x total on a stolen run is environment, not plan regression.
    stat1 = _stat_ticks()
    if stat0 and stat1 and stat1[0] > stat0[0]:
        out["steal_pct"] = round(
            100.0 * (stat1[1] - stat0[1]) / (stat1[0] - stat0[0]), 1
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
