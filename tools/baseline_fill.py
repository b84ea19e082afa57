"""Measure every oracle-checked query on Spark (local[32]) and DuckDB at a
given SF and rewrite the per-query table at the end of BASELINE.md.

Usage: python tools/baseline_fill.py [sf_dir]
"""

from __future__ import annotations

import re
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import duckdb

from imagingdb_spark import registry
from imagingdb_spark.catalog import TPCH_TABLES
from imagingdb_spark.session import get_spark

MARKER = "| query | sf | spark (s) | duckdb oracle (s) | ratio | notes |"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf = sf_dir.rstrip("/").split("sf")[-1]
    registry.load_all()
    spark = get_spark()

    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # Warm both engines (JIT, file cache) on one cheap query, and the
    # python worker pool (one worker per core imports pandas — the cold
    # fork+import otherwise lands on the first wide pandas stage; see
    # SCALING.md finding 8).
    next(iter(registry.QUERIES.values()))(spark, sf_dir).count()
    spark.range(0, 3200, 1, numPartitions=32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    # min-of-N per query: a single sample in an 80+-query sweep picks up
    # one-off GC pauses / worker-pool churn that recorded 4x-off rows two
    # rounds running (r2 x_dedup_simhash 16.75s-vs-4s, r3 x_bm25
    # 15.9s-vs-3.5s). min over independent same-state runs (cache cleared
    # before each) is the standard noise-robust estimator.
    reps = 2
    lines = []
    total_s = total_d = 0.0
    for name in sorted(registry.QUERIES):
        fn = registry.QUERIES[name]
        samples = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).count()
            samples.append(time.time() - t0)
        spark_s = min(samples)
        spark.catalog.clearCache()
        if name in registry.ORACLE:
            d_samples = []
            for _ in range(reps):
                t0 = time.time()
                con.execute(registry.ORACLE[name]).fetchall()
                d_samples.append(time.time() - t0)
            duck_s = min(d_samples)
            ratio = f"{spark_s / duck_s:.1f}x" if duck_s > 0 else "-"
            duck_cell = f"{duck_s:.2f}"
            total_d += duck_s
        else:
            duck_cell, ratio = "n/a (rows-only)", "-"
        total_s += spark_s
        lines.append(f"| {name} | {sf} | {spark_s:.2f} | {duck_cell} | {ratio} | |")
        print(lines[-1], flush=True)
    lines.append(
        f"| **total** | {sf} | **{total_s:.2f}** | **{total_d:.2f}** "
        f"(oracle-checked only) | | single process, local[32], warm |"
    )

    path = Path("/root/repo/BASELINE.md")
    text = path.read_text()
    head = text.split(MARKER)[0]
    table = MARKER + "\n|---|---|---|---|---|---|\n" + "\n".join(lines) + "\n"
    note = (
        "\nSpark per-query times are the MIN of 2 independent runs (cache\n"
        "cleared before each) of full plan build + execution in a warm\n"
        "session — one-sample sweeps recorded 4x-off rows from one-off GC\n"
        "pauses two rounds running. DuckDB (same min-of-2) is the\n"
        "single-node embedded oracle on identical parquet; Spark carries\n"
        "JVM task-scheduling overhead at this tiny SF that amortizes away\n"
        "at real scale.\n"
    )
    path.write_text(head + table + note)
    print("BASELINE.md updated")


if __name__ == "__main__":
    main()
