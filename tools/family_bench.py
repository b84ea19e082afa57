"""Per-family scaling bench (VERDICT r5 item 7): time the superlinear-risk
query families — dedup / LM / ANN, whose cost is driven by candidate-pair
counts and vocabulary size rather than row count — at one scaled SF dir and
print ONE JSON line. Run it at sf0.1 / sf1.0 / sf3.0 / sf10.0 and fit
per-family exponents (see tools/fit_exponents.py); results land in
SCALING.md's scaling table.

Usage: python tools/family_bench.py <sf_dir> [query ...]

Timing discipline matches bench.py: one untimed full lap first (JIT +
codegen + parquet footers + warm Python workers), then min-of-2 timed reps
with the cache cleared between every rep so persisted intermediates never
bill against the wrong rep or query.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from imagingdb_spark import registry
from imagingdb_spark.session import get_spark

# The five families VERDICT r5 item 7 names: pair-count-driven (minhash
# bands, asymmetric PPJoin), vocabulary-driven (tfidf), codebook/cell-driven
# (ivf ann), and cluster-blocked (semdedup).
DEFAULT = [
    "x_dedup_minhash",
    "x_dedup_incremental",
    "x_tfidf",
    "x_ann_ivf",
    "x_semdedup",
]


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    registry.load_all()
    spark = get_spark("family_bench")

    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    import pandas as _pd  # noqa: F401

    def _warm(it):
        for pdf in it:
            yield pdf

    spark.range(
        0, 3200, 1, numPartitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ).mapInPandas(_warm, schema="id long").count()

    for name in names:
        registry.QUERIES[name](spark, sf_dir).count()
        spark.catalog.clearCache()

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in names:
        fn = registry.QUERIES[name]
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            elapsed = time.perf_counter() - t0
            best = elapsed if best is None else min(best, elapsed)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        rows[name] = n
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "family_scaling",
                "sf": sf,
                "queries": timings,
                "rows": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
