"""Atomic-catalog commit-cost micro-benchmark: substantiate that one
multi-table catalog commit stays O(tables × group refs) — never O(live
files), never O(catalog history) — as uploads accumulate.

Measures, at growing commit counts over a 3-table catalog (the imaging
shape: one parent row + one summary row + N child rows per commit):
commit latency, the commit OBJECT's byte size (the thing the publish
hard-link makes visible), and a fully-converged replay (all deltas
empty: no publish). The commit object embeds one manifest of ≤32 group
refs per table, so its size must stay FLAT while history and live files
grow — the catalog-level extension of the round-6 two-level-tree result
(tools/SNAPSHOT_BENCH.json).

Usage: python tools/catalog_bench.py
Prints ONE JSON line; results land in tools/CATALOG_BENCH.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from imagingdb_spark import snapcatalog as C
from imagingdb_spark.session import get_spark


def main() -> None:
    spark = get_spark("catalog_bench", cpus="8")
    work = Path(tempfile.mkdtemp(prefix="catalog_bench_"))
    cat = str(work / "cat")
    keys = {"parent": ["k"], "summary": ["k"], "child": ["k"]}

    def build_for(lo: int, n_child: int):
        def build(views):
            return {
                "parent": spark.createDataFrame(
                    [(lo, f"p{lo}")], "k long, v string"
                ),
                "summary": spark.createDataFrame(
                    [(lo, n_child)], "k long, n long"
                ),
                "child": spark.createDataFrame(
                    [(lo * 1000 + i, lo) for i in range(n_child)],
                    "k long, parent long",
                ),
            }

        return build

    rows = []
    try:
        checkpoints = {10: None, 50: None, 100: None}
        t_first = None
        for i in range(1, 101):
            t0 = time.perf_counter()
            v, _ = C.catalog_commit(
                spark, cat, build_for(i, 20), keys
            )
            dt = time.perf_counter() - t0
            if i == 1:
                t_first = dt
            if i in checkpoints:
                commit_bytes = os.path.getsize(
                    os.path.join(cat, C.COMMITS_DIR, C._FMT.format(v))
                )
                # converged replay: identical rows -> all deltas empty,
                # no new version published
                t0 = time.perf_counter()
                v2, deltas = C.catalog_commit(
                    spark, cat, build_for(i, 20), keys
                )
                replay_s = time.perf_counter() - t0
                assert v2 == v and all(
                    d.count() == 0 for d in deltas.values()
                )
                rows.append(
                    {
                        "commits": i,
                        "live_child_rows": i * 20,
                        "commit_s": round(dt, 3),
                        "commit_bytes": commit_bytes,
                        "replay_noop_s": round(replay_s, 3),
                        "version": v,
                    }
                )
        out = {
            "metric": "catalog_commit_cost",
            "tables": 3,
            "first_commit_s": round(t_first, 3),
            "rows": rows,
        }
        line = json.dumps(out)
        print(line)
        (Path(__file__).parent / "CATALOG_BENCH.json").write_text(line + "\n")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
