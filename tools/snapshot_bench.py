"""Snapshot-format commit-cost micro-benchmark: measure append latency
against tables with growing LIVE FILE COUNTS to substantiate the
SCALING.md claim that commit cost is O(delta) + O(manifest JSON copy),
never O(table data).

For each table size (files already live), time (a) a 1-file append via
snapshot_commit, (b) the txn-marker replay no-op, and record the manifest
byte size. The append's data work is constant, so any growth isolates the
manifest-copy term — the known flat-manifest ceiling the module documents.

Usage: python tools/snapshot_bench.py
Prints ONE JSON line; results land in tools/SNAPSHOT_BENCH.json.
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

from imagingdb_spark import snapshots as S
from imagingdb_spark.session import get_spark

SIZES = [10, 100, 1000]
REPS = 3


def main() -> None:
    spark = get_spark("snapshot_bench")
    one = spark.range(1000).selectExpr("id as k", "string(id) as v")
    one.count()  # warm

    results = {}
    root = tempfile.mkdtemp(prefix="snapbench_")
    try:
        for n_files in SIZES:
            t = os.path.join(root, f"t{n_files}")
            # seed n_files live files in ONE commit (n_files partitions,
            # enough rows that round-robin leaves no partition empty)
            seed = spark.range(n_files * 100).selectExpr(
                "id as k", "string(id) as v"
            )
            S.snapshot_commit(
                spark, t, seed.repartition(n_files), mode="overwrite"
            )
            tip = S.snapshot_versions(t)[-1]
            assert tip["n_files"] >= n_files * 0.9, tip

            append_s = []
            for r in range(REPS):
                t0 = time.time()
                S.snapshot_commit(spark, t, one.coalesce(1))
                append_s.append(time.time() - t0)
            replay_s = []
            S.snapshot_commit(spark, t, one.coalesce(1), txn=("bench", 0))
            for r in range(REPS):
                t0 = time.time()
                S.snapshot_commit(spark, t, one.coalesce(1), txn=("bench", 0))
                replay_s.append(time.time() - t0)
            v = S._versions(t)[-1]
            manifest_bytes = os.path.getsize(
                os.path.join(t, S.MANIFEST_DIR, S._FMT.format(v))
            )
            results[str(n_files)] = {
                "append_s": round(min(append_s), 4),
                "replay_noop_s": round(min(replay_s), 4),
                "manifest_bytes": manifest_bytes,
                "live_files": S.snapshot_versions(t)[-1]["n_files"],
            }
    finally:
        shutil.rmtree(root, ignore_errors=True)

    line = json.dumps({"metric": "snapshot_commit_cost", "by_live_files": results})
    print(line)
    (Path(__file__).parent / "SNAPSHOT_BENCH.json").write_text(line + "\n")


if __name__ == "__main__":
    main()
