"""Sinks (SURVEY.md §2.1 S7-S9): metadata CSV/JSON writers and the blob
sink, as distributed writes.

Reference shapes: frames_meta → CSV + global meta → JSON on download
(data_downloader.py:201-215); PNG frames written via thread/process pools
(local_storage.py:85-136, s3_storage.py:72-145); catalog inserts staged in a
transaction (db_operations.py:150-223 → ingest.idempotent_append).

Spark replaces the pools with task parallelism: a blob write is
foreachPartition over (file_name, payload) rows, each task writing its
partition's objects — same fan-out the reference hand-builds with
ThreadPoolExecutor (data_storage.py:243-253), but scheduled/retried by Spark
and scaling with the cluster instead of one machine's threads.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, Row


def write_frames_meta_csv(frames_meta: DataFrame, dest_dir: str) -> None:
    """S9: frames_meta → CSV (data_downloader.py:210-215). Distributed
    writer; one part per partition (coalesce upstream if a single file is
    required — a 100 TB export should NOT be one file)."""
    frames_meta.write.mode("overwrite").option("header", True).csv(
        os.path.join(dest_dir, "frames_meta.csv")
    )


def write_global_meta_json(global_meta: DataFrame, dest_dir: str) -> None:
    """S9: global metadata → JSON lines (data_downloader.py:201-209 writes a
    single dict; the distributed form writes one JSON object per dataset
    row)."""
    global_meta.write.mode("overwrite").json(
        os.path.join(dest_dir, "global_metadata.json")
    )


def write_blobs(frames: DataFrame, dest_dir: str, payload_col: str = "payload",
                name_col: str = "file_name", overwrite: bool = False) -> None:
    """S8: blob sink — one object per frame row, written task-side via
    foreachPartition (the reference's pool fan-out, local_storage.py:105-106
    / s3_storage.py:113-145, as Spark tasks). Existing objects are skipped
    unless overwrite — the reference's idempotent write-skip
    (local_storage.py:108-120, s3_storage.py:88-104).

    Local-FS implementation here; an object-store deployment swaps the two
    io calls for its client, created once per partition (the reference
    re-creates clients per thread for safety, s3_storage.py:181-183 — same
    idea)."""
    os.makedirs(dest_dir, exist_ok=True)

    def write_partition(rows: Iterator[Row]) -> None:
        from pyspark import TaskContext

        # temp name unique PER TASK ATTEMPT: with speculative execution or a
        # zombie task racing a retry, a shared temp name would let two
        # attempts interleave writes and publish a torn object
        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx is not None else os.getpid()
        for row in rows:
            path = os.path.join(dest_dir, row[name_col])
            if not overwrite and os.path.exists(path):
                continue
            tmp = f"{path}.inprogress.{attempt}"
            with open(tmp, "wb") as f:
                f.write(bytes(row[payload_col]))
            os.replace(tmp, path)  # atomic publish: no torn reads

    frames.select(name_col, payload_col).foreachPartition(write_partition)


def collect_global_meta_dict(global_meta: DataFrame) -> dict:
    """Driver-side convenience matching the reference's single-dict JSON
    (json_operations.write_json_file input): valid only for a single-dataset
    query (one row)."""
    rows = global_meta.collect()
    if len(rows) != 1:
        raise ValueError(f"expected exactly one global-meta row, got {len(rows)}")
    return {k: v for k, v in rows[0].asDict().items()}


def json_contains(doc: str | None, needle: dict) -> bool:
    """Recursive JSONB `@>` containment (Postgres semantics): every
    key/value in `needle` is present in `doc`, descending into nested
    objects; arrays contain all needle elements (any order, duplicates
    allowed). The reference only ever uses flat single-key containment
    (jsonb_queries.ipynb cell 4) — get_json_object covers that in the query
    layer; this UDF is the full fallback for nested needles (SURVEY.md §4).
    Pure function so it is unit-testable; register with
    F.udf(json_contains_curried(needle), "boolean") at the call site."""
    if doc is None:
        return False
    try:
        parsed = json.loads(doc)
    except (ValueError, TypeError):
        return False
    return _contains(parsed, needle)


def _contains(hay, needle) -> bool:
    if isinstance(needle, dict):
        return isinstance(hay, dict) and all(
            k in hay and _contains(hay[k], v) for k, v in needle.items()
        )
    if isinstance(needle, list):
        return isinstance(hay, list) and all(
            any(_contains(h, n) for h in hay) for n in needle
        )
    return hay == needle
