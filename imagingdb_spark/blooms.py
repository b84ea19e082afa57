"""Bloom-filter sidecar indexes for snapshot tables — point-lookup file
skipping where min/max zone maps cannot prune.

Why: footer min/max stats (snapshots.py) prune range/point predicates on
CLUSTERED columns, but a point lookup on a high-cardinality UNCLUSTERED
key — `sha256 = ?` over an append-ordered frames table, a dataset_serial
probe before a clustering compact has run — matches every file's
[min, max] and prunes nothing. The reference gets these lookups for free
from Postgres b-trees (db_operations.py `filter_by(sha256=...)` shape);
at 100 TB the Spark-native answer is the Databricks/Iceberg bloom-index
design (public): a per-file Bloom filter on the key, consulted at scan
planning, so a probe opens only the files whose filter claims the key.

Shape:

- **Build** (distributed): after a commit lands its data files, one Spark
  job reads back JUST the indexed columns (`input_file_name()` +
  `applyInPandas` per file) and writes one parquet **sidecar directory
  per commit** under `_blooms/<commit-id>/` with rows
  ``(file, col, n, m, k, bits)``. Data pages are read once, column-
  pruned, on executors — the driver never sees row values.
- **Manifest**: each file entry gains ``bloom: {sc, cols}`` pointing at
  its commit's sidecar; the manifest itself carries the table property
  ``blooms: [col, ...]`` (set once via ``snapshot_commit(...,
  bloom_columns=[...])``, carried forward like ``txns``) so every later
  writer — append, RMW, MERGE, compact — keeps the index fresh without
  the caller re-stating it.
- **Probe** (driver, planning time): `_resolve_pruned` hands candidates
  that survived min/max here; for ``=``/``in`` conjuncts on indexed
  columns the candidate's sidecar rows are loaded (pyarrow, filtered to
  the candidate file names — never the whole index) and definite
  negatives are dropped. False positives only ever KEEP a file, and the
  predicate is re-applied in Spark, so pruning stays an optimization,
  never the semantics.

Hashing is double-hashing (Kirsch–Mitzenmacher, public) over a 16-byte
BLAKE2b digest of a type-tagged canonical encoding — pure-Python on both
sides, so the probe needs no Spark job and no JVM-hash parity. Sizing
targets ~1% FPP (m ≈ 9.6 n bits, k = 7), capped at 1 MiB of bits per
(file, column) — past ~875k distinct keys per file the FPP degrades
gracefully instead of the sidecar growing unboundedly.

Nulls are not inserted (no equality predicate matches NULL); bool/float
values are not indexable (bool prunes nothing useful, float equality is
a caller bug); a configured column missing from a commit's schema simply
leaves that commit's files bloom-less for it (conservative: kept).
"""

from __future__ import annotations

import os
from hashlib import blake2b

import numpy as np

BLOOM_DIR = "_blooms"

_K = 7  # optimal hash count for the ~1% FPP target
_BITS_PER_KEY = 10  # ceil(-ln(0.01) / ln(2)^2) = 9.585, rounded up
_MAX_BITS = 8 * 1024 * 1024 * 1  # 1 MiB of bits per (file, column)
_CACHE_CAP = 4096  # probe-side (sidecar, file, col) entries


def _encode(v) -> bytes | None:
    """Type-tagged canonical bytes, or None when the value does not
    participate in the index (null / bool / float / exotic)."""
    if v is None or isinstance(v, (bool, np.bool_)):
        return None
    if isinstance(v, str):
        return b"s:" + v.encode("utf-8")
    if isinstance(v, (int, np.integer)):
        return b"i:%d" % int(v)
    if isinstance(v, (bytes, bytearray)):
        return b"b:" + bytes(v)
    if isinstance(v, float):
        return None
    return None


def _positions(data: bytes, m: int) -> list[int]:
    d = blake2b(data, digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1  # odd: full-cycle stride
    return [((h1 + i * h2) % m) for i in range(_K)]


def _size_for(n: int) -> int:
    """Filter size in bits for n keys: multiple of 8, >= 64, capped."""
    return max(64, min(_MAX_BITS, ((n * _BITS_PER_KEY + 7) // 8) * 8))


def _build_filter(values) -> tuple[int, int, bytes, int]:
    """(m, k, bits, n_indexed) over an iterable of python values."""
    encoded = [e for e in (map(_encode, values)) if e is not None]
    m = _size_for(len(encoded))
    bits = np.zeros(m // 8, dtype=np.uint8)
    for e in encoded:
        for p in _positions(e, m):
            bits[p >> 3] |= 1 << (p & 7)
    return m, _K, bits.tobytes(), len(encoded)


def _might_contain(m: int, k: int, bits: bytes, value) -> bool:
    """False only when the filter PROVES the value absent. Unindexable
    values (float/bool/None) conservatively match."""
    e = _encode(value)
    if e is None:
        return True
    if k != _K:  # written by a future vintage with a different k: keep
        return True
    arr = memoryview(bits)
    for p in _positions(e, m):
        if not (arr[p >> 3] >> (p & 7)) & 1:
            return False
    return True


# ---------------------------------------------------------------------------
# Build side (one Spark job per commit, executors only)
# ---------------------------------------------------------------------------


def build_sidecar(
    spark,
    table_dir: str,
    rel_dir: str,
    file_entries: list[dict],
    columns: list[str],
) -> None:
    """Build bloom sidecars for a commit's freshly written files and stamp
    each entry with ``bloom: {sc, cols}``. ``rel_dir`` is the commit's
    ``data/<commit-id>`` directory; the sidecar lands in
    ``_blooms/<commit-id>``. Columns absent from the written schema are
    skipped (their absence keeps files conservative, never wrong)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    if not file_entries or not columns:
        return
    out_dir = os.path.join(table_dir, rel_dir)
    df = spark.read.parquet(out_dir)
    present = [c for c in columns if c in df.columns]
    if not present:
        return
    schema = StructType(
        [
            StructField("file", StringType()),
            StructField("col", StringType()),
            StructField("n", LongType()),
            StructField("m", LongType()),
            StructField("k", IntegerType()),
            StructField("bits", BinaryType()),
        ]
    )

    def _per_file(pdf):
        import pandas as pd

        fname = os.path.basename(pdf["__f"].iloc[0])
        rows = []
        for c in present:
            m, k, bits, n = _build_filter(pdf[c].tolist())
            rows.append((fname, c, n, m, k, bits))
        return pd.DataFrame(
            rows, columns=["file", "col", "n", "m", "k", "bits"]
        )

    commit_id = os.path.basename(rel_dir)
    sc_rel = os.path.join(BLOOM_DIR, commit_id)
    (
        df.select(F.input_file_name().alias("__f"), *present)
        .groupBy("__f")
        .applyInPandas(_per_file, schema)
        .write.mode("overwrite")
        .parquet(os.path.join(table_dir, sc_rel))
    )
    for fe in file_entries:
        fe["bloom"] = {"sc": sc_rel, "cols": present}


# ---------------------------------------------------------------------------
# Probe side (driver, planning time)
# ---------------------------------------------------------------------------

_cache: dict[tuple, tuple[int, int, bytes] | None] = {}


def _load_sidecar_rows(
    table_dir: str, sc_rel: str, files: list[str], cols: list[str]
) -> None:
    """Populate the probe cache for (sidecar, file, col) candidates in one
    filtered pyarrow read — row-group stats keep it from materializing
    the whole index. A missing/corrupt sidecar caches None (keep)."""
    import pyarrow.parquet as pq

    keys = [(table_dir, sc_rel, f, c) for f in files for c in cols]
    todo = [k for k in keys if k not in _cache]
    if not todo:
        return
    try:
        t = pq.read_table(
            os.path.join(table_dir, sc_rel),
            filters=[("file", "in", sorted({k[2] for k in todo}))],
        )
        found = {}
        for file, col, m, k, bits in zip(
            t["file"].to_pylist(),
            t["col"].to_pylist(),
            t["m"].to_pylist(),
            t["k"].to_pylist(),
            t["bits"].to_pylist(),
        ):
            found[(file, col)] = (m, k, bits)
    except Exception:
        found = {}
    if len(_cache) + len(todo) > _CACHE_CAP:
        _cache.clear()
    for key in todo:
        _cache[key] = found.get((key[2], key[3]))


def prune_candidates(
    table_dir: str, entries: list[dict], where: list, plan: dict | None = None
) -> list[dict]:
    """Drop entries whose bloom filters PROVE no ``=``/``in`` conjunct
    value is present. Entries without a filter for a probed column are
    kept; range conjuncts are ignored (min/max already handled them)."""
    probes = [
        (col, [v] if op == "=" else list(v))
        for col, op, v in where
        if op in ("=", "in")
    ]
    if not probes or not any(e.get("bloom") for e in entries):
        if plan is not None:
            plan["files_bloom_dropped"] = 0
        return entries
    # batch the sidecar loads: one filtered read per (sidecar, col set)
    by_sc: dict[str, list[str]] = {}
    for e in entries:
        b = e.get("bloom")
        if b:
            by_sc.setdefault(b["sc"], []).append(
                os.path.basename(e["path"])
            )
    probe_cols = [c for c, _ in probes]
    for sc_rel, files in by_sc.items():
        _load_sidecar_rows(table_dir, sc_rel, files, probe_cols)
    kept = []
    for e in entries:
        b = e.get("bloom")
        if not b:
            kept.append(e)
            continue
        fname = os.path.basename(e["path"])
        alive = True
        for col, values in probes:
            if col not in b["cols"]:
                continue
            flt = _cache.get((table_dir, b["sc"], fname, col))
            if flt is None:
                continue  # sidecar row unavailable: keep
            if not any(_might_contain(*flt, v) for v in values):
                alive = False  # every probed value provably absent
                break
        if alive:
            kept.append(e)
    if plan is not None:
        plan["files_bloom_dropped"] = len(entries) - len(kept)
    return kept


def live_sidecars(manifests_entries) -> set[str]:
    """Relative sidecar dirs referenced by any of the given file-entry
    lists — vacuum's retention set."""
    out: set[str] = set()
    for entries in manifests_entries:
        for fe in entries:
            b = fe.get("bloom")
            if b:
                out.add(b["sc"])
    return out
