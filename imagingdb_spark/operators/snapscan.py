"""Snapshot-format reads under the DuckDB oracle (round-9 verdict item
3; DV leg added round 10): every other snapshot test pins the format by
parity/crash-matrix tests, but until this module no REGISTERED query
read THROUGH ``snapshot_read`` — so manifest-tree resolution, group/file
stats pruning, bloom keep-semantics, time travel, and the delete
rewrite were outside the oracle's eye. ``x_snapshot_scan`` closes that:
it builds a deterministic snapshot table FROM the documents parquet
(two clustered append commits + one copy-on-write ``snapshot_delete`` +
one merge-on-read ``snapshot_delete(mode="dv")`` + one targeted
``snapshot_update``), then answers five legs through the manifest
path, each of which DuckDB recomputes from the raw documents table:

- ``pre``  — time travel to v2 (pre-delete) with a doc_id range
  predicate: exercises pinned-version resolution + group/file min-max
  pruning; oracle = the plain range filter.
- ``post`` — the same range at v3 (post-CoW-delete): exercises the
  delete rewrite's manifest (carried-by-reference entries + rewritten
  files); oracle = range filter minus the CoW-deleted language.
- ``dv``   — the same range at v4 (post-DV-delete, pinned): exercises
  the positional-delete sidecar anti-apply (``_read_entries``'s
  broadcast anti-join on path+row_index) composed with predicate
  pruning; oracle = range filter minus BOTH deleted languages.
- ``upd``  — the same range at the tip (v5, post-``snapshot_update``
  redacting the sources of a third language): exercises the UPDATE
  rewrite's manifest (carried entries + updated files) read through
  the surviving DV refs; oracle = the dv leg with a CASE expression.
- ``point`` — an ``=`` probe on an md5 column (high-cardinality,
  UNCLUSTERED — zone maps keep everything, only the bloom sidecars
  skip) at the DV+update-bearing tip: exercises bloom keep-semantics
  reading THROUGH a deletion vector after an update rebuilt touched
  files' sidecars; oracle = the md5 recomputed in SQL.

Any drift between the resolved file list, the DV positions, and the
predicate semantics — a group wrongly skipped, a bloom false-absence, a
delete that dropped a carried file, a DV row resurfacing — shows up as
a row/hash mismatch in the driver's CORRECTNESS record, not just a
unit-test failure.

Reference parity: the reference's dataset reads always go through the
Postgres catalog then S3 (imaging_db/database/db_operations.py +
imaging_db/filestorage/s3_storage.py); snapshot_read is this repo's
catalog-resolved read, so it belongs under the same oracle the rest of
the query surface answers to.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imagingdb_spark.catalog import table
from imagingdb_spark.registry import query
from imagingdb_spark import snapshots as S

# the five legs' constants — shared by the Spark path and the oracle SQL
_LO, _HI = 100, 400
_DEL_LANG = "de"  # copy-on-write delete (v3)
_DV_LANG = "fr"  # merge-on-read / deletion-vector delete (v4)
_UPD_LANG = "es"  # targeted UPDATE (v5): source -> 'redacted'
_PROBE_DOC = "137"  # md5(cast(doc_id as string)) probe; never de/fr at any SF


def _build(spark: SparkSession, sf_dir: str, t: str) -> None:
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source")
        .withColumn("h", F.md5(F.col("doc_id").cast("string")))
    )

    def _clustered(df: DataFrame) -> DataFrame:
        # range-cluster each commit on doc_id so file stats carve the id
        # space into prunable slices (what a maintenance compact would do)
        return df.repartitionByRange(4, "doc_id").sortWithinPartitions(
            "doc_id"
        )

    first = docs.filter(F.pmod("doc_id", F.lit(3)) != 0)
    rest = docs.filter(F.pmod("doc_id", F.lit(3)) == 0)
    S.snapshot_commit(spark, t, _clustered(first), bloom_columns=["h"])
    S.snapshot_commit(spark, t, _clustered(rest))
    S.snapshot_delete(spark, t, [("lang", "=", _DEL_LANG)])
    # lang is UNCLUSTERED on the doc_id layout: CoW would rewrite ~every
    # file; the DV commit writes positions only — the exact case the
    # merge-on-read path exists for, now under the oracle
    S.snapshot_delete(spark, t, [("lang", "=", _DV_LANG)], mode="dv")
    # the DML triple's third leg, on the same unclustered column — the
    # rewrite reads THROUGH v4's deletion vectors and materializes them
    # on the files it touches
    S.snapshot_update(
        spark, t, [("lang", "=", _UPD_LANG)], {"source": "'redacted'"}
    )


def _scan_table(spark: SparkSession, sf_dir: str) -> str:
    """Build-or-reuse the deterministic snapshot table for ``sf_dir``.
    Reuse is validated by version count + tip row count, and the tmpdir
    tag folds a SOURCE fingerprint (total documents rows) alongside the
    path hash — a regenerated dataset at the same path with a different
    shape can never be mistaken for the cached build (round-9 ADVICE).
    Anything invalid is wiped and rebuilt via a fresh-dir + rename swap
    so a crashed build can never be mistaken for a finished one."""
    docs = table(spark, sf_dir, "documents")
    counts = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(counts.values())
    want_rows = total - counts.get(_DEL_LANG, 0) - counts.get(_DV_LANG, 0)
    tag = hashlib.sha256(
        f"{os.path.abspath(sf_dir)}:{total}:dv-upd".encode()
    ).hexdigest()[:12]
    t = os.path.join(tempfile.gettempdir(), f"imagingdb_snapscan_{tag}")
    if S.snapshot_exists(t):
        vs = S._versions(t)
        if vs == [1, 2, 3, 4, 5] and S._read_manifest_raw(t, 5)["rows"] == want_rows:
            return t
        shutil.rmtree(t, ignore_errors=True)
    build = f"{t}.build.{uuid.uuid4().hex}"
    try:
        _build(spark, sf_dir, build)
        try:
            os.rename(build, t)
        except OSError:
            # a concurrent builder won the swap; its table is identical
            shutil.rmtree(build, ignore_errors=True)
    except BaseException:
        shutil.rmtree(build, ignore_errors=True)
        raise
    return t


@query(
    "x_snapshot_scan",
    oracle=f"""
    WITH d AS (SELECT doc_id, lang, source FROM documents)
    SELECT 'pre' AS ver, doc_id, lang, source
    FROM d WHERE doc_id >= {_LO} AND doc_id < {_HI}
    UNION ALL
    SELECT 'post' AS ver, doc_id, lang, source
    FROM d
    WHERE doc_id >= {_LO} AND doc_id < {_HI} AND lang <> '{_DEL_LANG}'
    UNION ALL
    SELECT 'dv' AS ver, doc_id, lang, source
    FROM d
    WHERE doc_id >= {_LO} AND doc_id < {_HI}
      AND lang NOT IN ('{_DEL_LANG}', '{_DV_LANG}')
    UNION ALL
    SELECT 'upd' AS ver, doc_id, lang,
           CASE WHEN lang = '{_UPD_LANG}' THEN 'redacted' ELSE source END
             AS source
    FROM d
    WHERE doc_id >= {_LO} AND doc_id < {_HI}
      AND lang NOT IN ('{_DEL_LANG}', '{_DV_LANG}')
    UNION ALL
    SELECT 'point' AS ver, doc_id, lang,
           CASE WHEN lang = '{_UPD_LANG}' THEN 'redacted' ELSE source END
             AS source
    FROM d
    WHERE md5(CAST(doc_id AS VARCHAR)) = md5('{_PROBE_DOC}')
      AND lang NOT IN ('{_DEL_LANG}', '{_DV_LANG}')
    """,
)
def x_snapshot_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L12/L13/L14: snapshot-format reads under the oracle — five legs
    through snapshot_read over a deterministic table built from
    documents (time travel, CoW delete, deletion-vector delete,
    targeted UPDATE, bloom point probe), each leg recomputed by DuckDB
    from the raw parquet. See the module docstring for the leg map."""
    t = _scan_table(spark, sf_dir)
    rng = [("doc_id", ">=", _LO), ("doc_id", "<", _HI)]
    probe = hashlib.md5(_PROBE_DOC.encode()).hexdigest()
    pre = S.snapshot_read(spark, t, version=2, where=rng)
    post = S.snapshot_read(spark, t, version=3, where=rng)
    dv = S.snapshot_read(spark, t, version=4, where=rng)
    upd = S.snapshot_read(spark, t, where=rng)
    point = S.snapshot_read(spark, t, where=[("h", "=", probe)])
    out = None
    for ver, df in (
        ("pre", pre), ("post", post), ("dv", dv), ("upd", upd),
        ("point", point),
    ):
        leg = df.select(
            F.lit(ver).alias("ver"), "doc_id", "lang", "source"
        )
        out = leg if out is None else out.unionByName(leg)
    return out
