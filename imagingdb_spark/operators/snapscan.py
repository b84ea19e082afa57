"""Snapshot-format reads under the DuckDB oracle (round-9 verdict item
3): every other snapshot test pins the format by parity/crash-matrix
tests, but until this module no REGISTERED query read THROUGH
``snapshot_read`` — so manifest-tree resolution, group/file stats
pruning, bloom keep-semantics, time travel, and the delete rewrite were
outside the oracle's eye. ``x_snapshot_scan`` closes that: it builds a
deterministic snapshot table FROM the documents parquet (two clustered
append commits + one targeted ``snapshot_delete``), then answers three
legs through the manifest path, each of which DuckDB recomputes from
the raw documents table:

- ``pre``  — time travel to v2 (pre-delete) with a doc_id range
  predicate: exercises pinned-version resolution + group/file min-max
  pruning; oracle = the plain range filter.
- ``post`` — the same range at the tip (post-delete): exercises the
  delete rewrite's manifest (carried-by-reference entries + rewritten
  files); oracle = range filter minus the deleted language.
- ``point`` — an ``=`` probe on an md5 column (high-cardinality,
  UNCLUSTERED — zone maps keep everything, only the bloom sidecars
  skip): exercises bloom keep-semantics end to end; oracle = the md5
  recomputed in SQL.

Any drift between the resolved file list and the predicate semantics —
a group wrongly skipped, a bloom false-absence, a delete that dropped a
carried file — shows up as a row/hash mismatch in the driver's
CORRECTNESS record, not just a unit-test failure.

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

# the three legs' constants — shared by the Spark path and the oracle SQL
_LO, _HI = 100, 400
_DEL_LANG = "de"
_PROBE_DOC = "137"  # md5(cast(doc_id as string)) probe; non-'de' at all SFs


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


def _scan_table(spark: SparkSession, sf_dir: str) -> str:
    """Build-or-reuse the deterministic snapshot table for ``sf_dir``.
    Reuse is validated by version count + tip row count (the build is
    deterministic, so a valid table IS the right table); anything else
    is wiped and rebuilt via a fresh-dir + rename swap so a crashed
    build can never be mistaken for a finished one."""
    tag = hashlib.sha256(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    t = os.path.join(tempfile.gettempdir(), f"imagingdb_snapscan_{tag}")
    docs = table(spark, sf_dir, "documents")
    want_rows = docs.filter(F.col("lang") != _DEL_LANG).count()
    if S.snapshot_exists(t):
        vs = S._versions(t)
        if vs == [1, 2, 3] and S._read_manifest_raw(t, 3)["rows"] == want_rows:
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
    SELECT 'point' AS ver, doc_id, lang, source
    FROM d
    WHERE md5(CAST(doc_id AS VARCHAR)) = md5('{_PROBE_DOC}')
      AND lang <> '{_DEL_LANG}'
    """,
)
def x_snapshot_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _scan_table(spark, sf_dir)
    rng = [("doc_id", ">=", _LO), ("doc_id", "<", _HI)]
    probe = hashlib.md5(_PROBE_DOC.encode()).hexdigest()
    pre = S.snapshot_read(spark, t, version=2, where=rng)
    post = S.snapshot_read(spark, t, where=rng)
    point = S.snapshot_read(spark, t, where=[("h", "=", probe)])
    out = None
    for ver, df in (("pre", pre), ("post", post), ("point", point)):
        leg = df.select(
            F.lit(ver).alias("ver"), "doc_id", "lang", "source"
        )
        out = leg if out is None else out.unionByName(leg)
    return out
