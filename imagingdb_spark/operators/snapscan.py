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
- ``upd``  — the same range at v5 (post-``snapshot_update`` redacting
  the sources of a third language): exercises the UPDATE rewrite's
  manifest (carried entries + updated files) read through the
  surviving DV refs; oracle = the dv leg with a CASE expression.
- ``point`` — an ``=`` probe on an md5 column (high-cardinality,
  UNCLUSTERED — zone maps keep everything, only the bloom sidecars
  skip) at the DV+update-bearing v5: exercises bloom keep-semantics
  reading THROUGH a deletion vector after an update rebuilt touched
  files' sidecars; oracle = the md5 recomputed in SQL.
- ``mrg`` — the tip (v6, post-``snapshot_merge`` with the round-11
  file-PRUNED strategy): a content-addressed batch updates ~1/16 of
  the surviving docs' sources and inserts a disjoint-id-space band;
  the leg reads the update range AND the inserted band through the
  merge commit's manifest (rewritten candidates + carried refs +
  fresh insert files). Oracle = CASE over the raw docs plus the
  recomputed insert band. Any pruning unsoundness — a candidate file
  wrongly carried, an insert dropped, an update misplaced — lands
  here as a row/hash mismatch.

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
import json
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
_INS_OFFSET = 1_000_000  # merge leg (v6): inserted band's disjoint id space


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
    # v6: file-pruned MERGE — a content-addressed batch (identical on
    # both engines) updating ~1/16 of the SURVIVING docs and inserting
    # a disjoint-id band; deleted languages are excluded from the
    # update slice so the merge cannot resurrect taken-down rows
    def _h1(prefix):
        return F.substring(
            F.md5(F.concat(F.lit(prefix), F.col("doc_id").cast("string"))),
            1, 1,
        )

    upd = docs.filter(
        (_h1("mu-") == "0") & ~F.col("lang").isin(_DEL_LANG, _DV_LANG)
    ).select(
        "doc_id", "lang", F.lit("merged").alias("source"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    ins = docs.filter(_h1("mi-") == "0").select(
        (F.col("doc_id") + _INS_OFFSET).alias("doc_id"),
        "lang",
        F.lit("fresh").alias("source"),
        F.md5((F.col("doc_id") + _INS_OFFSET).cast("string")).alias("h"),
    )
    S.snapshot_merge(spark, t, upd.unionByName(ins), "doc_id")


_FP_NAME = "source_fingerprint.json"


def _source_sig(sf_dir: str) -> dict:
    """Driver-side signature of the documents source: (size, mtime_ns)
    per physical file. r12 (guide §1.4/§6): the previous fingerprint was
    a full Spark scan+collect of per-lang counts PER INVOCATION — ~0.4 s
    of pure revalidation job on every bench lap, and strictly WEAKER
    than this: a regenerated dataset with identical per-lang counts but
    different rows passed the count check; it cannot produce identical
    mtime_ns. Validation stays per-invocation — only its cost moved from
    a cluster job to a handful of stat() calls, the same source-of-truth
    a manifest-format table (Iceberg/Delta) uses to detect foreign
    rewrites of files it tracks."""
    p = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    files = [p]
    if os.path.isdir(p):
        files = sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(p)
            for f in fs
            if not f.startswith((".", "_"))
        )
    sig = {}
    for q in files:
        st = os.stat(q)
        sig[os.path.relpath(q, os.path.dirname(p))] = [
            st.st_size, st.st_mtime_ns,
        ]
    return sig


def _fp_valid(table_dir: str, sig: dict, want_versions: list[int]) -> bool:
    """Cached-build validation, all driver-side file metadata: the stored
    source signature must equal the CURRENT one and the version chain
    must be complete (a crashed rename can't pass: the fingerprint is
    written inside the build dir before the atomic swap)."""
    try:
        with open(os.path.join(table_dir, _FP_NAME)) as f:
            rec = json.load(f)
    except (OSError, ValueError):
        return False
    return rec.get("sig") == sig and S._versions(table_dir) == want_versions


def _scan_table(spark: SparkSession, sf_dir: str) -> str:
    """Build-or-reuse the deterministic snapshot table for ``sf_dir``.
    Reuse is validated per invocation by a SOURCE file-stat signature
    (size + mtime_ns of every documents parquet file, recorded at build
    time) plus a complete version chain — a regenerated dataset at the
    same path can never be mistaken for the cached build (round-9
    ADVICE; r12 moved the check from a per-invocation Spark scan job to
    driver-side stat() calls, see ``_source_sig``). Anything invalid is
    wiped and rebuilt via a fresh-dir + rename swap so a crashed build
    can never be mistaken for a finished one."""
    sig = _source_sig(sf_dir)
    tag = hashlib.sha256(
        f"{os.path.abspath(sf_dir)}:dv-upd-mrg:statsig".encode()
    ).hexdigest()[:12]
    t = os.path.join(tempfile.gettempdir(), f"imagingdb_snapscan_{tag}")
    if S.snapshot_exists(t):
        if _fp_valid(t, sig, [1, 2, 3, 4, 5, 6]):
            return t
        shutil.rmtree(t, ignore_errors=True)
    build = f"{t}.build.{uuid.uuid4().hex}"
    try:
        _build(spark, sf_dir, build)
        with open(os.path.join(build, _FP_NAME), "w") as f:
            json.dump({"sig": sig}, f)
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
    UNION ALL
    SELECT 'mrg' AS ver, doc_id, lang,
           CASE WHEN substr(md5('mu-' || CAST(doc_id AS VARCHAR)), 1, 1)
                     = '0' THEN 'merged'
                WHEN lang = '{_UPD_LANG}' THEN 'redacted'
                ELSE source END AS source
    FROM d
    WHERE doc_id >= {_LO} AND doc_id < {_HI}
      AND lang NOT IN ('{_DEL_LANG}', '{_DV_LANG}')
    UNION ALL
    SELECT 'mrg' AS ver, doc_id + {_INS_OFFSET} AS doc_id, lang,
           'fresh' AS source
    FROM d
    WHERE substr(md5('mi-' || CAST(doc_id AS VARCHAR)), 1, 1) = '0'
    """,
)
def x_snapshot_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L12/L13/L14/S10: snapshot-format reads under the oracle — six
    legs through snapshot_read over a deterministic table built from
    documents (time travel, CoW delete, deletion-vector delete,
    targeted UPDATE, bloom point probe, file-pruned MERGE), each leg
    recomputed by DuckDB from the raw parquet. See the module
    docstring for the leg map."""
    t = _scan_table(spark, sf_dir)
    rng = [("doc_id", ">=", _LO), ("doc_id", "<", _HI)]
    probe = hashlib.md5(_PROBE_DOC.encode()).hexdigest()
    # ONE reader memo shared by the seven resolutions (r12, guide §1.4):
    # legs whose pruned file list / sidecar ref set is identical share
    # one py4j reader build instead of seven independent ones; each leg
    # still resolves its own manifest and prunes independently — the
    # product surface under test is unchanged.
    cache: dict = {}
    pre = S.snapshot_read(spark, t, version=2, where=rng, scan_cache=cache)
    post = S.snapshot_read(spark, t, version=3, where=rng, scan_cache=cache)
    dv = S.snapshot_read(spark, t, version=4, where=rng, scan_cache=cache)
    upd = S.snapshot_read(spark, t, version=5, where=rng, scan_cache=cache)
    point = S.snapshot_read(
        spark, t, version=5, where=[("h", "=", probe)], scan_cache=cache
    )
    mrg = S.snapshot_read(spark, t, where=rng, scan_cache=cache).unionByName(
        S.snapshot_read(
            spark, t, where=[("doc_id", ">=", _INS_OFFSET)], scan_cache=cache
        )
    )
    out = None
    for ver, df in (
        ("pre", pre), ("post", post), ("dv", dv), ("upd", upd),
        ("point", point), ("mrg", mrg),
    ):
        leg = df.select(
            F.lit(ver).alias("ver"), "doc_id", "lang", "source"
        )
        out = leg if out is None else out.unionByName(leg)
    return out


# ---------------------------------------------------------------------------
# x_catalog_scan: the ATOMIC MULTI-TABLE catalog read path under the same
# oracle (round-11 task 4). x_snapshot_scan covers single-table manifest
# reads; until this query, catalog_read / catalog_manifest — the
# cross-table-consistent read the reference's Postgres catalog gives its
# clients (db_operations.py's dataset + frames tables resolved in one
# transaction) — had crash/race tests but no registered oracle query.

_CAT_DEL_LANG = "zh"  # catalog-level DV takedown target (disjoint from
#                       the snapscan legs' de/fr/es)


def _catalog_table(spark: SparkSession, sf_dir: str) -> str:
    """Build-or-reuse a deterministic two-table catalog from documents:
    ``docs`` (doc_id, lang, source; clustered on doc_id) and ``meta``
    (lang, n_docs) committed ATOMICALLY (catalog_commit v1), then one
    atomic multi-table takedown of one language in deletion-vector mode
    (catalog_delete v2) — the FK-chain erasure shape at catalog scope.
    Same fingerprint + fresh-dir/rename caching discipline as
    ``_scan_table``."""
    from imagingdb_spark import snapcatalog as C

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    # same driver-side stat-signature validation as _scan_table (r12):
    # the old per-lang count collect was a full Spark scan job per
    # invocation and weaker evidence than file size + mtime_ns
    sig = _source_sig(sf_dir)
    tag = hashlib.sha256(
        f"{os.path.abspath(sf_dir)}:cat-dv:statsig".encode()
    ).hexdigest()[:12]
    cat = os.path.join(tempfile.gettempdir(), f"imagingdb_catscan_{tag}")

    def _valid(c: str) -> bool:
        try:
            with open(os.path.join(c, _FP_NAME)) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            return False
        return rec.get("sig") == sig and C.catalog_versions(c) == [1, 2]

    if C.catalog_exists(cat):
        if _valid(cat):
            return cat
        shutil.rmtree(cat, ignore_errors=True)
    build = f"{cat}.build.{uuid.uuid4().hex}"
    try:
        def _build_tables(views: dict) -> dict:
            return {
                "docs": docs.repartitionByRange(4, "doc_id")
                .sortWithinPartitions("doc_id"),
                "meta": docs.groupBy("lang").agg(
                    F.count(F.lit(1)).alias("n_docs")
                ),
            }

        C.catalog_commit(
            spark, build, _build_tables,
            keys={"docs": ["doc_id"], "meta": ["lang"]},
        )
        C.catalog_delete(
            spark, build,
            {
                "docs": [("lang", "=", _CAT_DEL_LANG)],
                "meta": [("lang", "=", _CAT_DEL_LANG)],
            },
            mode="dv",
        )
        with open(os.path.join(build, _FP_NAME), "w") as f:
            json.dump({"sig": sig}, f)
        try:
            os.rename(build, cat)
        except OSError:
            shutil.rmtree(build, ignore_errors=True)
    except BaseException:
        shutil.rmtree(build, ignore_errors=True)
        raise
    return cat


@query(
    "x_catalog_scan",
    oracle=f"""
    WITH d AS (SELECT doc_id, lang FROM documents)
    SELECT 'docs_v1' AS ver, lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM d GROUP BY lang
    UNION ALL
    SELECT 'docs_v2' AS ver, lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM d WHERE lang <> '{_CAT_DEL_LANG}' GROUP BY lang
    UNION ALL
    SELECT 'meta_v1' AS ver, lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM d GROUP BY lang
    UNION ALL
    SELECT 'meta_v2' AS ver, lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM d WHERE lang <> '{_CAT_DEL_LANG}' GROUP BY lang
    UNION ALL
    SELECT 'probe_v2' AS ver, lang, doc_id AS n
    FROM d
    WHERE lang <> '{_CAT_DEL_LANG}' AND doc_id >= {_LO} AND doc_id < {_HI}
    """,
)
def x_catalog_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L8/L11/S7: catalog-isolated reads under the oracle — five legs
    through ``catalog_read`` over a two-table catalog built atomically
    from documents and taken down (one language, both tables, ONE
    atomic commit) in deletion-vector mode:

    - ``docs_v1``/``meta_v1`` — time travel to the pre-takedown commit:
      both tables must still answer with the full corpus (the
      legal-hold window), mutually consistent from one pinned commit.
    - ``docs_v2``/``meta_v2`` — the tip: the docs DV sidecars
      anti-apply inside ``_manifest_df`` and the meta row is gone —
      the whole chain disappeared in one version step.
    - ``probe_v2`` — a row-level range read at the tip (one row per
      surviving doc): a single resurfaced or over-deleted row flips
      the value hash, catching positional DV errors aggregate legs
      could mask.

    DuckDB recomputes every leg from the raw parquet."""
    from imagingdb_spark import snapcatalog as C

    cat = _catalog_table(spark, sf_dir)
    commit1 = C.catalog_manifest(cat, 1)
    commit2 = C.catalog_manifest(cat, 2)
    # shared reader memo across the five legs (r12, guide §1.4) — same
    # discipline as x_snapshot_scan's seven legs
    cache: dict = {}

    def _counts(ver: str, commit: dict) -> DataFrame:
        return (
            C.read_table_at(spark, cat, commit, "docs", scan_cache=cache)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .select(F.lit(ver).alias("ver"), "lang", "n")
        )

    def _meta(ver: str, commit: dict) -> DataFrame:
        return C.read_table_at(
            spark, cat, commit, "meta", scan_cache=cache
        ).select(
            F.lit(ver).alias("ver"),
            "lang",
            F.col("n_docs").cast("bigint").alias("n"),
        )

    probe = C.read_table_at(
        spark, cat, commit2, "docs",
        where=[("doc_id", ">=", _LO), ("doc_id", "<", _HI)],
        scan_cache=cache,
    ).select(
        F.lit("probe_v2").alias("ver"),
        "lang",
        F.col("doc_id").cast("bigint").alias("n"),
    )
    return (
        _counts("docs_v1", commit1)
        .unionByName(_counts("docs_v2", commit2))
        .unionByName(_meta("meta_v1", commit1))
        .unionByName(_meta("meta_v2", commit2))
        .unionByName(probe)
    )
