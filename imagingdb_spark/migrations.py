"""Schema evolution for the Parquet catalog — the Spark-first analog of the
reference's Alembic migration chain.

Reference history mirrored here (alembic/versions/):
- 7a7422f19234_add_checksums.py:21-24 — add nullable ``sha256`` to
  file_global and frames;
- bae28d7da970_added_file_name_to_file_global.py:21 — add nullable
  ``file_name`` to file_global;
- 8e0d2514fd1f_change_s3_to_storage_dir.py:21-25 — rename
  ``s3_dir`` → ``storage_dir`` on file_global.

Philosophy (100 TB): you do NOT rewrite the table to add a column. The
evolution contract has three layers, cheapest first:

1. **Additive evolution is free** — Parquet + ``mergeSchema`` resolves
   mixed-vintage files at read time; files predating an added column
   yield nulls for it. No data movement, ever.
2. **Renames and defaults are a logical view** — ``upgrade_df`` rewrites
   the merged DataFrame to the current schema declaratively
   (coalesce old/new name, fill default) so every downstream query sees
   ONE schema. Still no data movement; Catalyst folds the projection
   into the scan.
3. **Physical migration is opt-in** — ``migrate_in_place`` rewrites the
   files to the current schema with compaction's validate-before-swap
   discipline (layout.py), for when the old files should actually go
   away (e.g. before handing the table to a reader without the
   migration chain). This is the only layer that scales with data size.

Applied-revision tracking lives in ``<table>/_migrations.json`` — the
underscore prefix makes Spark's file index ignore it (the ``_SUCCESS``
convention), so the sidecar rides inside the table directory like
Alembic's ``alembic_version`` table rides inside the database.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATE_FILE = "_migrations.json"


@dataclass(frozen=True)
class AddColumn:
    """op.add_column analog: new nullable column; ``default`` (a Python
    literal) backfills rows that predate the column — Alembic's
    server_default. With default=None old rows read as null, matching the
    reference's nullable=True adds exactly."""

    name: str
    dtype: str  # Spark DDL type string, e.g. "string", "bigint"
    default: object | None = None


@dataclass(frozen=True)
class RenameColumn:
    """add-new + drop-old collapsed to its intent (the reference's
    8e0d2514fd1f does it as add storage_dir / drop s3_dir — which LOSES
    the old values; a rename preserves them, strictly better and what
    the commit message says it meant)."""

    old: str
    new: str


@dataclass(frozen=True)
class DropColumn:
    name: str


@dataclass(frozen=True)
class Migration:
    """One revision: ordered ops against one table."""

    revision: str
    down_revision: str | None
    table: str
    ops: tuple = field(default_factory=tuple)


def _chain_order(migrations: list[Migration]) -> list[Migration]:
    """Order a migration set by its down_revision linked list (Alembic
    semantics: single linear history; raises on forks/cycles/gaps)."""
    by_parent = {m.down_revision: m for m in migrations}
    if len(by_parent) != len(migrations):
        raise ValueError("migration history forks: duplicate down_revision")
    revs = {m.revision for m in migrations}
    roots = [m for m in migrations if m.down_revision not in revs]
    if len(roots) != 1:
        raise ValueError(f"migration history must have one root, got {len(roots)}")
    out = [roots[0]]
    while out[-1].revision in by_parent:
        out.append(by_parent[out[-1].revision])
    if len(out) != len(migrations):
        raise ValueError("migration history has a cycle or gap")
    return out


def upgrade_df(df: DataFrame, migrations: list[Migration]) -> DataFrame:
    """Layer 2: apply the chain logically — a projection, no data motion.

    Mixed-vintage semantics per op:
    - AddColumn: column absent (all files predate it) → lit(default);
      present → coalesce(col, default) so pre-migration files' nulls
      backfill while post-migration writers may still write null
      explicitly ONLY when default is None (when a default exists,
      null is indistinguishable from 'old row' at read time — the
      documented trade of read-time evolution; migrate_in_place erases
      the ambiguity by materializing the backfill).
    - RenameColumn: both names present (mixed vintage under mergeSchema)
      → coalesce(new, old) under the new name, old dropped; only old →
      renamed; only new → untouched.
    - DropColumn: dropped if present.
    """
    for m in _chain_order(migrations):
        for op in m.ops:
            if isinstance(op, AddColumn):
                if op.name not in df.columns:
                    df = df.withColumn(
                        op.name, F.lit(op.default).cast(op.dtype)
                    )
                elif op.default is not None:
                    df = df.withColumn(
                        op.name,
                        F.coalesce(
                            F.col(op.name), F.lit(op.default).cast(op.dtype)
                        ),
                    )
            elif isinstance(op, RenameColumn):
                if op.old in df.columns and op.new in df.columns:
                    df = df.withColumn(
                        op.new, F.coalesce(F.col(op.new), F.col(op.old))
                    ).drop(op.old)
                elif op.old in df.columns:
                    df = df.withColumnRenamed(op.old, op.new)
            elif isinstance(op, DropColumn):
                if op.name in df.columns:
                    df = df.drop(op.name)
            else:
                raise TypeError(f"unknown migration op: {op!r}")
    return df


def downgrade_df(df: DataFrame, migrations: list[Migration],
                 to_revision: str | None = None) -> DataFrame:
    """Alembic-parity downgrade: walk the chain BACKWARDS to (and
    excluding) ``to_revision`` (None = all the way to the baseline),
    inverting each op — RenameColumn reverses losslessly, AddColumn
    drops the column (its data is lost, exactly like ``op.drop_column``
    in the reference's downgrade functions, e.g.
    alembic/versions/7a7422f19234:28-31). DropColumn cannot be inverted
    (the data is gone) and raises — the reference has no DropColumn-only
    migration either; its one drop rides a rename we model as
    RenameColumn."""
    chain = _chain_order(migrations)
    if to_revision is not None and to_revision not in {m.revision for m in chain}:
        raise ValueError(f"unknown revision {to_revision!r}")
    for m in reversed(chain):
        if m.revision == to_revision:
            break
        for op in reversed(m.ops):
            if isinstance(op, AddColumn):
                if op.name in df.columns:
                    df = df.drop(op.name)
            elif isinstance(op, RenameColumn):
                if op.new in df.columns:
                    df = df.withColumnRenamed(op.new, op.old)
            elif isinstance(op, DropColumn):
                raise ValueError(
                    f"cannot downgrade through DropColumn({op.name!r}): "
                    "the dropped data no longer exists"
                )
            else:
                raise TypeError(f"unknown migration op: {op!r}")
    return df


def read_evolved(
    spark: SparkSession, path: str, migrations: list[Migration]
) -> DataFrame:
    """Layers 1+2: one queryable view over mixed-vintage Parquet.

    mergeSchema unions the footers of every file (a metadata read — the
    data itself is untouched), then upgrade_df normalizes to the current
    schema. Old-schema files + new-schema appends → one DataFrame."""
    df = spark.read.option("mergeSchema", "true").parquet(path)
    return upgrade_df(df, migrations)


def applied_revisions(path: str) -> list[str]:
    state = os.path.join(path, STATE_FILE)
    if not os.path.exists(state):
        return []
    with open(state) as f:
        return json.load(f)["applied"]


def pending_migrations(path: str, migrations: list[Migration]) -> list[Migration]:
    done = set(applied_revisions(path))
    return [m for m in _chain_order(migrations) if m.revision not in done]


def migrate_in_place(
    spark: SparkSession, path: str, migrations: list[Migration]
) -> dict:
    """Layer 3: physically rewrite the table to the current schema.

    Same crash-safety ordering as layout.compact_parquet (ADVICE r2 #2):
    write the migrated copy to a temp dir, validate its row count against
    the source BEFORE touching the live table, two-rename swap, delete
    the old directory only after the post-swap read proves the new table
    readable. The applied-revision sidecar is written into the NEW copy
    before the swap, so a table that swapped successfully always knows
    its revision."""
    chain = _chain_order(migrations)
    pend = pending_migrations(path, migrations)
    if not pend:
        return {"applied": [], "rows": None}
    src = spark.read.option("mergeSchema", "true").parquet(path)
    rows_before = src.count()
    migrated = upgrade_df(src, migrations)
    tmp = f"{path}.migrate.{uuid.uuid4().hex[:8]}"
    migrated.write.mode("overwrite").parquet(tmp)
    rows_tmp = spark.read.parquet(tmp).count()
    if rows_tmp != rows_before:
        shutil.rmtree(tmp)
        raise RuntimeError(
            f"migration rewrite of {path} dropped rows "
            f"({rows_before} -> {rows_tmp}); old table left untouched"
        )
    with open(os.path.join(tmp, STATE_FILE), "w") as f:
        json.dump({"applied": [m.revision for m in chain]}, f)
    old = f"{path}.old.{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    try:
        spark.read.parquet(path).schema
    except Exception:
        os.rename(path, tmp)
        os.rename(old, path)
        raise
    shutil.rmtree(old)
    return {"applied": [m.revision for m in pend], "rows": rows_before}


# ---------------------------------------------------------------------------
# The reference's own history, re-declared (SURVEY.md §2; VERDICT r3 item 3)
# ---------------------------------------------------------------------------

FILE_GLOBAL_MIGRATIONS: list[Migration] = [
    Migration(
        revision="7a7422f19234",  # add checksums (7a7422f19234:21-24)
        down_revision=None,
        table="file_global",
        ops=(AddColumn("sha256", "string"),),
    ),
    Migration(
        revision="bae28d7da970",  # add file_name (bae28d7da970:21)
        down_revision="7a7422f19234",
        table="file_global",
        ops=(AddColumn("file_name", "string"),),
    ),
    Migration(
        revision="8e0d2514fd1f",  # s3_dir -> storage_dir (8e0d2514fd1f:21-25)
        down_revision="bae28d7da970",
        table="file_global",
        ops=(RenameColumn("s3_dir", "storage_dir"),),
    ),
]

FRAMES_MIGRATIONS: list[Migration] = [
    Migration(
        revision="7a7422f19234",  # add checksums (7a7422f19234:22-23)
        down_revision=None,
        table="frames",
        ops=(AddColumn("sha256", "string"),),
    ),
]
