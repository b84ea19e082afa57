"""Imaging-domain API parity layer — the reference's public call surface
(db_operations.py) re-expressed as DataFrame plans over the 4 catalog tables.

Every function takes DataFrames (loaded by the caller from wherever the
catalog lives) and returns a DataFrame plan — no hidden session state, no
collect inside the library. The reference's semantics are kept exactly,
including error behavior (polymorphic channel lists, missing-dataset
asserts); its *inefficiencies* are not (client-side pandas residual
filtering at db_operations.py:350-388 stays in the Spark plan instead).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

# Columns returned by get_frames_meta, mirroring DF_NAMES
# (utils/meta_utils.py:16-22) — the reference drops the surrogate ids
# (db_operations.py:393-396).
FRAMES_META_COLS = [
    "channel_idx",
    "slice_idx",
    "time_idx",
    "channel_name",
    "file_name",
    "pos_idx",
    "sha256",
]


def serial_to_date_time(serial: Column) -> Column:
    """Derive date_time from a `<ID>-YYYY-MM-DD-HH-MM-SS-<SSSS>` serial —
    `_serial_to_date_time` (dataset.py:9-18), done declaratively so it can
    run at ingest for millions of rows. Returns null (not an exception) for
    malformed serials; pair with validate_serial for CHECK semantics."""
    p = F.split(serial, "-")
    # F.get (not getItem): null past the end instead of ANSI-mode index error
    return F.try_to_timestamp(
        F.concat_ws(
            " ",
            F.concat_ws("-", F.get(p, 1), F.get(p, 2), F.get(p, 3)),
            F.concat_ws(":", F.get(p, 4), F.get(p, 5), F.get(p, 6)),
        )
    )


def validate_serial(serial: Column) -> Column:
    """Boolean predicate form of `validate_id` (cli_utils.py:4-41): project
    prefix + 8 dash fields + numeric ranges + parseable timestamp. The
    reference raises per-row AssertionError; as a column predicate it can
    gate ingest batches (filter) or assert (count of invalid == 0)."""
    parts = F.split(serial, "-")
    return (
        (F.size(parts) == 8)
        & serial.rlike(r"^[A-Za-z0-9]+-\d{4}-\d{2}-\d{2}-\d{2}-\d{2}-\d{2}-\d{4}$")
        & F.get(parts, 1).try_cast("int").between(2000, 3000)
        & F.get(parts, 2).try_cast("int").between(1, 12)
        & F.get(parts, 3).try_cast("int").between(1, 31)
        & F.get(parts, 4).try_cast("int").between(0, 23)
        & F.get(parts, 5).try_cast("int").between(0, 59)
        & F.get(parts, 6).try_cast("int").between(0, 59)
        & serial_to_date_time(serial).isNotNull()
    )


def get_datasets(
    data_set: DataFrame,
    search_dict: dict | None = None,
) -> DataFrame:
    """`get_datasets` (db_operations.py:53-90): conditional filter chaining +
    always ORDER BY dataset_serial. Supported keys exactly as the reference:
    dataset_serial / microscope / description (substring match), start_date /
    end_date (inclusive), frames (bool equality).

    The chain builds ONE logical plan; Catalyst folds all predicates into
    the scan (the reference ships them to Postgres one .filter() at a time,
    same idea)."""
    search_dict = search_dict or {}
    df = data_set
    for col in ("dataset_serial", "microscope", "description"):
        if col in search_dict:
            df = df.filter(F.col(col).contains(search_dict[col]))
    if "start_date" in search_dict:
        df = df.filter(F.col("date_time") >= F.lit(search_dict["start_date"]))
    if "end_date" in search_dict:
        df = df.filter(F.col("date_time") <= F.lit(search_dict["end_date"]))
    if "frames" in search_dict:
        df = df.filter(F.col("frames") == bool(search_dict["frames"]))
    return df.orderBy("dataset_serial")


def assert_unique_id(data_set: DataFrame, dataset_serial: str) -> None:
    """`assert_unique_id` (db_operations.py:106-117): count-must-be-zero.
    Distributed form: filtered limit(1) count — short-circuits at the first
    matching row instead of scanning everything."""
    n = data_set.filter(F.col("dataset_serial") == dataset_serial).limit(1).count()
    if n > 0:
        raise AssertionError(
            f"Dataset {dataset_serial} already exists in the catalog"
        )


def _frames_join(
    frames: DataFrame, frames_global: DataFrame, data_set: DataFrame
) -> DataFrame:
    """J1: Frames ⋈ FramesGlobal ⋈ DataSet (db_operations.py:311-314,
    459-463). data_set / frames_global are catalog-sized (one row per
    dataset) — tiny next to frames — so both are broadcast: the fact table
    never shuffles for this join."""
    return frames.join(
        F.broadcast(frames_global),
        frames.frames_global_id == frames_global.id,
    ).join(
        F.broadcast(data_set),
        frames_global.dataset_id == data_set.id,
    )


class DatasetNotFoundError(LookupError):
    """`.one()` failure surface (db_operations.py:299-300)."""


def get_frames_meta(
    data_set: DataFrame,
    frames_global: DataFrame,
    frames: DataFrame,
    dataset_serial: str,
) -> DataFrame:
    """`get_frames_meta` (db_operations.py:426-474): all frame rows of one
    dataset, ordered by file_name, surrogate ids dropped (393-396)."""
    joined = _frames_join(frames, frames_global, data_set).filter(
        F.col("dataset_serial") == dataset_serial
    )
    return joined.select(*FRAMES_META_COLS).orderBy("file_name")


def select_frames_subset(
    frames_meta: DataFrame,
    channels=None,
    slices=None,
    times=None,
    positions=None,
) -> DataFrame:
    """`_get_frames_subset` IN-list semantics (db_operations.py:327-397) with
    the reference's polymorphic channel handling (355-367): all-str channel
    lists match channel_name, all-int match channel_idx, mixed raises
    TypeError. Unlike the reference (pandas isin after a full fetch —
    db_operations.py:350-388) the predicates stay in the plan and push down
    to the parquet scan."""
    df = frames_meta
    if channels is not None:
        channels = list(channels)
        if all(isinstance(c, str) for c in channels):
            df = df.filter(F.col("channel_name").isin(channels))
        elif all(isinstance(c, int) and not isinstance(c, bool) for c in channels):
            df = df.filter(F.col("channel_idx").isin(channels))
        else:
            raise TypeError(
                "channels must be all str (channel_name) or all int (channel_idx), "
                f"got {channels}"
            )
    if slices is not None:
        df = df.filter(F.col("slice_idx").isin(list(slices)))
    if times is not None:
        df = df.filter(F.col("time_idx").isin(list(times)))
    if positions is not None:
        df = df.filter(F.col("pos_idx").isin(list(positions)))
    return df


def get_filenames(
    data_set: DataFrame,
    frames_global: DataFrame,
    frames: DataFrame,
    file_global: DataFrame,
    dataset_serial: str,
    positions=None,
    times=None,
    channels=None,
    slices=None,
) -> tuple[str, list[str]]:
    """`get_filenames` (db_operations.py:276-325): storage dir + file names
    for one dataset — the join every download starts from.

    frames=False datasets resolve through FileGlobal ⋈ DataSet (`.one()`
    each, db_operations.py:300-307); frames=True through the J1 join with
    the polymorphic subset filters (P4). Driver-side return value (a str +
    list) is the reference's own API boundary — the result is one dataset's
    file listing, catalog-sized, not fact-table-sized; the plan beneath it
    is fully pushed down."""
    ds_rows = (
        data_set.filter(F.col("dataset_serial") == dataset_serial)
        .select("id", "frames")
        .limit(2)
        .collect()
    )
    if len(ds_rows) != 1:
        raise DatasetNotFoundError(
            f"expected exactly one dataset for {dataset_serial}, got {len(ds_rows)}"
        )
    if not ds_rows[0]["frames"]:
        fg_rows = (
            file_global.join(
                F.broadcast(
                    data_set.filter(
                        F.col("dataset_serial") == dataset_serial
                    ).select(F.col("id").alias("_ds_id"))
                ),
                file_global.dataset_id == F.col("_ds_id"),
            )
            .select("storage_dir", "file_name")
            .limit(2)
            .collect()
        )
        if len(fg_rows) != 1:
            raise DatasetNotFoundError(
                f"expected exactly one file_global row for {dataset_serial}, "
                f"got {len(fg_rows)}"
            )
        return fg_rows[0]["storage_dir"], [fg_rows[0]["file_name"]]
    joined = _frames_join(frames, frames_global, data_set).filter(
        F.col("dataset_serial") == dataset_serial
    )
    subset = select_frames_subset(
        joined.select(*FRAMES_META_COLS, "storage_dir"),
        channels=channels,
        slices=slices,
        times=times,
        positions=positions,
    )
    rows = subset.select("storage_dir", "file_name").orderBy("file_name").collect()
    if not rows:
        raise AssertionError(
            f"No frames in dataset {dataset_serial} match the given constraints"
        )
    return rows[0]["storage_dir"], [r["file_name"] for r in rows]


def get_global_meta(
    data_set: DataFrame, frames_global: DataFrame, dataset_serial: str
) -> DataFrame:
    """`_get_global_meta` (db_operations.py:399-424): the frames_global row
    for a dataset (1:1), without lazy per-attribute navigation."""
    return (
        frames_global.join(
            F.broadcast(
                data_set.filter(F.col("dataset_serial") == dataset_serial).select(
                    F.col("id").alias("_ds_id")
                )
            ),
            frames_global.dataset_id == F.col("_ds_id"),
        )
        .drop("_ds_id")
    )


def compute_global_meta(frames: DataFrame) -> DataFrame:
    """`set_global_meta` (file_splitter.py:127-148): the per-dataset global
    summary — nbr_frames + countDistinct of every index dimension — as one
    grouped aggregation over the frames table (A3/A4). This is the scalable
    replacement for the reference's imperative per-dataset loop."""
    return frames.groupBy("frames_global_id").agg(
        F.count(F.lit(1)).alias("nbr_frames"),
        F.countDistinct("slice_idx").alias("nbr_slices"),
        F.countDistinct("channel_idx").alias("nbr_channels"),
        F.countDistinct("time_idx").alias("nbr_timepoints"),
        F.countDistinct("pos_idx").alias("nbr_positions"),
    )


def stack_coordinates(frames_meta: DataFrame) -> DataFrame:
    """Dense 5-D stack coordinates by rank of sorted unique index values
    (data_storage.py:225-241: `np.where(unique_ids == row.idx)`), NOT the
    raw indices — indices need not start at 0 nor be contiguous
    (data_storage.py:49-55). dense_rank() - 1 per dimension, partitioned by
    dataset so each dataset's coordinate space is independent."""

    def coord(idx_col: str) -> Column:
        w = Window.partitionBy("frames_global_id").orderBy(idx_col)
        return (F.dense_rank().over(w) - 1).alias(idx_col.replace("_idx", "_coord"))

    return frames_meta.select(
        "*",
        coord("channel_idx"),
        coord("slice_idx"),
        coord("time_idx"),
        coord("pos_idx"),
    )


@dataclass
class StackShape:
    """Squeezed stack shape + surviving dim order (`squeeze_stack`,
    data_storage.py:68-85): dims with a single unique value are dropped from
    the XYGZCTP order string."""

    shape: tuple
    dim_order: str


def infer_stack_shape(
    frames_meta: DataFrame, im_height: int, im_width: int, im_colors: int
) -> StackShape:
    """`make_stack_from_meta` shape inference (data_storage.py:34-66) for a
    single dataset's frames_meta: X, Y, G from the global row; Z, C, T, P
    from countDistinct of the index columns. Driver-side scalar result (one
    aggregate row) — the stack itself stays distributed (see
    multimodal.assemble_stack for the applyInPandas path)."""
    row = frames_meta.agg(
        F.countDistinct("slice_idx").alias("z"),
        F.countDistinct("channel_idx").alias("c"),
        F.countDistinct("time_idx").alias("t"),
        F.countDistinct("pos_idx").alias("p"),
    ).collect()[0]
    dims = [
        ("X", im_height),
        ("Y", im_width),
        ("G", im_colors),
        ("Z", row["z"]),
        ("C", row["c"]),
        ("T", row["t"]),
        ("P", row["p"]),
    ]
    kept = [(name, n) for name, n in dims if n > 1]
    return StackShape(
        shape=tuple(n for _, n in kept), dim_order="".join(name for name, _ in kept)
    )
