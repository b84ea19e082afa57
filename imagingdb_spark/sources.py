"""Ingest sources: filename parsers + TIFF splitter plumbing (SURVEY.md §2.1
S4/S5, §2.8 F1/F9).

The reference parses frame indices out of file names one row at a time with
Python string ops (images/filename_parsers.py) and splits multi-page TIFFs
with per-page loops (images/*_splitter.py). Here the parsers are pure column
expressions (JVM, codegen, zero shuffle) applied to whole DataFrames of file
names, and the splitter is an Arrow-batched mapInPandas whose page decoder is
injected (tifffile is not in this container — see multimodal.decode_png for
the same stub pattern).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Path helpers (F9: filename_parsers.py:20,49; s3_storage.py:63-70)
# ---------------------------------------------------------------------------


def basename(path: Column) -> Column:
    """os.path.basename as an expression: text after the last '/'."""
    return F.element_at(F.split(path, "/"), -1)


def strip_ext(name: Column) -> Column:
    """Drop the last dot-suffix (the reference slices [:-4]; this handles
    variable-length extensions like .tiff too)."""
    return F.regexp_replace(name, r"\.[^.]*$", "")


def natural_sort_key(name: Column) -> Column:
    """natsort-equivalent ordering key (tiffolder_splitter.py:168-170): the
    first integer run in the name, then the name itself as tiebreak."""
    return F.struct(
        F.coalesce(
            F.regexp_extract(name, r"(\d+)", 1).try_cast("long"), F.lit(0)
        ).alias("num"),
        name.alias("name"),
    )


# ---------------------------------------------------------------------------
# Filename parsers (filename_parsers.py, dispatched by name at
# tiffolder_splitter.py:162-166 / aux_utils.py:5-23)
# ---------------------------------------------------------------------------


def parse_idx_from_name(file_name: Column, order: str = "cztp") -> Column:
    """`parse_idx_from_name` (filename_parsers.py:74-111): extract ALL
    integer runs from the basename (extension stripped) and assign them to
    channel/slice/time/pos by the `order` string. Returns a struct with the
    four *_idx fields + channel_name (= str(channel_idx), the reference's
    fallback) + a `valid` flag replacing the reference's per-row
    AssertionError (exactly 4 integers required)."""
    assert len(set(order)) == 4 and set(order) == set("cztp"), (
        f"order needs the 4 unique chars c,z,t,p, not {order!r}"
    )
    ints = F.regexp_extract_all(strip_ext(basename(file_name)), F.lit(r"(\d+)"), 1)
    idx_name = {"c": "channel_idx", "z": "slice_idx", "t": "time_idx", "p": "pos_idx"}
    fields = [
        F.get(ints, i).cast("int").alias(idx_name[ch]) for i, ch in enumerate(order)
    ]
    channel_pos = order.index("c")
    return F.struct(
        *fields,
        F.get(ints, channel_pos).cast("int").cast("string").alias("channel_name"),
        (F.size(ints) == 4).alias("valid"),
    )


def parse_sms_name(file_name: Column) -> Column:
    """`parse_sms_name` (filename_parsers.py:35-71): convention
    img_channelname_t***_p***_z***.tif; extra underscores fold into the
    channel name (str_split[:-3] joined); t/p/z assigned by 1-char prefix +
    length-4 check regardless of their order. Returns struct(channel_name,
    time_idx, pos_idx, slice_idx). Channel *index* is assignment-order
    state in the reference (expanding list) — see
    channel_index_by_first_appearance for the distributed equivalent."""
    parts = F.split(strip_ext(basename(file_name)), "_")
    tail = F.slice(parts, F.greatest(F.size(parts) - 2, F.lit(2)), 3)
    channel = F.when(
        F.size(parts) > 5,
        F.array_join(F.slice(parts, 2, F.size(parts) - 4), "_"),
    ).otherwise(F.get(parts, 1))

    def idx_of(prefix: str) -> Column:
        matched = F.filter(
            tail,
            lambda s: s.startswith(prefix) & (F.length(s) == 4),
        )
        return F.substring(F.get(matched, 0), 2, 3).cast("int")

    return F.struct(
        channel.alias("channel_name"),
        idx_of("t").alias("time_idx"),
        idx_of("p").alias("pos_idx"),
        idx_of("z").alias("slice_idx"),
    )


def parse_ml_name(file_name: Column) -> Column:
    """`parse_ml_name` (filename_parsers.py:5-32): convention
    `[plate_id]_[stack_nbr]_[protein_name]_...tif` → global-metadata struct.
    `valid` replaces the AssertionError (≥3 underscores) and the int-parse
    ValueError (stack_nbr numeric)."""
    parts = F.split(basename(file_name), "_")
    stack = F.get(parts, 1)
    return F.struct(
        F.get(parts, 0).alias("plate_id"),
        stack.try_cast("int").alias("stack_nbr"),
        F.get(parts, 2).alias("protein_name"),
        ((F.size(parts) >= 4) & stack.try_cast("int").isNotNull()).alias("valid"),
    )


def channel_index_by_first_appearance(
    df: DataFrame, channel_col: str = "channel_name", file_col: str = "file_name"
) -> DataFrame:
    """The reference indexes channels by order of first encounter in an
    expanding list while iterating natsorted files (filename_parsers.py:
    58-63 + tiffolder_splitter.py:168-170) — driver-side mutable state.
    Distributed equivalent: rank each channel by its natsort-first file.
    Identical result because the reference's iteration order IS natsort.

    Scale shape: the global ORDER BY window runs over the *distinct-channel*
    aggregate (channels are dims-sized: ~10s of rows), never over the frame
    rows; the rank joins back by broadcast."""
    chans = df.groupBy(channel_col).agg(
        F.min(natural_sort_key(F.col(file_col))).alias("_first")
    )
    ranked = chans.select(
        channel_col,
        (F.dense_rank().over(Window.partitionBy(F.lit(0)).orderBy("_first")) - 1).alias("channel_idx"),  # dims-sized
    )
    return df.join(F.broadcast(ranked), channel_col)


# ---------------------------------------------------------------------------
# TIFF splitters (S4: ometif_splitter.py / tif_id_splitter.py)
# ---------------------------------------------------------------------------

FRAME_ROW_SCHEMA = T.StructType(
    [
        T.StructField("file_path", T.StringType()),
        T.StructField("page_idx", T.IntegerType()),
        T.StructField("channel_idx", T.IntegerType()),
        T.StructField("slice_idx", T.IntegerType()),
        T.StructField("time_idx", T.IntegerType()),
        T.StructField("pos_idx", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def grid_indices(
    page_idx: Column,
    nbr_channels: Column,
    nbr_slices: Column,
    nbr_positions: Column,
) -> Column:
    """`tif_id_splitter` page→index mapping (tif_id_splitter.py:100-103,
    124-126, 139-146): pages are ordered channels → slices → positions →
    frames(time), i.e. channel varies fastest. itertools.product re-expressed
    as integer div/mod so it runs on a column of page numbers."""
    c = page_idx % nbr_channels
    z = (page_idx.cast("long") / nbr_channels).cast("long") % nbr_slices
    p = (page_idx.cast("long") / (nbr_channels * nbr_slices)).cast(
        "long"
    ) % nbr_positions
    t = (page_idx.cast("long") / (nbr_channels * nbr_slices * nbr_positions)).cast(
        "long"
    )
    return F.struct(
        c.cast("int").alias("channel_idx"),
        z.cast("int").alias("slice_idx"),
        t.cast("int").alias("time_idx"),
        p.cast("int").alias("pos_idx"),
    )


def _default_page_reader(payload: bytes) -> list[bytes]:
    """The default is REAL — the pure-numpy TIFF reader + PNG encoder
    (imagingdb_spark.tiff/png), covering the reference's frame contract:
    multi-page 8/16-bit gray/RGB, uncompressed OR LZW/Deflate-compressed
    (+ predictor 2), both byte orders. Exotic codecs (JPEG-in-TIFF,
    PackBits, CCITT) raise with a clear message; inject a tifffile-backed
    reader for those (the seam is unchanged)."""
    from imagingdb_spark.tiff import png_page_reader

    return png_page_reader(payload)


def split_tiff_pages(
    binary_files: DataFrame,
    page_reader: Callable[[bytes], list[bytes]] = _default_page_reader,
    nbr_channels: int = 1,
    nbr_slices: int = 1,
    nbr_positions: int = 1,
) -> DataFrame:
    """S4: multi-page TIFF → one row per 2-D frame (ometif_splitter.py:
    68-106 / tif_id_splitter.py:111-175 shape). Input is a `binaryFile`
    DataFrame (path, content); output is FRAME_ROW_SCHEMA with grid-assigned
    indices and a sha256 per frame (file_splitter.py:82-93). Arrow-batched
    mapInPandas replaces the reference's ProcessPoolExecutor
    (tiffolder_splitter.py:193-196): Spark tasks are the process pool.
    The default page_reader splits real TIFFs (uncompressed, LZW or
    Deflate) into PNG frame payloads (tiff.png_page_reader — the
    reference's TIFF-in/PNG-out upload shape); inject a custom reader
    for exotic codecs."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for i, page in enumerate(page_reader(bytes(content))):
                    c = i % nbr_channels
                    z = (i // nbr_channels) % nbr_slices
                    p = (i // (nbr_channels * nbr_slices)) % nbr_positions
                    t = i // (nbr_channels * nbr_slices * nbr_positions)
                    rows.append(
                        {
                            "file_path": path,
                            "page_idx": i,
                            "channel_idx": c,
                            "slice_idx": z,
                            "time_idx": t,
                            "pos_idx": p,
                            "payload": page,
                            "sha256": hashlib.sha256(page).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in FRAME_ROW_SCHEMA.fields],
            )

    return binary_files.select("path", "content").mapInPandas(
        batches, schema=FRAME_ROW_SCHEMA
    )
