"""Operator inventory (SURVEY.md §2). Importing this package registers every
named query + oracle into imagingdb_spark.registry."""

from imagingdb_spark.operators import (  # noqa: F401
    aggregates,
    dedup,
    filters,
    graph,
    joins,
    lm,
    merge,
    sampling,
    scalars,
    setops,
    similarity,
    sketches,
    snapscan,
    sorts,
    streaming_batch,
    text,
    windows,
)
from imagingdb_spark import multimodal  # noqa: F401  (registers x_phash_dedup)
