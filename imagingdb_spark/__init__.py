"""imagingdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of czbiohub/imagingDB, re-expressed Spark-first.

The reference (see SURVEY.md) is a Postgres + object-store catalog for 5-D
microscopy image stacks; its query surface (filters, FK equi-joins, grouped
summaries, JSONB extraction, uniqueness checks, ingest-time hashing) is
re-expressed here as declarative DataFrame plans over Parquet so Catalyst
handles pushdown, pruning, join selection, and codegen. Extension operators
(dedup, similarity search, multimodal columns, text analysis) cover the
large-scale training-data-pipeline surface.

Layout:
- session:   tuned SparkSession builder (AQE on, UTC, arrow)
- catalog:   table loaders + imaging-domain StructType schemas
- registry:  named query registry + DuckDB oracle SQL twins
- operators: the full SURVEY.md §2 operator inventory as (spark, sf_dir) -> DF
- api:       imaging-domain API parity layer (get_datasets, get_frames_meta, ...)
- ingest:    anti-join-guarded idempotent append (the reference's txn inserts)
- streaming: Structured Streaming jobs over the events table
- multimodal: binary-payload column plumbing with stubbed codecs
"""

__version__ = "0.1.0"
