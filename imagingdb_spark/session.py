"""SparkSession factory tuned for this engine.

Local testing runs on local[N] (single JVM); the configs below are chosen so
the same code scales to a real cluster:

- AQE on (runtime coalescing + skew-join splitting) — at 100 TB the static
  shuffle-partition count is always wrong for some stage; AQE re-plans from
  actual map output sizes.
- ``spark.sql.shuffle.partitions`` defaults to the local core count; on a
  cluster this would be ~2-3x total cores (AQE coalesces down).
- UTC session timezone: parquet timestamps are naive; pinning UTC makes Spark
  and the DuckDB oracle read identical wall-clock values.
- Arrow enabled for pandas interchange (pandas UDFs, toPandas).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "imagingdb_spark", cpus: str | None = None) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    # Python workers must be able to import this package: UDF closures that
    # touch any module-level name are cloudpickled BY REFERENCE to the
    # module. The driver may run from any cwd (sys.path.insert doesn't reach
    # worker processes), so export the repo root via PYTHONPATH before the
    # JVM (and its python workers) spawn.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + existing if existing else "")
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # NOTE (r11 A/B): coalescePartitions.parallelismFirst=false
        # (size-based coalescing toward the advisory, the guide §9
        # production setting) was measured here and REJECTED for the
        # local tree: it coalesces this SF's few-MB shuffles to 1-2
        # partitions and serializes CPU-heavy reduce stages
        # (x_perplexity_bucket 1.19x, st_perplexity 1.09x interleaved).
        # Default (parallelism-first) keeps reduce stages wide locally;
        # at cluster scale partitions exceed the advisory and the two
        # policies converge.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # Whole-stage codegen emits one compiled class per distinct stage; a
        # many-query session overflows the JVM's default 240 MB code cache,
        # after which the JIT stops compiling and every task runs interpreted
        # (measured: 15-30x slowdown mid-session). Size it up and let the JVM
        # flush cold compiled code instead of disabling compilation.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "false")
        # Long many-query sessions accumulate stale broadcast/shuffle blocks
        # until a driver GC lets the ContextCleaner reap them (default
        # periodic GC is 30min). Tighten it: measured multi-second drag on
        # late-session shuffle ops otherwise.
        .config("spark.cleaner.periodicGC.interval", "2min")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Input-split floor. Spark sizes file splits at
        # max(openCostInBytes, totalBytes/minPartitionNum) capped by
        # maxPartitionBytes; the 4 MB openCost default exists to stop
        # many-small-FILES fragmentation, but here it FLOORS the split size
        # of single small compressed files — sf3's 19 MB documents.parquet
        # scanned as 5 partitions, throttling the CPU-dense
        # tokenize/xxhash/explode map stages to 5 of 32 cores (measured 2x
        # end-to-end on x_dedup_incremental; the sf10/63 MB file got 16
        # splits and ran FASTER than sf3). 512 KB restores
        # totalBytes/minPartitionNum as the effective term, exactly how a
        # real cluster reading multi-GB inputs behaves (there
        # totalBytes/cores >> openCost, so this config is a no-op at
        # 100 TB — it only de-skews the small-file local proxy).
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        # The driver's events.parquet stores TIMESTAMP(NANOS) which Spark's
        # vectorized reader rejects; read as long and let catalog.table()
        # convert back to (microsecond) timestamps.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # TIMESTAMP(MICROS) parquet (no isAdjustedToUTC) would infer as
        # TIMESTAMP_NTZ under Spark 4's default; NTZ can't carry a watermark
        # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) and would diverge from the
        # nanos path, which converts to TimestampType. Read all parquet
        # timestamps as TimestampType (session tz is pinned UTC above, so
        # values are identical either way).
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
