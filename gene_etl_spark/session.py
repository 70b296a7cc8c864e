"""SparkSession factory.

Centralizes the execution-level decisions from SURVEY.md §4: AQE on,
Arrow on, shuffle partitions scaled to cores, UTC session timezone
(for deterministic timestamp comparison against the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_cores() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "gene-etl-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``cores`` controls ``local[N]`` parallelism; shuffle partitions default
    to the core count so small-scale runs don't fragment into 200 tiny
    tasks while large runs still saturate every slot.
    """
    n = cores or default_cores()
    sp = shuffle_partitions or n
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{n}]"))
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # default 64m advisory coalesces ~100MB shuffles down to 2-3
        # partitions, starving wide local[N] runs; 8m keeps every slot fed
        # while still merging empty/tiny partitions
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # tranche files are ~25MB; default 128m splits give too few read
        # tasks to fill the machine
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        # SQL-standard null-on-edge-case semantics (corr of a constant,
        # x/0) to match the DuckDB oracle; Spark 4 defaults ANSI=on which
        # throws instead
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
