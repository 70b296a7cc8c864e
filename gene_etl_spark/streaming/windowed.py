"""Watermarked windowed aggregation over the change stream.

`readStream` over the binlog directory → ``withWatermark(event-time)``
→ tumbling-window groupBy → append-mode sink. Append mode emits a
window only once the watermark passes its end, so late events inside
the lateness bound still land in their window and events later than
the bound are dropped — the standard Structured Streaming late-data
contract (the CDC ingest path itself does not need event-time windows,
SURVEY.md §2.10; this operator serves the analytics/rollup side).
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from gene_etl_spark.sources.binlog import BinlogSource


def windowed_rollup_stream(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    out_path: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    max_files_per_trigger: int | None = None,
    timeout_sec: float = 600.0,
) -> dict:
    """Drain the log (availableNow) into per-(window, op) event counts.

    Returns a summary; emitted (closed) windows land in ``out_path`` as
    Parquet. Windows newer than ``max(ts) - watermark`` remain open at
    termination and are NOT emitted — exactly append-mode semantics; a
    resumed stream (same checkpoint) closes them as the watermark
    advances.
    """
    schema = BinlogSource(spark, events_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(events_path)
    # parquet event time is TIMESTAMP_NTZ; watermarks require TIMESTAMP
    # (the session is pinned to UTC, so the cast is value-identical)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))

    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("op"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("op") == "D").cast("long")).alias("n_deletes"),
            F.max("lsn").alias("max_lsn"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "op",
            "n_events",
            "n_deletes",
            "max_lsn",
        )
    )
    query = (
        agg.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.time()
    query.awaitTermination(timeout_sec)
    if query.isActive:
        query.stop()
    return {"wall_sec": time.time() - t0}


def session_rollup_stream(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    out_path: str,
    gap: str = "5 minutes",
    watermark: str = "30 minutes",
    max_files_per_trigger: int | None = None,
    timeout_sec: float = 600.0,
) -> dict:
    """Per-conversation activity sessions (``session_window`` with an
    inactivity gap): a session closes once the watermark passes its end
    and is emitted exactly once (append mode). Gives the
    events-per-burst / session-duration view of the same change log;
    batch Spark computes the identical ``session_window`` aggregate, so
    the two are directly comparable in tests."""
    schema = BinlogSource(spark, events_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(events_path).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("lsn").alias("max_lsn"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "conv_id",
            "n_events",
            "max_lsn",
        )
    )
    query = (
        agg.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.time()
    query.awaitTermination(timeout_sec)
    if query.isActive:
        query.stop()
    return {"wall_sec": time.time() - t0}
