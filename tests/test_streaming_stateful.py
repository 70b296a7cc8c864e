"""Structured Streaming analytics operators: watermarked tumbling-window
rollup (append-mode late-data contract) and the applyInPandasWithState
per-key stateful operator (state store across micro-batches)."""

import datetime as dt
import os

from pyspark.sql import functions as F

from gene_etl_spark.sources.simulate import generate_change_stream
from gene_etl_spark.streaming.stateful import (
    conversation_state_stream,
    latest_conversation_state,
)
from gene_etl_spark.streaming.windowed import windowed_rollup_stream

WINDOW = "10 minutes"
WATERMARK = "30 minutes"


def _events(spark, workdir, n=3000, seed=17):
    path = os.path.join(workdir, "events")
    generate_change_stream(
        path, n_convs=30, max_turns=15, n_events=n, seed=seed, n_tranches=6
    )
    return path


def test_windowed_rollup_matches_batch_truth(spark, workdir):
    ev = _events(spark, workdir)
    out = os.path.join(workdir, "rollup")
    windowed_rollup_stream(
        spark, ev, os.path.join(workdir, "ckpt"), out,
        window=WINDOW, watermark=WATERMARK, max_files_per_trigger=2,
    )
    emitted = spark.read.parquet(out)
    assert emitted.count() > 0

    batch = spark.read.parquet(f"{ev}/*.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    truth = (
        batch.groupBy(F.window("ts", WINDOW).alias("win"), "op")
        .agg(
            F.count(F.lit(1)).alias("t_events"),
            F.sum((F.col("op") == "D").cast("long")).alias("t_deletes"),
            F.max("lsn").alias("t_lsn"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "op",
            "t_events",
            "t_deletes",
            "t_lsn",
        )
    )
    # every emitted (closed) window matches the batch aggregate exactly:
    # the simulator's disorder (<=10 min) is inside the 30 min watermark,
    # so append mode drops nothing from closed windows
    joined = emitted.join(truth, ["window_start", "window_end", "op"], "inner")
    assert joined.count() == emitted.count()
    mismatches = joined.where(
        (F.col("n_events") != F.col("t_events"))
        | (F.col("n_deletes") != F.col("t_deletes"))
        | (F.col("max_lsn") != F.col("t_lsn"))
    )
    assert mismatches.count() == 0

    # only tail windows (those the final watermark never passed) may be
    # unemitted: everything older than max_ts - 2*watermark must be there
    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - dt.timedelta(minutes=60)
    old_truth = truth.where(F.col("window_end") <= cutoff)
    old_emitted = emitted.where(F.col("window_end") <= cutoff)
    assert old_truth.count() == old_emitted.count()

    # exactly-once: draining again on the same checkpoint emits nothing new
    n_before = emitted.count()
    windowed_rollup_stream(
        spark, ev, os.path.join(workdir, "ckpt"), out,
        window=WINDOW, watermark=WATERMARK, max_files_per_trigger=2,
    )
    assert spark.read.parquet(out).count() == n_before


def test_session_windows_match_batch_truth(spark, workdir):
    """Closed per-conversation sessions emitted by the stream equal the
    batch session_window aggregate for every emitted row."""
    from gene_etl_spark.streaming.windowed import session_rollup_stream

    ev = _events(spark, workdir, seed=29)
    out = os.path.join(workdir, "sessions")
    session_rollup_stream(
        spark, ev, os.path.join(workdir, "ckpt"), out,
        gap="5 minutes", watermark=WATERMARK, max_files_per_trigger=2,
    )
    emitted = spark.read.parquet(out)
    assert emitted.count() > 0

    batch = spark.read.parquet(f"{ev}/*.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    truth = (
        batch.groupBy(F.session_window("ts", "5 minutes").alias("win"), "conv_id")
        .agg(
            F.count(F.lit(1)).alias("t_events"),
            F.max("lsn").alias("t_lsn"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "conv_id",
            "t_events",
            "t_lsn",
        )
    )
    joined = emitted.join(
        truth, ["session_start", "session_end", "conv_id"], "inner"
    )
    assert joined.count() == emitted.count()
    assert (
        joined.where(
            (F.col("n_events") != F.col("t_events"))
            | (F.col("max_lsn") != F.col("t_lsn"))
        ).count()
        == 0
    )


def test_stateful_conversation_state_matches_batch(spark, workdir):
    ev = _events(spark, workdir, seed=23)
    out = os.path.join(workdir, "state_log")
    summary = conversation_state_stream(
        spark, ev, os.path.join(workdir, "ckpt"), out, max_files_per_trigger=2
    )
    assert summary["epochs"] >= 2  # state really crossed micro-batches

    final = latest_conversation_state(spark, out).toPandas().set_index("conv_id")
    truth = (
        spark.read.parquet(f"{ev}/*.parquet")
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("op") == "D").cast("long")).alias("n_deletes"),
            F.max("lsn").alias("max_lsn"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .toPandas()
        .set_index("conv_id")
    )
    assert len(final) == len(truth)
    for col in ("n_events", "n_deletes", "max_lsn", "first_ts", "last_ts"):
        assert (
            final[col].sort_index() == truth[col].sort_index()
        ).all(), f"column {col} diverged"
