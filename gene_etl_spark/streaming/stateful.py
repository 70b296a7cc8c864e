"""Custom stateful streaming operator via ``applyInPandasWithState``.

Per-conversation running state maintained across micro-batches in
Spark's state store (not executor memory): cumulative event count,
delete count, LSN high-water mark, and first/last event time. Each
epoch emits the refreshed state rows for the conversations it touched
(update semantics) — the Arrow-batched analogue of a keyed stateful
process function.

This complements the ingest path (which keeps durable state in lake
tables, SURVEY.md §2.10): applyInPandasWithState is the right tool
when the state is per-key, bounded, and consumed as a stream — e.g.
live conversation health/last-activity tracking over the same binlog.
"""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from gene_etl_spark.sources.binlog import BinlogSource

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)


def _update_conv_state(key, pdf_iter, state: GroupState):
    """Fold this epoch's events for one conversation into its running
    state; emit the refreshed row."""
    (conv_id,) = key
    if state.exists:
        n_events, n_deletes, max_lsn, first_ts, last_ts = state.get
    else:
        n_events, n_deletes, max_lsn, first_ts, last_ts = 0, 0, -1, None, None
    for pdf in pdf_iter:
        n_events += len(pdf)
        n_deletes += int((pdf["op"] == "D").sum())
        max_lsn = max(max_lsn, int(pdf["lsn"].max()))
        lo, hi = pdf["ts"].min(), pdf["ts"].max()
        first_ts = lo if first_ts is None else min(first_ts, lo)
        last_ts = hi if last_ts is None else max(last_ts, hi)
    state.update((n_events, n_deletes, max_lsn, first_ts, last_ts))
    yield pd.DataFrame(
        [
            {
                "conv_id": conv_id,
                "n_events": n_events,
                "n_deletes": n_deletes,
                "max_lsn": max_lsn,
                "first_ts": first_ts,
                "last_ts": last_ts,
            }
        ]
    )


def conversation_state_stream(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    out_path: str,
    max_files_per_trigger: int | None = None,
    timeout_sec: float = 600.0,
) -> dict:
    """Drain the log (availableNow) through the stateful operator.

    Every epoch's refreshed state rows are appended to ``out_path`` as
    Parquet with their epoch id; the latest row per conversation is the
    final state (see ``latest_conversation_state``)."""
    schema = BinlogSource(spark, events_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(events_path)

    updates = stream.groupBy("conv_id").applyInPandasWithState(
        _update_conv_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    epochs = {"n": 0}

    def sink(df, epoch_id: int) -> None:
        # update-mode rows: append with epoch id; consumers take the
        # latest row per key (the state store itself is the truth)
        from pyspark.sql import functions as F

        out = df.withColumn("epoch", F.lit(int(epoch_id)))
        if out.isEmpty():
            return
        out.write.mode("append").parquet(out_path)
        epochs["n"] += 1

    query = (
        updates.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.time()
    query.awaitTermination(timeout_sec)
    if query.isActive:
        query.stop()
    return {"epochs": epochs["n"], "wall_sec": time.time() - t0}


def latest_conversation_state(spark: SparkSession, out_path: str):
    """Final state per conversation: the row from each conv's last epoch."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.read.parquet(out_path)
    w = Window.partitionBy("conv_id").orderBy(F.desc("epoch"))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "epoch")
    )
