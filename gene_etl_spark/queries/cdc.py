"""CDC engine queries for the driver gate.

``cdc_replay`` derives a deterministic change stream from the `events`
test table, replays it batch-wise through the REAL engine (lake format,
salted LWW dedup, copy-on-write MERGE, ledger, fencing) into a temp
warehouse, and returns the final lake state. The DuckDB oracle states
the same last-writer-wins materialization in pure SQL — so the whole
ingest path is value-hash-gated by the driver, not just rows-checked.

Derivation (identical in Spark and SQL):
    conv_id  = 'u' || user_id
    turn_idx = event_id % 40
    lsn      = event_id + 1
    op       = 'D' if event_type='error' and value < 50 else 'U'
    role     = event_type
    text     = props || '#' || floor(value * 10)
    ts       = ts
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def derived_change_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        (F.col("event_id") + 1).cast("long").alias("lsn"),
        F.when(
            (F.col("event_type") == "error") & (F.col("value") < 50), F.lit("D")
        ).otherwise(F.lit("U")).alias("op"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("conv_id"),
        F.pmod(F.col("event_id"), F.lit(40)).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.concat(
            F.col("props"), F.lit("#"), F.floor(F.col("value") * 10).cast("string")
        ).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.col("ts"),
        F.col("ts").alias("event_ts"),
    )


def _replay_through_engine(spark: SparkSession, sf_dir: str, **cfg_kw) -> DataFrame:
    from gene_etl_spark.config import IngestConfig
    from gene_etl_spark.runner import CdcIngestRunner

    base = tempfile.mkdtemp(prefix="cdc_replay_")
    try:
        events_dir = os.path.join(base, "events")
        derived_change_events(spark, sf_dir).repartition(4).write.parquet(events_dir)

        max_lsn = spark.read.parquet(events_dir).agg(F.max("lsn")).collect()[0][0]
        defaults = dict(
            lake_path=os.path.join(base, "lake"),
            events_path=events_dir,
            ledger_path=os.path.join(base, "ledger"),
            metrics_path=os.path.join(base, "metrics"),
            validation_path=os.path.join(base, "validation"),
            num_buckets=16,
            slice_lsn_width=max(1, int(max_lsn) // 4),  # 4-5 batches
            num_salts=4,
            salt_threshold=0,
        )
        defaults.update(cfg_kw)
        cfg = IngestConfig(**defaults)
        runner = CdcIngestRunner(spark, cfg)
        runner.run()
        out = runner.table.read().select("conv_id", "turn_idx", "role", "text", "ts")
        # materialize before the temp warehouse is deleted
        pdf = out.toPandas()
        return spark.createDataFrame(pdf, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_cdc_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write replay through the full engine."""
    return _replay_through_engine(spark, sf_dir, merge_mode="cow")


def q_cdc_replay_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read replay (delta appends + resolve-on-read) with a
    mid-run compaction — the write-optimized engine path, value-gated
    against the same pure-SQL oracle."""
    return _replay_through_engine(
        spark, sf_dir, merge_mode="mor", compact_every_n_batches=2
    )


def q_cdc_replay_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming replay: readStream → foreachBatch over the
    same dedup+MERGE path, availableNow drain."""
    from gene_etl_spark.config import IngestConfig
    from gene_etl_spark.lake.table import LakeTable
    from gene_etl_spark.streaming.stream import ingest_stream

    base = tempfile.mkdtemp(prefix="cdc_stream_")
    try:
        events_dir = os.path.join(base, "events")
        derived_change_events(spark, sf_dir).repartition(4).write.parquet(events_dir)
        cfg = IngestConfig(
            lake_path=os.path.join(base, "lake"),
            events_path=events_dir,
            ledger_path=os.path.join(base, "ledger"),
            metrics_path=os.path.join(base, "metrics"),
            validation_path=os.path.join(base, "validation"),
            num_buckets=16,
            merge_mode="mor",
        )
        ingest_stream(spark, cfg, os.path.join(base, "ckpt"), max_files_per_trigger=2)
        table = LakeTable.load(spark, cfg.lake_path)
        out = table.read().select("conv_id", "turn_idx", "role", "text", "ts")
        pdf = out.toPandas()
        return spark.createDataFrame(pdf, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


SQL_CDC_REPLAY = """
WITH derived AS (
  SELECT (event_id + 1)::BIGINT AS lsn,
         CASE WHEN event_type = 'error' AND value < 50 THEN 'D' ELSE 'U' END AS op,
         'u' || user_id::VARCHAR AS conv_id,
         (event_id % 40)::INTEGER AS turn_idx,
         event_type AS role,
         props || '#' || FLOOR(value * 10)::BIGINT::VARCHAR AS text,
         ts
  FROM events
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY lsn DESC, ts DESC) AS rn
  FROM derived
)
SELECT conv_id, turn_idx, role, text, ts
FROM ranked WHERE rn = 1 AND op <> 'D'
"""


def q_cdc_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental change feed (CDF) out of the lake: replay the derived
    stream through the MoR engine (pure delta commits, no compaction),
    then read back EVERY commit's changes via read_changes(0). Each MoR
    commit streams its deduped slice verbatim, so the feed equals the
    per-slice LWW winners — which the DuckDB oracle states in pure SQL
    (slice = ceil(lsn / width), winner per (slice, key), op as U/D)."""
    from gene_etl_spark.config import IngestConfig
    from gene_etl_spark.lake.changes import CHANGE_OP_COL, VERSION_COL, read_changes
    from gene_etl_spark.runner import CdcIngestRunner

    base = tempfile.mkdtemp(prefix="cdc_changes_")
    try:
        events_dir = os.path.join(base, "events")
        derived_change_events(spark, sf_dir).repartition(4).write.parquet(events_dir)
        max_lsn = spark.read.parquet(events_dir).agg(F.max("lsn")).collect()[0][0]
        cfg = IngestConfig(
            lake_path=os.path.join(base, "lake"),
            events_path=events_dir,
            ledger_path=os.path.join(base, "ledger"),
            metrics_path=os.path.join(base, "metrics"),
            validation_path=os.path.join(base, "validation"),
            num_buckets=16,
            slice_lsn_width=max(1, int(max_lsn) // 4),
            num_salts=4,
            salt_threshold=0,
            merge_mode="mor",
        )
        runner = CdcIngestRunner(spark, cfg)
        runner.run()
        # snapshot v == slice number: the chain is create(v0) then one
        # pure-delta commit per slice, in slice order
        out = read_changes(runner.table, 0).select(
            "conv_id",
            "turn_idx",
            F.col("_lsn").cast("long").alias("lsn"),
            F.col(CHANGE_OP_COL).alias("change_op"),
            F.col(VERSION_COL).cast("long").alias("slice"),
        )
        pdf = out.toPandas()
        return spark.createDataFrame(pdf, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


SQL_CDC_CHANGES = """
WITH derived AS (
  SELECT (event_id + 1)::BIGINT AS lsn,
         CASE WHEN event_type = 'error' AND value < 50 THEN 'D' ELSE 'U' END AS op,
         'u' || user_id::VARCHAR AS conv_id,
         (event_id % 40)::INTEGER AS turn_idx,
         ts
  FROM events
), w AS (
  SELECT GREATEST(MAX(lsn) // 4, 1)::BIGINT AS width FROM derived
), sliced AS (
  SELECT d.*, ((lsn - 1) // width + 1)::BIGINT AS slice FROM derived d, w
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY slice, conv_id, turn_idx
                               ORDER BY lsn DESC, ts DESC) AS rn
  FROM sliced
)
SELECT conv_id, turn_idx, lsn,
       CASE WHEN op = 'D' THEN 'D' ELSE 'U' END AS change_op,
       slice
FROM ranked WHERE rn = 1
"""


def q_rollup_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-rollup maintenance, value-gated end-to-end (round-4,
    verdict item 5): replay the derived change stream through the REAL
    engine slice by slice, refreshing a per-role rollup (turn count +
    total text chars — the reference's per-cohort summary view shape,
    models.py:268-283) after EVERY committed batch via the change-feed
    dirty-group path (lake/rollup.py). The returned final rollup state
    must equal the DuckDB oracle's FULL recompute over the LWW winners —
    i.e. N incremental refreshes == one full rebuild, the defining
    invariant of incremental view maintenance."""
    from gene_etl_spark.config import IngestConfig
    from gene_etl_spark.lake.rollup import ContinuousRollup
    from gene_etl_spark.runner import CdcIngestRunner

    base = tempfile.mkdtemp(prefix="rollup_refresh_")
    try:
        events_dir = os.path.join(base, "events")
        derived_change_events(spark, sf_dir).repartition(4).write.parquet(events_dir)
        max_lsn = spark.read.parquet(events_dir).agg(F.max("lsn")).collect()[0][0]
        cfg = IngestConfig(
            lake_path=os.path.join(base, "lake"),
            events_path=events_dir,
            ledger_path=os.path.join(base, "ledger"),
            metrics_path=os.path.join(base, "metrics"),
            validation_path=os.path.join(base, "validation"),
            num_buckets=16,
            slice_lsn_width=max(1, int(max_lsn) // 4),
            num_salts=4,
            salt_threshold=0,
            merge_mode="cow",
        )
        runner = CdcIngestRunner(spark, cfg)
        roll = ContinuousRollup(
            spark,
            os.path.join(base, "rollup_role"),
            runner.table,
            group_cols=["role"],
            agg_exprs=[
                F.count(F.lit(1)).cast("long").alias("n_turns"),
                F.sum(F.length("text")).cast("long").alias("total_chars"),
            ],
            num_buckets=4,
        )
        for lo, hi in runner.source.plan_batches(0, cfg.slice_lsn_width, None):
            runner.apply_batch(lo, hi)
            roll.refresh()  # folds exactly this batch's dirty groups
        out = roll.read().select("role", "n_turns", "total_chars")
        pdf = out.toPandas()
        return spark.createDataFrame(pdf, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


SQL_ROLLUP_REFRESH = """
WITH derived AS (
  SELECT (event_id + 1)::BIGINT AS lsn,
         CASE WHEN event_type = 'error' AND value < 50 THEN 'D' ELSE 'U' END AS op,
         'u' || user_id::VARCHAR AS conv_id,
         (event_id % 40)::INTEGER AS turn_idx,
         event_type AS role,
         props || '#' || FLOOR(value * 10)::BIGINT::VARCHAR AS text,
         ts
  FROM events
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY lsn DESC, ts DESC) AS rn
  FROM derived
)
SELECT role, COUNT(*)::BIGINT AS n_turns, SUM(LENGTH(text))::BIGINT AS total_chars
FROM ranked WHERE rn = 1 AND op <> 'D'
GROUP BY 1
"""


def q_lww_dedup_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted two-phase LWW dedup operator itself (skew path forced),
    oracle-checked against a plain window dedup in SQL."""
    from gene_etl_spark.operators.dedup import lww_dedup

    ev = derived_change_events(spark, sf_dir)
    return lww_dedup(
        ev, key_cols=("conv_id", "turn_idx"), order_cols=("lsn", "ts"), num_salts=8
    ).select("conv_id", "turn_idx", "lsn", "op", "text")


SQL_LWW_DEDUP_SALTED = """
WITH derived AS (
  SELECT (event_id + 1)::BIGINT AS lsn,
         CASE WHEN event_type = 'error' AND value < 50 THEN 'D' ELSE 'U' END AS op,
         'u' || user_id::VARCHAR AS conv_id,
         (event_id % 40)::INTEGER AS turn_idx,
         props || '#' || FLOOR(value * 10)::BIGINT::VARCHAR AS text,
         ts
  FROM events
)
SELECT conv_id, turn_idx, lsn, op, text
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY lsn DESC, ts DESC) AS rn
  FROM derived
) WHERE rn = 1
"""


QUERIES = {
    "cdc_replay": q_cdc_replay,
    "cdc_replay_mor": q_cdc_replay_mor,
    "cdc_replay_stream": q_cdc_replay_stream,
    "cdc_changes": q_cdc_changes,
    "rollup_refresh": q_rollup_refresh,
    "lww_dedup_salted": q_lww_dedup_salted,
}

ORACLES = {
    "cdc_replay": SQL_CDC_REPLAY,
    "cdc_replay_mor": SQL_CDC_REPLAY,
    "cdc_replay_stream": SQL_CDC_REPLAY,
    "cdc_changes": SQL_CDC_CHANGES,
    "rollup_refresh": SQL_ROLLUP_REFRESH,
    "lww_dedup_salted": SQL_LWW_DEDUP_SALTED,
}
