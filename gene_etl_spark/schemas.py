"""Declared schemas for the engine's tables.

The reference declares its schema via SQLAlchemy DDL (reference:
models.py:21-234); here every table has an explicit StructType so scans
never schema-infer and evolution is an explicit manifest operation.

Target input shape is fixed by BASELINE.json:input_hint:
transcripts(conv_id string, turn_idx int, role string, text string,
            tool string, ts timestamp), key (conv_id, turn_idx).
"""

from __future__ import annotations

from pyspark.sql import types as T

# The lake table (FIXTURES.md §1). `tool` is nullable and appears
# mid-stream in evolution scenarios.
TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Pre-evolution transcripts schema (no `tool` yet).
TRANSCRIPTS_SCHEMA_V0 = T.StructType([f for f in TRANSCRIPTS_SCHEMA.fields if f.name != "tool"])

# The simulated binlog/WAL (FIXTURES.md §2). Totally ordered by lsn.
CHANGE_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),  # I / U / D
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("event_ts", T.TimestampType(), True),
    ]
)

CHANGE_EVENTS_SCHEMA_V0 = T.StructType(
    [f for f in CHANGE_EVENTS_SCHEMA.fields if f.name != "tool"]
)

# Offset-range checkpoint ledger (FIXTURES.md §3; reference analogue:
# gzip checkpoints etl/persist.py:339-383 + ETLProcessLog models.py:183-198).
LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.StringType(), False),
        T.StructField("start_lsn", T.LongType(), False),  # exclusive
        T.StructField("end_lsn", T.LongType(), False),  # inclusive
        T.StructField("status", T.StringType(), False),
        T.StructField("config_hash", T.StringType(), True),
        T.StructField("snapshot_version", T.LongType(), True),
        T.StructField("committed_at", T.TimestampType(), True),
    ]
)

# Per-partition lineage counters (FIXTURES.md §4; reference analogue:
# success/fail accounting etl/persist.py:60-87, phase timings
# etl/__init__.py:266-271).
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.StringType(), False),
        T.StructField("phase", T.StringType(), False),  # read | apply
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("events_read", T.LongType(), True),
        T.StructField("dedup_dropped", T.LongType(), True),
        T.StructField("inserts", T.LongType(), True),
        T.StructField("updates", T.LongType(), True),
        T.StructField("deletes", T.LongType(), True),
        T.StructField("noops", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
    ]
)

# Validation log (reference analogue: DataValidationLog models.py:201-217).
VALIDATION_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.StringType(), True),
        T.StructField("stage", T.StringType(), False),  # pre | post
        T.StructField("check_name", T.StringType(), False),
        T.StructField("passed", T.BooleanType(), False),
        T.StructField("critical", T.BooleanType(), False),
        T.StructField("details", T.StringType(), True),
        T.StructField("validated_at", T.TimestampType(), True),
    ]
)
