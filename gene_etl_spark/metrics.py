"""Ingest metrics / per-partition lineage counters table.

Append-only Parquet directory with METRICS_SCHEMA rows: per-batch,
per-phase, per-partition counts of events read, LWW-dropped duplicates,
and applied inserts/updates/deletes/noops, plus wall-clock.

Reference analogue: ETLProcessLog per-phase timings and success/fail
accounting (models.py:183-198, etl/persist.py:60-87,
etl/__init__.py:266-271) — lifted from one row per run to one row per
(batch, phase, partition) so skew and stragglers are visible.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gene_etl_spark.schemas import METRICS_SCHEMA


class MetricsTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        os.makedirs(self.path, exist_ok=True)

    def append_rows(self, rows: list[dict]) -> None:
        """Driver-side pyarrow append: the counters are a handful of rows
        per batch — spinning a Spark job for them would cost more than the
        data plane itself (the data plane stays Spark; bookkeeping is local)."""
        if not rows:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        arrow_types = {
            "batch_id": pa.string(),
            "phase": pa.string(),
            "partition_id": pa.int32(),
            "events_read": pa.int64(),
            "dedup_dropped": pa.int64(),
            "inserts": pa.int64(),
            "updates": pa.int64(),
            "deletes": pa.int64(),
            "noops": pa.int64(),
            "wall_ms": pa.int64(),
        }
        cols = {
            name: pa.array([r.get(name) for r in rows], t)
            for name, t in arrow_types.items()
        }
        import uuid as _uuid

        pq.write_table(
            pa.table(cols), os.path.join(self.path, f"m-{_uuid.uuid4().hex}.parquet")
        )

    def read(self) -> DataFrame:
        if not any(f.endswith(".parquet") for f in _walk_files(self.path)):
            return self.spark.createDataFrame([], METRICS_SCHEMA)
        return self.spark.read.schema(METRICS_SCHEMA).parquet(self.path)

    def batch_summary(self) -> DataFrame:
        """Per-batch accounting rollup (the invariant tests assert on it)."""
        return (
            self.read()
            .groupBy("batch_id")
            .agg(
                F.sum("events_read").alias("events_read"),
                F.sum("dedup_dropped").alias("dedup_dropped"),
                F.sum("inserts").alias("inserts"),
                F.sum("updates").alias("updates"),
                F.sum("deletes").alias("deletes"),
                F.sum("noops").alias("noops"),
                F.max("wall_ms").alias("wall_ms"),
            )
        )


def _walk_files(path: str):
    for root, _d, files in os.walk(path):
        for f in files:
            yield os.path.join(root, f)
