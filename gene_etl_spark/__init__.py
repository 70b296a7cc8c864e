"""gene_etl_spark — a PySpark-native CDC / incremental-ingest analytics engine.

A from-scratch rebuild of the capability surface of the reference batch ETL
system (jrapisarda/gene-etl, surveyed in SURVEY.md) as an idiomatic Spark
engine:

- ``lake``       — Parquet+manifest lake table format: atomic snapshot
                   commits, bucketed copy-on-write MERGE upsert, additive
                   schema evolution, commit fencing (Iceberg-style, jar-free).
- ``sources``    — simulated binlog/WAL change-stream generator, LSN-slice
                   batch planner, TPC-H-ish table loaders.
- ``operators``  — LWW dedup (salted, skew-aware), document dedup family
                   (exact / MinHash-LSH / SimHash / n-gram Jaccard /
                   embedding-cosine), similarity search, text analysis,
                   statistical kernels (pairwise correlation, BH-FDR).
- ``ledger``     — offset-range checkpoint ledger (exactly-once resume).
- ``metrics``    — per-partition lineage counters / ingest metrics table.
- ``validate``   — pre/post validation gates (hard/soft checks).
- ``runner``     — the batch ingest loop orchestrator.
- ``oracle``     — independent DuckDB/pandas reference materializer (tests).

Reference parity citations use ``/root/reference`` paths (file:line).
"""

from gene_etl_spark.config import IngestConfig, config_hash
from gene_etl_spark.session import get_spark

__all__ = [
    "IngestConfig",
    "config_hash",
    "get_spark",
    # lazy: LakeTable, CdcIngestRunner, lww_dedup, lww_dedup_agg,
    # ingest_stream, materialize_expected
]
__version__ = "0.1.0"


def __getattr__(name):  # composable library API (README.md:183-199 analogue)
    if name == "LakeTable":
        from gene_etl_spark.lake.table import LakeTable

        return LakeTable
    if name == "CdcIngestRunner":
        from gene_etl_spark.runner import CdcIngestRunner

        return CdcIngestRunner
    if name in ("lww_dedup", "lww_dedup_agg"):
        from gene_etl_spark.operators import dedup

        return getattr(dedup, name)
    if name == "ingest_stream":
        from gene_etl_spark.streaming.stream import ingest_stream

        return ingest_stream
    if name == "materialize_expected":
        from gene_etl_spark.oracle import materialize_expected

        return materialize_expected
    raise AttributeError(name)
