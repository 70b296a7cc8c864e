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

__all__ = ["IngestConfig", "config_hash", "get_spark"]
__version__ = "0.1.0"
