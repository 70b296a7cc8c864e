"""SQL view surface: the reference exposes its read models as database
views (VW_GENE_PAIRS_CANDIDATE and the per-cohort summary,
models.py:241-283); the Spark-first analogue registers the engine's
tables and composed read models as temp views so ANY downstream
consumer can use plain ``spark.sql`` against them — lake state,
rollups, and the candidate pipelines all become FROM-able relations,
and Catalyst plans through the view boundary (pushdown/pruning still
reach the scans).

Snapshot semantics, stated explicitly: each lake-backed view is pinned
to the table SNAPSHOT current at registration time (``LakeTable.read``
resolves the manifest to an explicit file list — that is what makes
raw-glob reads safe, and it equally means later commits are invisible
through an already-registered view). Laziness defers COMPUTATION, not
snapshot resolution. Consumers that need freshness re-register after
commits: call ``refresh_lake_views`` (the ingest/rollup jobs do this
after each committed batch/refresh) or re-run ``register_lake_views``
— both are cheap (manifest read + view swap, no data touched).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from gene_etl_spark.lake.table import LakeTable


def register_lake_views(
    spark: SparkSession, warehouse: str, table: str = "transcripts"
) -> list[str]:
    """Register the warehouse's lake table and every rollup under it as
    temp views named after their directories. Returns the view names."""
    import os

    names: list[str] = []
    base = LakeTable.load(spark, os.path.join(warehouse, table))
    base.read().createOrReplaceTempView(table)
    names.append(table)
    for d in sorted(os.listdir(warehouse)):
        if d.startswith("rollup_") and LakeTable.exists(os.path.join(warehouse, d)):
            LakeTable.load(spark, os.path.join(warehouse, d)).read().createOrReplaceTempView(d)
            names.append(d)
    return names


def refresh_lake_views(
    spark: SparkSession, warehouse: str, table: str = "transcripts"
) -> list[str]:
    """Re-pin the lake-backed views to the CURRENT snapshots. Alias of
    ``register_lake_views`` (``createOrReplaceTempView`` swaps in
    place), named for the call sites that run after a commit."""
    return register_lake_views(spark, warehouse, table)


def register_read_models(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register the composed analytical read models over the test
    tables: ``vw_pairs_candidate`` (rank + |rho| banding + decoration)
    and ``vw_pairs_candidate_q`` (the full corr → p → BH-FDR q →
    q-banded pipeline) — the reference's two materialized views as
    SQL-addressable relations."""
    from gene_etl_spark.queries.relational3 import (
        q_candidate_view,
        q_candidate_view_q,
    )

    q_candidate_view(spark, sf_dir).createOrReplaceTempView("vw_pairs_candidate")
    q_candidate_view_q(spark, sf_dir).createOrReplaceTempView("vw_pairs_candidate_q")
    return ["vw_pairs_candidate", "vw_pairs_candidate_q"]
