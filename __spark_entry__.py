"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC replay (binlog tail → lake
MERGE upsert via the real engine) at sf0.001. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2
plus the training-data pipeline family (dedup / similarity / text
analysis) with DuckDB oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: replay a derived change stream through the CDC engine
    (salted LWW dedup → bucketed copy-on-write MERGE → snapshot commit)
    and return the final lake state."""
    from gene_etl_spark.queries.cdc import q_cdc_replay

    # the driver's session may default to ANSI mode / non-UTC tz; the
    # engine targets SQL null-on-edge-case semantics and UTC timestamps
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return q_cdc_replay(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gene_etl_spark.queries import all_queries

    q, _ = all_queries()
    return q


def oracle_sql() -> dict[str, str]:
    from gene_etl_spark.queries import all_queries

    _, o = all_queries()
    return o
