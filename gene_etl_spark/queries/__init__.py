"""Query registry: every implemented operator from SURVEY.md §2 exposed
as a (spark, sf_dir) -> DataFrame callable plus, where SQL-expressible,
a DuckDB oracle SQL string over the same parquet tables.

Conventions for driver hash parity:
- every computed column is aliased identically in Spark and SQL;
- counts/sums of integers are cast to BIGINT on both sides;
- float outputs are rounded explicitly on both sides;
- LIMIT queries carry deterministic tiebreak orderings.
"""

from __future__ import annotations


def all_queries():
    from gene_etl_spark.queries import cdc, relational, textops

    q: dict = {}
    o: dict = {}
    for mod in (relational, textops, cdc):
        q.update(mod.QUERIES)
        o.update(mod.ORACLES)
    return q, o
