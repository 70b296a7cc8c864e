"""Deterministic corpus sampling: cross-engine value parity, run-to-run
determinism, key coherence, independent seeds, stratified mixing."""

import duckdb
import pytest
from pyspark.sql import functions as F

from gene_etl_spark.operators.sampling import (
    SAMPLE_MOD,
    hash_sample,
    stratified_sample,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _duck_ids(sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF_DIR}/documents.parquet')"
    )
    return {r[0] for r in con.execute(sql).fetchall()}


def test_hash_sample_matches_duckdb_oracle(spark, docs):
    got = {r.doc_id for r in hash_sample(docs, 0.3, "doc_id", seed=7).collect()}
    exp = _duck_ids(
        """
        SELECT doc_id FROM documents
        WHERE ('0x' || substr(md5(doc_id::VARCHAR || chr(31) || '7'), 1, 15))::BIGINT
              % 1000000 < 300000
        """
    )
    assert got == exp and got  # exact same keys chosen in both engines
    # fraction lands near the target (binomial tolerance)
    n = docs.count()
    assert abs(len(got) / n - 0.3) < 0.08


def test_sample_is_deterministic_and_partitioning_independent(spark, docs):
    a = {r.doc_id for r in hash_sample(docs, 0.5, "doc_id", seed=1).collect()}
    b = {
        r.doc_id
        for r in hash_sample(docs.repartition(17), 0.5, "doc_id", seed=1).collect()
    }
    assert a == b
    # a different seed draws a genuinely different subset
    c = {r.doc_id for r in hash_sample(docs, 0.5, "doc_id", seed=2).collect()}
    assert a != c
    overlap = len(a & c) / len(a)
    assert 0.3 < overlap < 0.7  # ~independent draws at fraction 0.5
    # xxhash64 production path: same guarantees, engine-local
    x1 = {r.doc_id for r in hash_sample(docs, 0.5, "doc_id", 1, "xxhash64").collect()}
    x2 = {
        r.doc_id
        for r in hash_sample(docs.repartition(5), 0.5, "doc_id", 1, "xxhash64").collect()
    }
    assert x1 == x2


def test_stratified_sample_mixes_languages(spark, docs):
    fr = {"en": 1.0, "de": 0.5, "es": 0.0}
    out = stratified_sample(docs, "lang", fr, "doc_id", seed=3, default=0.25)
    got = {r.doc_id for r in out.collect()}
    exp = _duck_ids(
        """
        SELECT doc_id FROM documents
        WHERE ('0x' || substr(md5(doc_id::VARCHAR || chr(31) || '3'), 1, 15))::BIGINT
              % 1000000
              < CASE lang WHEN 'en' THEN 1000000 WHEN 'de' THEN 500000
                          WHEN 'es' THEN 0 ELSE 250000 END
        """
    )
    assert got == exp
    by_lang = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    totals = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_lang["en"] == totals["en"]  # fraction 1.0 keeps everything
    assert "es" not in by_lang  # fraction 0.0 keeps nothing
    assert 0.2 < by_lang["de"] / totals["de"] < 0.8


def test_sample_gate_is_scan_pushed(spark, docs):
    """The sampling predicate is row-local: the plan is scan+filter,
    no exchange, no UDF."""
    from gene_etl_spark.plans import formatted_plan

    plan = formatted_plan(hash_sample(docs, 0.3, "doc_id", seed=7))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sample_mod_covers_extremes(spark, docs):
    n = docs.count()
    assert hash_sample(docs, 1.0, "doc_id").count() == n
    assert hash_sample(docs, 0.0, "doc_id").count() == 0
    assert SAMPLE_MOD == 1_000_000
