"""Repetition quality signals: hand-computable fixtures, a DuckDB twin
on the bigram share, and gate behavior on planted boilerplate."""

import duckdb
import pytest
from pyspark.sql import functions as F

from gene_etl_spark.operators.repetition import (
    repetition_gate,
    repetition_signals,
)

CLEAN = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
LOOPY = "spam ham spam ham spam ham spam ham spam ham spam ham"
DUP_LINES = "one line here\nsecond line\none line here\nthird one\none line here"


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, CLEAN), (2, LOOPY), (3, DUP_LINES)], "doc_id long, text string"
    )


def test_signals_match_hand_computation(spark, docs):
    out = {r.doc_id: r for r in repetition_signals(docs).collect()}
    # clean doc: no duplicate lines, all bigrams distinct
    assert out[1].dup_line_frac == 0.0
    assert out[1].dup_line_char_frac == 0.0
    assert out[1].top_bigram_share == round(1 / 9, 6)
    # loopy doc: 12 tokens -> 11 bigrams, "spam ham" appears 6 times
    assert out[2].top_bigram_share == round(6 / 11, 6)
    # dup-lines doc: 5 lines, 3 distinct -> 2/5 duplicated by count;
    # by characters: "one line here" (13 chars) appears 3x -> its 39
    # chars are all duplicated-line chars; total 13*3+11+9 = 59
    assert out[3].dup_line_frac == round(2 / 5, 6)
    assert out[3].dup_line_char_frac == round(39 / 59, 6)


def test_gate_drops_boilerplate_keeps_clean(spark, docs):
    kept = {r.doc_id for r in repetition_gate(docs).select("doc_id").collect()}
    assert kept == {1}


def test_bigram_share_matches_duckdb_on_corpus(spark):
    """The sorted-run-length expression equals a straightforward
    group-and-max in DuckDB over the real documents table."""
    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    got = {
        r.doc_id: r.top_bigram_share
        for r in repetition_signals(docs).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    exp = dict(
        con.execute(
            r"""
        WITH arrs AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS a
          FROM documents
        ), bg AS (
          SELECT doc_id, len(a) - 1 AS nb,
                 unnest(list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i+1])) AS b
          FROM arrs WHERE len(a) >= 2
        ), counts AS (
          SELECT doc_id, nb, b, COUNT(*) AS c FROM bg GROUP BY 1, 2, 3
        )
        SELECT doc_id, ROUND(MAX(c)::DOUBLE / nb, 6) FROM counts GROUP BY doc_id, nb
        """
        ).fetchall()
    )
    assert got == exp and len(got) == 500


def test_signals_are_scan_fused(spark):
    """Pure column expressions: no exchange, no Python UDF."""
    from gene_etl_spark.plans import formatted_plan

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    plan = formatted_plan(repetition_signals(docs))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
