"""Decontamination: planted verbatim inclusions are caught, clean docs
survive, the plan broadcasts the eval side (no train-corpus shuffle),
and the hash-join result matches a DuckDB string-level oracle."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gene_etl_spark.operators.decontaminate import (
    decontaminate,
    find_contaminated,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture()
def corpora(spark, workdir):
    """Train = real documents; eval = 5 synthetic questions, 3 of which
    were verbatim-pasted into chosen train docs (planted leakage)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    evals = [
        (900 + i, " ".join(f"evalword{i}x{j}" for j in range(12))) for i in range(5)
    ]
    leaked = {0: 7, 1: 123, 2: 305}  # eval idx -> train doc id
    pdf = docs.toPandas()
    for ei, did in leaked.items():
        pdf.loc[pdf.doc_id == did, "text"] = (
            pdf.loc[pdf.doc_id == did, "text"] + " " + evals[ei][1]
        )
    train = spark.createDataFrame(pdf)
    train.write.mode("overwrite").parquet(f"{workdir}/train.parquet")
    ev = spark.createDataFrame(pd.DataFrame(evals, columns=["doc_id", "text"]))
    return (
        spark.read.parquet(f"{workdir}/train.parquet"),
        ev,
        leaked,
        f"{workdir}/train.parquet",
        evals,
    )


def test_planted_leaks_found_and_removed(spark, corpora):
    train, ev, leaked, _, _ = corpora
    hits = find_contaminated(train, ev, n=8).collect()
    got = {(r.train_doc, r.eval_doc) for r in hits}
    assert got == {(did, 900 + ei) for ei, did in leaked.items()}
    assert all(r.n_shared_ngrams >= 5 for r in hits)  # 12-word paste -> 5 8-grams

    clean = decontaminate(train, ev, n=8)
    kept = {r.doc_id for r in clean.select("doc_id").collect()}
    assert kept == {r.doc_id for r in train.collect()} - set(leaked.values())


def test_matches_duckdb_string_oracle(spark, corpora):
    train, ev, _, train_path, evals = corpora
    got = {
        (r.train_doc, r.eval_doc, r.n_shared_ngrams)
        for r in find_contaminated(train, ev, n=8).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW train AS SELECT * FROM read_parquet('{train_path}/*.parquet')"
    )
    con.execute(
        "CREATE VIEW evals AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in evals)
        + ") v(doc_id, text)"
    )

    def cte(name, src):
        return f"""
    {name} AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, len(arr) - 6),
               i -> list_reduce(arr[i:i+7], (a, b) -> a || ' ' || b)))) AS gram
      FROM (SELECT doc_id,
                   string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS arr
            FROM {src})
      WHERE len(arr) >= 8
    )"""

    exp = {
        (r[0], r[1], r[2])
        for r in con.execute(
            "WITH "
            + cte("tg", "train")
            + ","
            + cte("eg", "evals")
            + """
        SELECT tg.doc_id, eg.doc_id, COUNT(*)::BIGINT
        FROM tg JOIN eg ON tg.gram = eg.gram
        GROUP BY 1, 2
        """
        ).fetchall()
    }
    assert got == exp and got


def test_eval_side_broadcasts(spark, corpora):
    train, ev, _, _, _ = corpora
    from gene_etl_spark.plans import formatted_plan

    plan = formatted_plan(find_contaminated(train, ev, n=8))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # the train corpus is never shuffled for the join
