"""CDC-maintained eval n-gram index (lake/eval_index.py, round-4
verdict item 8): the decontamination right side refreshes from the
eval corpus's change feed instead of being re-sketched per ingest
batch — eval updates propagate through one refresh, and the per-batch
decontamination plan never touches the eval corpus's files."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from gene_etl_spark.lake.eval_index import EvalNgramIndex
from gene_etl_spark.lake.table import LakeTable

# 8+ words so each doc carries n-grams at the default n=8
EVAL_1 = "alpha beta gamma delta epsilon zeta eta theta iota"
EVAL_2 = "one two three four five six seven eight nine ten"
CLEAN = "totally unrelated words that never appear in any benchmark text here"


def _doc_schema():
    return T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("lang", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )


def _merge(spark, table, rows, lsn0, op="U"):
    df = spark.createDataFrame(
        [(did, "en", txt, op, lsn0 + j, None) for j, (did, txt) in enumerate(rows)],
        T.StructType(
            list(_doc_schema().fields)
            + [
                T.StructField("op", T.StringType()),
                T.StructField("lsn", T.LongType()),
                T.StructField("ts", T.TimestampType()),
            ]
        ),
    )
    table.merge(
        df, batch_id=f"{op}{lsn0}", start_lsn=lsn0 - 1, end_lsn=lsn0 + len(rows)
    )


def _eval_base(spark, workdir):
    return LakeTable.create(
        spark, os.path.join(workdir, "eval"), _doc_schema(),
        key_cols=["doc_id"], num_buckets=2,
    )


def _gram_state(idx):
    return {(r.gh, r.doc_id) for r in idx.table.read().collect()}


def test_incremental_equals_full_rebuild(spark, workdir):
    base = _eval_base(spark, workdir)
    _merge(spark, base, [(1, EVAL_1), (2, EVAL_2), (3, CLEAN)], lsn0=1)
    idx = EvalNgramIndex(spark, os.path.join(workdir, "eix"), base)
    assert idx.refresh()["refreshed"]

    # update, delete, insert, and a text→NULL (delete-equivalent)
    _merge(spark, base, [(1, EVAL_2 + " extended with more words")], lsn0=100)
    _merge(spark, base, [(2, None)], lsn0=200, op="D")
    _merge(spark, base, [(4, "brand new benchmark sentence with eight plus words")], lsn0=300)
    _merge(spark, base, [(3, None)], lsn0=400)  # real text → NULL
    r = idx.refresh()
    assert r["refreshed"] and not r["full_rebuild"]

    fresh = EvalNgramIndex(spark, os.path.join(workdir, "eix_f"), base)
    fresh.refresh()
    assert _gram_state(idx) == _gram_state(fresh)
    # deleted + nulled docs have no grams
    live_ids = {d for _g, d in _gram_state(idx)}
    assert live_ids == {1, 4}

    # fenced: nothing new → no-op, no new commits
    v = idx.table.version
    assert not idx.refresh()["refreshed"]
    assert idx.table.version == v


def test_eval_update_propagates_and_no_eval_rescan(spark, workdir):
    base = _eval_base(spark, workdir)
    _merge(spark, base, [(1, EVAL_1)], lsn0=1)
    idx = EvalNgramIndex(spark, os.path.join(workdir, "eix"), base)
    idx.refresh()

    train = spark.createDataFrame(
        [
            (10, "en", f"prefix {EVAL_1} suffix"),   # contaminated vs EVAL_1
            (11, "en", f"prefix {EVAL_2} suffix"),   # matches only EVAL_2
            (12, "en", CLEAN),
        ],
        _doc_schema(),
    )
    kept = idx.decontaminate(train)
    assert {r.doc_id for r in kept.collect()} == {11, 12}

    # the per-batch plan reads ONLY the maintained gram table — never
    # the eval corpus itself (the "no re-sketch" criterion)
    eval_files = [f for f in kept.inputFiles() if os.path.abspath(base.path) in f]
    assert eval_files == []

    # grow the eval suite; one refresh propagates it
    _merge(spark, base, [(2, EVAL_2)], lsn0=100)
    stale = {r.doc_id for r in idx.decontaminate(train).collect()}
    assert stale == {11, 12}  # documented staleness until refresh
    idx.refresh()
    assert {r.doc_id for r in idx.decontaminate(train).collect()} == {12}


def test_ingest_corpus_batch_uses_index(spark, workdir):
    from gene_etl_spark.lake.dedup_index import CorpusDedupIndex
    from gene_etl_spark.pipeline import ingest_corpus_batch

    base = _eval_base(spark, workdir)
    _merge(spark, base, [(1, EVAL_1)], lsn0=1)
    eix = EvalNgramIndex(spark, os.path.join(workdir, "eix"), base)
    eix.refresh()

    corpus = LakeTable.create(
        spark, os.path.join(workdir, "corpus"), _doc_schema(),
        key_cols=["doc_id"], num_buckets=2,
    )
    dix = CorpusDedupIndex(spark, os.path.join(workdir, "dix"), corpus)
    pad = " ".join(f"pad{i}" for i in range(30))
    batch = spark.createDataFrame(
        [
            (100, "en", f"{EVAL_1} {pad}"),           # contaminated
            (101, "en", f"{EVAL_2} {pad} extra"),     # clean vs EVAL_1
        ],
        _doc_schema(),
    )
    r = ingest_corpus_batch(
        spark, corpus, dix, batch, batch_id="b1", lsn=1,
        min_tokens=10, eval_index=eix,
    )
    ids = {x.doc_id for x in corpus.read().select("doc_id").collect()}
    assert ids == {101}
    assert r["stats"]["corpus_deduped"] == 1


def test_gram_parameter_pinning(spark, workdir):
    """Reopening with a different gram width must refuse (the
    index-family contract): grams hashed with a new n would never match
    the stored rows, so tombstoning silently misses forever."""
    import pytest

    base = _eval_base(spark, workdir)
    _merge(spark, base, [(1, EVAL_1)], lsn0=1)
    path = os.path.join(workdir, "eix")
    EvalNgramIndex(spark, path, base).refresh()
    assert os.path.exists(os.path.join(path, "_eval_meta.json"))
    with pytest.raises(ValueError, match="gram parameters"):
        EvalNgramIndex(spark, path, base, n=13)
    # same parameters reopen fine
    EvalNgramIndex(spark, path, base)
