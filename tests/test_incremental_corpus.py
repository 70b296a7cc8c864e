"""Incremental corpus construction (pipeline.ingest_corpus_batch):
per-batch quality gating + within-batch dedup + cross-corpus dedup via
the CDC-maintained index, with the index folding each commit so the
next batch sees this one."""

import os

import pytest
from pyspark.sql import types as T

from gene_etl_spark.lake.dedup_index import CorpusDedupIndex
from gene_etl_spark.lake.table import LakeTable
from gene_etl_spark.pipeline import ingest_corpus_batch

def _text(i: int, n: int = 35) -> str:
    # per-doc-disjoint vocab: no two docs share a single token, so the
    # only near-dups are the ones the test plants
    return " ".join(f"w{i}x{k}" for k in range(n))


def _near(i: int) -> str:
    toks = _text(i).split()
    toks[0] = "zzz"  # 1-token edit; band collision verified per fixture
    return " ".join(toks)


def _doc_schema():
    return T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("lang", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )


@pytest.fixture()
def corpus(spark, workdir):
    return LakeTable.create(
        spark,
        os.path.join(workdir, "corpus"),
        _doc_schema(),
        key_cols=["doc_id"],
        num_buckets=4,
    )


def test_two_batch_ingest_and_index_consistency(spark, workdir, corpus):
    idx = CorpusDedupIndex(spark, os.path.join(workdir, "dix"), corpus)

    b1 = spark.createDataFrame(
        [(i, "en", _text(i)) for i in range(10)]
        + [
            (100, "en", _text(2)),        # within-batch exact dup of 2
            (101, "en", _near(3)),        # within-batch near dup of 3
            (102, "en", "too short"),     # fails the quality gate
        ],
        _doc_schema(),
    )
    r1 = ingest_corpus_batch(
        spark, corpus, idx, b1, batch_id="b1", lsn=1
    )
    s = r1["stats"]
    assert s["input"] == 13
    assert s["gated"] == 12          # the short doc dropped
    assert s["batch_deduped"] == 10  # 100 (exact) and 101 (near) dropped
    assert s["corpus_deduped"] == 10  # empty corpus: nothing cross-matches
    assert s["merged"] == 10
    assert corpus.read().count() == 10

    b2 = spark.createDataFrame(
        [
            (200, "en", _text(5)),    # cross-corpus exact dup of 5
            (201, "en", _near(7)),    # cross-corpus near dup of 7
            (202, "en", _text(50)),   # fresh
        ],
        _doc_schema(),
    )
    r2 = ingest_corpus_batch(
        spark, corpus, idx, b2, batch_id="b2", lsn=2
    )
    s2 = r2["stats"]
    assert s2["gated"] == 3 and s2["batch_deduped"] == 3
    assert s2["corpus_deduped"] == 1 and s2["merged"] == 1
    ids = {r.doc_id for r in corpus.read().select("doc_id").collect()}
    assert ids == set(range(10)) | {202}

    # after two chained refreshes the index equals a clean rebuild
    fresh = CorpusDedupIndex(
        spark, os.path.join(workdir, "dix_fresh"), corpus
    )
    fresh.refresh()
    live = lambda t: {  # noqa: E731
        tuple(r) for r in t.read().collect()
    }
    assert live(idx.bands) == live(fresh.bands)
    assert live(idx.fps) == live(fresh.fps)

    # full build_corpus stage parity: a third batch with an eval-set
    # leak and a lang cut exercises decontamination + mixing inline
    b3 = spark.createDataFrame(
        [(300, "en", _text(60)), (301, "fr", _text(61)), (302, "en", _text(62))],
        _doc_schema(),
    )
    eval_set = spark.createDataFrame(
        [(9000, "en", _text(60))], _doc_schema()  # verbatim leak of 300
    ).select("doc_id", "text")
    r3 = ingest_corpus_batch(
        spark, corpus, idx, b3, batch_id="b3", lsn=3,
        eval_set=eval_set, lang_fractions={"fr": 0.0},
    )
    assert r3["stats"]["corpus_deduped"] == 1  # 300 leaked, 301 mixed out
    ids3 = {r.doc_id for r in corpus.read().select("doc_id").collect()}
    assert ids3 == ids | {302}

    # replaying an already-committed batch id refuses rather than
    # double-applying (callers that need skip-semantics fence first,
    # as streaming/corpus.py does)
    from gene_etl_spark.lake.table import CommitConflict

    corpus._manifest_cache = None
    v = corpus.version
    with pytest.raises(CommitConflict):
        ingest_corpus_batch(spark, corpus, idx, b2, batch_id="b2", lsn=3)
    corpus._manifest_cache = None
    assert corpus.version == v
