"""Streaming corpus construction (streaming/corpus.py): drain a docs
directory epoch-by-epoch, dedup each epoch against the accumulating
corpus via the CDC-maintained index, and verify exactly-once on
restart."""

import os

import pytest
from pyspark.sql import types as T

from gene_etl_spark.lake.dedup_index import CorpusDedupIndex
from gene_etl_spark.lake.table import LakeTable
from gene_etl_spark.streaming.corpus import corpus_stream


def _text(i: int, n: int = 35) -> str:
    return " ".join(f"s{i}y{k}" for k in range(n))


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


def test_stream_builds_deduped_corpus_exactly_once(spark, workdir, corpus):
    idx = CorpusDedupIndex(spark, os.path.join(workdir, "dix"), corpus)
    docs_dir = os.path.join(workdir, "incoming")

    # file 1: six fresh docs; file 2 (a later epoch): one cross-epoch
    # exact dup, one fresh doc, one short doc
    spark.createDataFrame(
        [(i, "en", _text(i)) for i in range(6)], _doc_schema()
    ).coalesce(1).write.mode("append").parquet(docs_dir)
    spark.createDataFrame(
        [(100, "en", _text(2)), (101, "en", _text(50)), (102, "en", "tiny")],
        _doc_schema(),
    ).coalesce(1).write.mode("append").parquet(docs_dir)

    ckpt = os.path.join(workdir, "ckpt")
    out = corpus_stream(
        spark, docs_dir, corpus, idx, ckpt, max_files_per_trigger=1
    )
    assert len(out["epochs"]) == 2
    ids = {r.doc_id for r in corpus.read().select("doc_id").collect()}
    assert ids == set(range(6)) | {101}

    # index saw every epoch: equals a clean rebuild
    fresh = CorpusDedupIndex(spark, os.path.join(workdir, "dix_fresh"), corpus)
    fresh.refresh()
    live = lambda t: {tuple(r) for r in t.read().collect()}  # noqa: E731
    assert live(idx.bands) == live(fresh.bands)
    assert live(idx.fps) == live(fresh.fps)

    # restart with the same checkpoint: nothing new → no new commits
    v = corpus.version
    out2 = corpus_stream(
        spark, docs_dir, corpus, idx, ckpt, max_files_per_trigger=1
    )
    assert out2["epochs"] == {}
    corpus._manifest_cache = None
    assert corpus.version == v
