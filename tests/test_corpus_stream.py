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


def test_replayed_epoch_refreshes_stale_index(spark, workdir, corpus):
    """Crash between an epoch's corpus MERGE and its index fold: the
    replayed (fenced) epoch must refresh the index, or the NEXT epoch
    probes stale state and re-admits duplicates."""
    import hashlib
    import time

    from pyspark.sql import functions as F

    idx = CorpusDedupIndex(spark, os.path.join(workdir, "dix"), corpus)
    docs_dir = os.path.join(workdir, "incoming")
    ckpt = os.path.join(workdir, "ckpt")
    ckpt_fp = hashlib.md5(os.path.abspath(ckpt).encode()).hexdigest()[:8]

    spark.createDataFrame(
        [(i, "en", _text(i)) for i in range(3)], _doc_schema()
    ).coalesce(1).write.mode("append").parquet(docs_dir)
    corpus_stream(spark, docs_dir, corpus, idx, ckpt, max_files_per_trigger=1)

    # simulate the crashed epoch 1: its merge committed (fenced batch
    # id) but the index fold never ran
    corpus._manifest_cache = None
    corpus.merge(
        spark.createDataFrame([(10, "en", _text(10))], _doc_schema())
        .withColumn("op", F.lit("U"))
        .withColumn("lsn", F.lit(corpus.version + 1).cast("long"))
        .withColumn("ts", F.lit(None).cast("timestamp")),
        batch_id=f"corpus-{ckpt_fp}-epoch-1",
        start_lsn=corpus.version, end_lsn=corpus.version + 1,
    )
    time.sleep(1.1)
    spark.createDataFrame(
        [(10, "en", _text(10))], _doc_schema()
    ).coalesce(1).write.mode("append").parquet(docs_dir)  # epoch 1 replay
    time.sleep(1.1)
    spark.createDataFrame(
        [(20, "en", _text(10)), (21, "en", _text(30))], _doc_schema()
    ).coalesce(1).write.mode("append").parquet(docs_dir)  # epoch 2

    out = corpus_stream(spark, docs_dir, corpus, idx, ckpt, max_files_per_trigger=1)
    # epoch 1 was fenced (replay); epoch 2 must have deduped doc 20
    # against doc 10 — which it only sees if the fence refreshed
    assert 1 not in out["epochs"]
    ids = {r.doc_id for r in corpus.read().select("doc_id").collect()}
    assert ids == {0, 1, 2, 10, 21}


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
