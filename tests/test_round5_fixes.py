"""Round-5 ADVICE regression tests: NULL-text guard in the dedup
index, half-initialized-index self-healing, zero-norm NaN guards in
ANN search/search_many, and the corpus stream's drained flag."""

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gene_etl_spark.lake.ann_index import IvfVectorIndex
from gene_etl_spark.lake.dedup_index import CorpusDedupIndex, sketch_docs
from gene_etl_spark.lake.table import LakeTable

VOCAB = [f"w{i:02d}" for i in range(97)]


def _text(i: int, n: int = 25) -> str:
    return " ".join(VOCAB[(i * 3 + k) % 97] for k in range(n))


def _doc_schema():
    return T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("lang", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )


def _merge_docs(spark, table, rows, lsn0, op="U"):
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


@pytest.fixture()
def docs_base(spark, workdir):
    return LakeTable.create(
        spark,
        os.path.join(workdir, "docs"),
        _doc_schema(),
        key_cols=["doc_id"],
        num_buckets=4,
    )


# --------------------------------------------------------------------- #
# NULL text (ADVICE medium)
# --------------------------------------------------------------------- #
def test_sketch_docs_drops_null_text(spark):
    df = spark.createDataFrame(
        [(1, "en", _text(1)), (2, "en", None), (3, "en", _text(3))],
        _doc_schema(),
    )
    sk = sketch_docs(df, "doc_id", "text")
    ids = {r.doc_id for r in sk.select("doc_id").distinct().collect()}
    assert ids == {1, 3}
    # no null keys anywhere in the sketch rows
    assert sk.where(F.col("fp").isNull() | F.col("bucket").isNull()).count() == 0


def test_text_to_null_update_is_a_delete(spark, workdir, docs_base):
    """A doc updated real-text→NULL must vanish from the index (its old
    slots tombstoned), exactly like a delete — and the incremental state
    must equal a from-scratch rebuild over the same base."""
    _merge_docs(spark, docs_base, [(i, _text(i)) for i in range(6)], lsn0=1)
    idx = CorpusDedupIndex(spark, os.path.join(workdir, "dix"), docs_base)
    idx.refresh()
    assert idx.fps.read().where(F.col("doc_id") == 0).count() == 1

    _merge_docs(spark, docs_base, [(0, None)], lsn0=100)
    r = idx.refresh()
    assert r["refreshed"] and not r["full_rebuild"]
    assert idx.fps.read().where(F.col("doc_id") == 0).count() == 0
    assert idx.bands.read().where(F.col("doc_id") == 0).count() == 0

    fresh = CorpusDedupIndex(spark, os.path.join(workdir, "dix_f"), docs_base)
    fresh.refresh()
    live = lambda t: {tuple(r) for r in t.read().collect()}  # noqa: E731
    assert live(idx.bands) == live(fresh.bands)
    assert live(idx.fps) == live(fresh.fps)

    # probing a batch that contains a null-text doc neither matches nor
    # fails on it
    probe = idx.probe(
        spark.createDataFrame(
            [(50, "en", None), (51, "en", _text(3))], _doc_schema()
        ).select("doc_id", "text")
    )
    got = {(r.doc_id, r.match_kind) for r in probe.collect()}
    idx.release()
    assert got == {(51, "exact")}


# --------------------------------------------------------------------- #
# half-initialized index self-heals (ADVICE low)
# --------------------------------------------------------------------- #
def test_half_initialized_index_self_heals(spark, workdir, docs_base):
    _merge_docs(spark, docs_base, [(i, _text(i)) for i in range(5)], lsn0=1)
    path = os.path.join(workdir, "dix")

    # crash between the two creates: only one sketch table exists
    CorpusDedupIndex(spark, path, docs_base)
    shutil.rmtree(path)  # bands gone, fps + meta sidecar remain
    idx = CorpusDedupIndex(spark, path, docs_base)  # must not raise
    idx.refresh()

    # the mirror crash: fps dir (which holds the meta sidecar) gone
    path2 = os.path.join(workdir, "dix2")
    CorpusDedupIndex(spark, path2, docs_base)
    shutil.rmtree(path2 + "_fp")
    idx2 = CorpusDedupIndex(spark, path2, docs_base)
    idx2.refresh()

    fresh = CorpusDedupIndex(spark, os.path.join(workdir, "dix_f"), docs_base)
    fresh.refresh()
    live = lambda t: {tuple(r) for r in t.read().collect()}  # noqa: E731
    for healed in (idx, idx2):
        assert live(healed.bands) == live(fresh.bands)
        assert live(healed.fps) == live(fresh.fps)

    # parameter pinning still enforced after healing
    import json

    meta_path = os.path.join(path + "_fp", "_dedup_meta.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    meta["num_hashes"] = 3
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    with pytest.raises(ValueError, match="num_hashes"):
        CorpusDedupIndex(spark, path, docs_base)


# --------------------------------------------------------------------- #
# zero-norm vectors in ANN search (ADVICE low)
# --------------------------------------------------------------------- #
DIM = 8


def _emb_schema():
    return T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
        ]
    )


def _merge_vecs(spark, table, rows, lsn0):
    df = spark.createDataFrame(
        [(vid, emb, "U", lsn0 + j, None) for j, (vid, emb) in enumerate(rows)],
        T.StructType(
            list(_emb_schema().fields)
            + [
                T.StructField("op", T.StringType()),
                T.StructField("lsn", T.LongType()),
                T.StructField("ts", T.TimestampType()),
            ]
        ),
    )
    table.merge(
        df, batch_id=f"b{lsn0}", start_lsn=lsn0 - 1, end_lsn=lsn0 + len(rows)
    )


def test_zero_norm_vectors_score_minus_one_and_parity(spark, workdir):
    """A zero embedding lands in cell 0 (all SRP dots are 0) and makes
    that cell's centroid zero-norm: unguarded, search_many's cosine is
    0/0 = NaN, which desc() sorts ABOVE every real score — the
    degenerate cell would be probed FIRST and the dead vector would
    outrank real neighbors. Both paths must score it -1.0 and stay
    per-query identical."""
    base = LakeTable.create(
        spark,
        os.path.join(workdir, "emb"),
        _emb_schema(),
        key_cols=["vec_id"],
        num_buckets=4,
    )
    from gene_etl_spark.lake.ann_index import ANN_SRP_SEED

    rng = np.random.default_rng(3)
    # keep cell 0 empty of real vectors (cell 0 = all SRP dots ≤ 0, so
    # random draws CAN land there) — the zero vector must be its only
    # occupant for the centroid to be exactly zero-norm
    planes = np.random.RandomState(ANN_SRP_SEED).standard_normal((3, DIM))
    rows = []
    while len(rows) < 20:
        v = rng.standard_normal(DIM)
        if sum(1 << b for b in range(3) if planes[b] @ v > 0) != 0:
            rows.append((len(rows), [float(x) for x in v]))
    rows.append((999, [0.0] * DIM))
    _merge_vecs(spark, base, rows, lsn0=1)
    idx = IvfVectorIndex(
        spark, os.path.join(workdir, "ann"), base, dim=DIM, n_bits=3
    )
    idx.refresh()
    # the planted degenerate: cell 0's centroid must be zero-norm
    cent0 = {
        r.cell: r.centroid for r in idx.centroids.read().collect()
    }.get(0)
    assert cent0 is not None and all(abs(x) < 1e-12 for x in cent0)

    q = [float(x) for x in rng.standard_normal(DIM)]
    k, nprobe = 25, 8  # every cell probed → the zero vector is a candidate
    single = [
        (r.vec_id, r.cell, r.cosine) for r in idx.search(q, k=k, nprobe=nprobe).collect()
    ]
    qdf = spark.createDataFrame(
        [(0, q), (1, [0.0] * DIM)],
        T.StructType(
            [
                T.StructField("query_id", T.LongType(), False),
                T.StructField("embedding", T.ArrayType(T.DoubleType()), False),
            ]
        ),
    )
    many = {
        (r.query_id, r.rank): (r.vec_id, r.cell, r.cosine)
        for r in idx.search_many(qdf, k=k, nprobe=nprobe).collect()
    }
    got = [many[(0, rank)] for rank in range(1, len(single) + 1)]
    assert got == single
    # the zero vector is present, scored -1.0, and ranked LAST
    assert single[-1][0] == 999 and single[-1][2] == -1.0
    assert not any(np.isnan(c) for _v, _c, c in single)

    # zero-norm QUERY parity: search's qn fallback scores everything by
    # raw dot 0 → 0.0 (except zero-norm index vecs at -1.0); search_many
    # must match row for row
    single0 = [
        (r.vec_id, r.cell, r.cosine)
        for r in idx.search([0.0] * DIM, k=5, nprobe=2).collect()
    ]
    many0 = {
        r.rank: (r.vec_id, r.cell, r.cosine)
        for r in idx.search_many(
            qdf.where(F.col("query_id") == 1), k=5, nprobe=2
        ).collect()
    }
    got0 = [many0[rank] for rank in range(1, len(single0) + 1)]
    assert got0 == single0


# --------------------------------------------------------------------- #
# corpus stream surfaces drain completeness (ADVICE low)
# --------------------------------------------------------------------- #
def test_corpus_stream_reports_drained(spark, workdir, docs_base):
    from gene_etl_spark.streaming.corpus import corpus_stream

    corpus = LakeTable.create(
        spark,
        os.path.join(workdir, "corpus"),
        _doc_schema(),
        key_cols=["doc_id"],
        num_buckets=4,
    )
    idx = CorpusDedupIndex(spark, os.path.join(workdir, "cix"), corpus)
    docs_dir = os.path.join(workdir, "incoming")
    spark.createDataFrame(
        # disjoint word soups — the _text windows above overlap between
        # adjacent ids (near-dups by construction), which the ingest
        # pipeline would correctly dedup away
        [(i, "en", " ".join(f"s{i}y{k}" for k in range(35))) for i in range(3)],
        _doc_schema(),
    ).coalesce(1).write.mode("append").parquet(docs_dir)
    out = corpus_stream(
        spark, docs_dir, corpus, idx, os.path.join(workdir, "ckpt")
    )
    assert out["drained"] is True
    assert corpus.read().count() == 3


def test_pinning_enforced_when_fps_manifests_lost(spark, workdir, docs_base):
    """The sidecar check must trigger whenever the meta exists — losing
    the fps table's manifests (partial restore) must not silently skip
    validation and recreate-and-mix under changed sketch constants."""
    import json

    _merge_docs(spark, docs_base, [(1, _text(1))], lsn0=1)
    path = os.path.join(workdir, "dix_lost")
    CorpusDedupIndex(spark, path, docs_base).refresh()
    meta_path = os.path.join(path + "_fp", "_dedup_meta.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    meta["num_hashes"] = 3
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    # lose the fps manifests but keep the sidecar + bands
    shutil.rmtree(os.path.join(path + "_fp", "_manifests"))
    with pytest.raises(ValueError, match="num_hashes"):
        CorpusDedupIndex(spark, path, docs_base)
