"""CDC-maintained ANN index (lake/ann_index.py): stream inserts,
updates (including cell-moving ones), and deletes into the embeddings
base table, refresh, and assert the incrementally maintained index —
assignments AND centroids AND search results — equals a from-scratch
rebuild over the same base state."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gene_etl_spark.lake.ann_index import IvfVectorIndex, srp_cell_expr
from gene_etl_spark.lake.table import LakeTable

DIM = 8


def _emb_schema():
    return T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
        ]
    )


def _vecs(rng, n, start_id=0):
    return [
        (start_id + i, [float(x) for x in rng.standard_normal(DIM)])
        for i in range(n)
    ]


def _merge(spark, table, rows, lsn0):
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
    table.merge(df, batch_id=f"b{lsn0}", start_lsn=lsn0 - 1, end_lsn=lsn0 + len(rows))


def _delete(spark, table, vec_ids, lsn0):
    df = spark.createDataFrame(
        [(vid, None, "D", lsn0 + j, None) for j, vid in enumerate(vec_ids)],
        T.StructType(
            list(_emb_schema().fields)
            + [
                T.StructField("op", T.StringType()),
                T.StructField("lsn", T.LongType()),
                T.StructField("ts", T.TimestampType()),
            ]
        ),
    )
    table.merge(df, batch_id=f"d{lsn0}", start_lsn=lsn0 - 1, end_lsn=lsn0 + len(vec_ids))


def _index_state(idx):
    return {
        (r.cell, r.vec_id): tuple(round(x, 9) for x in r.embedding)
        for r in idx.table.read().collect()
    }


def _centroid_state(idx):
    return {
        r.cell: (r.n_vecs, tuple(round(x, 6) for x in r.centroid))
        for r in idx.centroids.read().collect()
    }


@pytest.fixture()
def base(spark, workdir):
    return LakeTable.create(
        spark,
        os.path.join(workdir, "emb"),
        _emb_schema(),
        key_cols=["vec_id"],
        num_buckets=4,
    )


def test_incremental_equals_full_rebuild(spark, workdir, base):
    rng = np.random.default_rng(5)
    _merge(spark, base, _vecs(rng, 40), lsn0=1)
    idx = IvfVectorIndex(
        spark, os.path.join(workdir, "ann"), base, dim=DIM, n_bits=3
    )
    idx.refresh()

    # every live vector is assigned exactly once, to its SRP cell
    assigned = _index_state(idx)
    assert len(assigned) == 40
    expected_cells = {
        r.vec_id: r.c
        for r in base.read()
        .select("vec_id", srp_cell_expr("embedding", DIM, 3).alias("c"))
        .collect()
    }
    for (cell, vid), _emb in assigned.items():
        assert cell == expected_cells[vid]

    # change stream: 10 replaced embeddings (cell moves likely), 5
    # deletes, 8 inserts — three separate base commits
    _merge(spark, base, _vecs(rng, 10, start_id=0), lsn0=100)
    _delete(spark, base, [30, 31, 32, 33, 34], lsn0=200)
    _merge(spark, base, _vecs(rng, 8, start_id=100), lsn0=300)
    r = idx.refresh()
    assert r["refreshed"] and not r["full_rebuild"]

    # rebuild from scratch over the SAME base state
    fresh = IvfVectorIndex(
        spark, os.path.join(workdir, "ann_fresh"), base, dim=DIM, n_bits=3
    )
    fresh.refresh()

    assert _index_state(idx) == _index_state(fresh)
    assert _centroid_state(idx) == _centroid_state(fresh)
    assert len(_index_state(idx)) == base.read().count() == 43

    # search parity: same query, same probes, identical results
    q = [float(x) for x in np.random.default_rng(9).standard_normal(DIM)]
    got = [(r.vec_id, r.cell, r.cosine) for r in idx.search(q, k=5, nprobe=3).collect()]
    exp = [(r.vec_id, r.cell, r.cosine) for r in fresh.search(q, k=5, nprobe=3).collect()]
    assert got == exp and len(got) == 5


def test_refresh_idempotent_and_fenced(spark, workdir, base):
    rng = np.random.default_rng(6)
    _merge(spark, base, _vecs(rng, 12), lsn0=1)
    idx = IvfVectorIndex(
        spark, os.path.join(workdir, "ann"), base, dim=DIM, n_bits=3
    )
    assert idx.refresh()["refreshed"]
    v = idx.table.version
    out = idx.refresh()  # nothing new
    assert not out["refreshed"]
    assert idx.table.version == v


def test_refresh_spans_base_compaction(spark, workdir, base):
    """A refresh range including a base compaction commit (no change
    rows) plus real embedding updates still converges to the rebuild
    state."""
    from gene_etl_spark.lake.maintenance import compact

    rng = np.random.default_rng(11)
    _merge(spark, base, _vecs(rng, 20), lsn0=1)
    _merge(spark, base, _vecs(rng, 4, start_id=5), lsn0=50)
    idx = IvfVectorIndex(
        spark, os.path.join(workdir, "ann"), base, dim=DIM, n_bits=3
    )
    idx.refresh()
    compact(base, max_files_per_bucket=1)
    _merge(spark, base, _vecs(rng, 3, start_id=0), lsn0=100)
    _delete(spark, base, [17], lsn0=200)
    r = idx.refresh()
    assert r["refreshed"] and not r["full_rebuild"]
    fresh = IvfVectorIndex(
        spark, os.path.join(workdir, "ann_fresh"), base, dim=DIM, n_bits=3
    )
    fresh.refresh()
    assert _index_state(idx) == _index_state(fresh)
    assert _centroid_state(idx) == _centroid_state(fresh)


def test_search_many_matches_per_query_search(spark, workdir, base):
    """Batch ANN (search_many) returns the same top-k per query as the
    single-vector search — same probes, same rounded cosines, same
    tiebreaks — with no per-query driver loop."""
    import pyspark.sql.types as T

    rng = np.random.default_rng(13)
    _merge(spark, base, _vecs(rng, 35), lsn0=1)
    idx = IvfVectorIndex(
        spark, os.path.join(workdir, "ann"), base, dim=DIM, n_bits=3
    )
    idx.refresh()
    qs = [[float(x) for x in rng.standard_normal(DIM)] for _ in range(4)]
    qdf = spark.createDataFrame(
        [(i, q) for i, q in enumerate(qs)],
        T.StructType(
            [
                T.StructField("query_id", T.LongType(), False),
                T.StructField("embedding", T.ArrayType(T.DoubleType()), False),
            ]
        ),
    )
    batch = {
        (r.query_id, r.rank): (r.vec_id, r.cell, r.cosine)
        for r in idx.search_many(qdf, k=5, nprobe=2).collect()
    }
    for i, q in enumerate(qs):
        single = [
            (r.vec_id, r.cell, r.cosine)
            for r in idx.search(q, k=5, nprobe=2).collect()
        ]
        got = [batch[(i, rank)] for rank in range(1, len(single) + 1)]
        assert got == single


def test_search_probes_are_bucket_pruned(spark, workdir, base):
    """The probed-cell read must scan only the probed cells' buckets."""
    rng = np.random.default_rng(7)
    _merge(spark, base, _vecs(rng, 30), lsn0=1)
    idx = IvfVectorIndex(
        spark, os.path.join(workdir, "ann"), base, dim=DIM, n_bits=3
    )
    idx.refresh()
    q = [float(x) for x in rng.standard_normal(DIM)]
    res = idx.search(q, k=3, nprobe=1)
    files = res.inputFiles()
    all_files = idx.table.read().inputFiles()
    assert files and len(set(files)) < len(set(all_files))
