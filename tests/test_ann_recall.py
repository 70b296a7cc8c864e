"""ANN search-quality gate (round-4 verdict item 4): recall@k of
IvfVectorIndex.search / search_many against the brute-force exact
top-k on planted near-dup corpora, at two corpus sizes and two nprobe
values. The probe-choice parity gates pin that the engine agrees with
its oracle; this pins that the INDEX DESIGN retrieves the right
neighbors — floors 0.90 @ nprobe=2 and 0.95 @ nprobe=4 (measured
0.93–0.95 / 0.99 on this seed; see BENCH/BASELINE.md round-5 table)."""

import os

import numpy as np
import pytest
from pyspark.sql import types as T

from gene_etl_spark.lake.ann_index import ANN_SRP_SEED, IvfVectorIndex
from gene_etl_spark.lake.table import LakeTable

DIM = 16
N_BITS = 3
N_CLUSTERS = 20
NOISE = 0.05
K = 10
N_QUERIES = 15


def _emb_schema():
    return T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
        ]
    )


def _planted(n: int, seed: int = 7):
    """Clustered corpus + queries near cluster centers — the near-dup
    retrieval shape ANN indexes exist for."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.array(
        [
            centers[i % N_CLUSTERS] + NOISE * rng.standard_normal(DIM)
            for i in range(n)
        ]
    )
    queries = np.array(
        [
            centers[qi % N_CLUSTERS] + NOISE * rng.standard_normal(DIM)
            for qi in range(N_QUERIES)
        ]
    )
    return vecs, queries


def _true_topk(vecs: np.ndarray, q: np.ndarray, k: int) -> set:
    """Exact top-k under the engine's own ordering (cosine rounded to
    5, ties by vec_id asc)."""
    qn = q / np.linalg.norm(q)
    cos = np.round(vecs @ qn / np.linalg.norm(vecs, axis=1), 5)
    return set(np.lexsort((np.arange(len(vecs)), -cos))[:k])


def _build_index(spark, workdir, vecs, tag):
    base = LakeTable.create(
        spark, os.path.join(workdir, f"emb_{tag}"), _emb_schema(),
        key_cols=["vec_id"], num_buckets=4,
    )
    df = spark.createDataFrame(
        [
            (i, [float(x) for x in v], "U", i + 1, None)
            for i, v in enumerate(vecs)
        ],
        T.StructType(
            list(_emb_schema().fields)
            + [
                T.StructField("op", T.StringType()),
                T.StructField("lsn", T.LongType()),
                T.StructField("ts", T.TimestampType()),
            ]
        ),
    )
    base.merge(df, batch_id="seed", start_lsn=0, end_lsn=len(vecs))
    idx = IvfVectorIndex(
        spark, os.path.join(workdir, f"ann_{tag}"), base,
        dim=DIM, n_bits=N_BITS, num_buckets=4,
    )
    idx.refresh()
    return idx


@pytest.mark.parametrize("n", [200, 800])
def test_recall_floor_two_sizes_two_nprobes(spark, workdir, n):
    vecs, queries = _planted(n)
    idx = _build_index(spark, workdir, vecs, f"n{n}")
    qdf = spark.createDataFrame(
        [(qi, [float(x) for x in q]) for qi, q in enumerate(queries)],
        T.StructType(
            [
                T.StructField("query_id", T.LongType(), False),
                T.StructField("embedding", T.ArrayType(T.DoubleType()), False),
            ]
        ),
    )
    floors = {2: 0.90, 4: 0.95}
    measured = {}
    for nprobe, floor in floors.items():
        got: dict[int, set] = {}
        for r in idx.search_many(qdf, k=K, nprobe=nprobe).collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        recalls = [
            len(got.get(qi, set()) & _true_topk(vecs, q, K)) / K
            for qi, q in enumerate(queries)
        ]
        measured[nprobe] = float(np.mean(recalls))
        assert measured[nprobe] >= floor, (n, nprobe, measured[nprobe])
    # spot-check the single-query path scores the same recall
    q0 = queries[0]
    single = {r.vec_id for r in idx.search([float(x) for x in q0], k=K, nprobe=2).collect()}
    assert len(single & _true_topk(vecs, q0, K)) / K >= 0.8
    # srp seed pinned: a different seed would invalidate the floors
    assert ANN_SRP_SEED == 1729


def _recall_at(idx, vecs, queries, spark, nprobe):
    qdf = spark.createDataFrame(
        [(qi, [float(x) for x in q]) for qi, q in enumerate(queries)],
        T.StructType(
            [
                T.StructField("query_id", T.LongType(), False),
                T.StructField("embedding", T.ArrayType(T.DoubleType()), False),
            ]
        ),
    )
    got: dict[int, set] = {}
    for r in idx.search_many(qdf, k=K, nprobe=nprobe).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [
        len(got.get(qi, set()) & _true_topk(vecs, q, K)) / K
        for qi, q in enumerate(queries)
    ]
    return float(np.mean(recalls))


@pytest.mark.parametrize("n", [200, 800])
def test_refined_nprobe1_recall_floor(spark, workdir, n):
    """Lloyd refinement (round-6): nprobe=1 recall >= 0.85 on both
    planted corpora (SRP alone measured 0.73-0.77), nprobe=2 floor
    preserved, and incremental refresh AFTER refinement stays exact
    (post-refine updates retrieve under the refined quantizer)."""
    vecs, queries = _planted(n)
    idx = _build_index(spark, workdir, vecs, f"ref{n}")
    out = idx.refine_centroids(iters=2)
    assert out["refined"] and out["generation"] == 1

    r1 = _recall_at(idx, vecs, queries, spark, nprobe=1)
    assert r1 >= 0.85, (n, r1)
    r2 = _recall_at(idx, vecs, queries, spark, nprobe=2)
    assert r2 >= 0.90, (n, r2)

    # incremental maintenance under the refined quantizer: move 10
    # vectors onto the opposite side of the space and delete 5; the
    # index must retrieve post-change truth exactly like a fresh scan
    rng = np.random.default_rng(99)
    moved = {int(i): -vecs[i] + 0.01 * rng.standard_normal(DIM) for i in range(10)}
    deleted = set(range(n - 5, n))
    rows = [
        (int(i), [float(x) for x in v], "U", n + 1 + j, None)
        for j, (i, v) in enumerate(sorted(moved.items()))
    ] + [
        (int(i), None, "D", n + 100 + j, None)
        for j, i in enumerate(sorted(deleted))
    ]
    upd = spark.createDataFrame(
        rows,
        T.StructType(
            list(_emb_schema().fields)
            + [
                T.StructField("op", T.StringType()),
                T.StructField("lsn", T.LongType()),
                T.StructField("ts", T.TimestampType()),
            ]
        ),
    )
    idx.base.merge(upd, batch_id="post-refine", start_lsn=n, end_lsn=n + 200)
    res = idx.refresh()
    assert res["refreshed"] and not res.get("full_rebuild")

    vecs2 = vecs.copy()
    for i, v in moved.items():
        vecs2[i] = v
    live = [i for i in range(n) if i not in deleted]
    live_vecs = vecs2[live]

    # the assignment table matches a from-scratch assignment of the
    # live corpus under the refined quantizer (incremental == rebuild)
    state = {
        (r.cell, r.vec_id)
        for r in idx.table.read().select("cell", "vec_id").collect()
    }
    from gene_etl_spark.lake.ann_index import nearest_cell_expr

    expected_df = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs2[i]]) for i in live],
        _emb_schema(),
    )
    expected = {
        (r.cell, r.vec_id)
        for r in expected_df.select(
            nearest_cell_expr("embedding", idx.refined_centroids).alias("cell"),
            "vec_id",
        ).collect()
    }
    assert state == expected

    # retrieval over the changed corpus still clears the refined floor
    def true_topk_live(q):
        qn = q / np.linalg.norm(q)
        cos = np.round(live_vecs @ qn / np.linalg.norm(live_vecs, axis=1), 5)
        order = np.lexsort((np.array(live), -cos))[:K]
        return {live[j] for j in order}

    got = {
        r.vec_id
        for r in idx.search([float(x) for x in queries[0]], k=K, nprobe=1).collect()
    }
    assert len(got & true_topk_live(queries[0])) / K >= 0.8


def test_refine_crash_heal_and_reopen(spark, workdir):
    """Crash window between the sidecar pin and the reassignment
    commit: a reopened index heals idempotently on the next refresh."""
    import json
    import os

    vecs, queries = _planted(200)
    idx = _build_index(spark, workdir, vecs, "heal")

    # crash exactly between the sidecar pin and the reassignment merge
    def _boom(*a, **k):
        raise RuntimeError("injected crash")

    idx._apply_reassignment = _boom
    with pytest.raises(RuntimeError, match="injected crash"):
        idx.refine_centroids(iters=1)

    with open(idx._meta_path) as fh:
        meta = json.load(fh)
    assert meta["refine_batch_id"]
    assert meta["refine_batch_id"] not in idx.table.committed_batches()

    from gene_etl_spark.lake.ann_index import IvfVectorIndex

    idx2 = IvfVectorIndex(spark, idx.path, idx.base)
    assert idx2.refined_centroids is not None and idx2.quantizer_gen == 1
    idx2.refresh()  # heals: reassignment re-applied
    assert meta["refine_batch_id"] in idx2.table.committed_batches()
    r1 = _recall_at(idx2, vecs, queries, spark, nprobe=1)
    assert r1 >= 0.85, r1
