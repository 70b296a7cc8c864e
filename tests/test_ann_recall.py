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
