"""Property-based ANN index maintenance equality (hypothesis) — the
IvfVectorIndex sibling of test_property_dedup_index.py: randomized
embedding churn must leave the incrementally maintained assignment and
centroid tables equal to a from-scratch rebuild."""

import os
import random
import shutil

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from gene_etl_spark.lake.ann_index import IvfVectorIndex
from gene_etl_spark.lake.table import LakeTable

DIM = 6
_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from gene_etl_spark.session import get_spark

        _spark = get_spark(
            app_name="prop-ann-index", cores=8, shuffle_partitions=8,
            driver_memory="8g",
        )
    return _spark


def _schema():
    return T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
            T.StructField("op", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )


def _state(idx):
    assign = {
        (r.cell, r.vec_id): tuple(round(x, 9) for x in r.embedding)
        for r in idx.table.read().collect()
    }
    cents = {
        r.cell: (r.n_vecs, tuple(round(x, 6) for x in r.centroid))
        for r in idx.centroids.read().collect()
    }
    return assign, cents


@settings(
    max_examples=3,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    seed=st.integers(0, 2**31 - 1),
    n_vecs=st.integers(5, 25),
    n_commits=st.integers(2, 4),
    update_frac=st.floats(0.0, 0.6),
    delete_frac=st.floats(0.0, 0.4),
)
def test_incremental_ann_equals_rebuild_property(
    seed, n_vecs, n_commits, update_frac, delete_frac
):
    spark = _get_spark()
    rng = random.Random(seed)
    nrng = np.random.default_rng(seed)
    base = f"/tmp/prop_ann_{seed}_{n_vecs}_{n_commits}"
    shutil.rmtree(base, ignore_errors=True)
    try:
        table = LakeTable.create(
            spark, os.path.join(base, "emb"),
            T.StructType(list(_schema().fields)[:2]),
            key_cols=["vec_id"], num_buckets=4,
        )
        idx = IvfVectorIndex(
            spark, os.path.join(base, "ann"), table, dim=DIM, n_bits=3
        )
        live: set[int] = set()
        next_id, lsn = 0, 0
        for c in range(n_commits):
            rows = []
            for _ in range(rng.randint(1, n_vecs)):
                rows.append((next_id, [float(x) for x in nrng.standard_normal(DIM)], "U"))
                live.add(next_id)
                next_id += 1
            for v in rng.sample(sorted(live), int(len(live) * update_frac)):
                rows.append((v, [float(x) for x in nrng.standard_normal(DIM)], "U"))
            for v in rng.sample(sorted(live), int(len(live) * delete_frac)):
                rows.append((v, None, "D"))
            final: dict[int, tuple] = {}
            for vid, emb, op in rows:
                final[vid] = (emb, op)
            for vid, (_e, op) in final.items():
                (live.discard if op == "D" else live.add)(vid)
            df = spark.createDataFrame(
                [(vid, emb, op, lsn + j + 1, None)
                 for j, (vid, (emb, op)) in enumerate(final.items())],
                _schema(),
            )
            table.merge(df, batch_id=f"c{c}", start_lsn=lsn, end_lsn=lsn + len(final))
            lsn += len(final)
            if c % 2 == 0:
                idx.refresh()
        idx.refresh()

        fresh = IvfVectorIndex(
            spark, os.path.join(base, "ann_fresh"), table, dim=DIM, n_bits=3
        )
        fresh.refresh()
        assert _state(idx) == _state(fresh)
        assert len(_state(idx)[0]) == len(live) == table.read().count()
    finally:
        shutil.rmtree(base, ignore_errors=True)
