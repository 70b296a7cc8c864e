"""The refined-quantizer assignment has two physical paths — the
inlined codegen expression (small K·dim) and the Arrow matmul pandas
UDF (large K·dim) — selected purely by quantizer size in
``nearest_cell``. They must be the SAME function: these tests pin
row-exact equality across both paths on a corpus that includes every
edge the expression path defines semantics for (NULL embedding,
wrong-length embedding, NaN element, zero-norm "dead" centroid, exact
ties), and that the size cut actually routes where it should."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gene_etl_spark.lake.ann_index import (
    NEAREST_CELL_CODEGEN_MAX_TERMS,
    nearest_cell,
    nearest_cell_expr,
    nearest_cell_pandas,
)

DIM = 16
K = 8


def _edge_corpus():
    rng = np.random.default_rng(41)
    rows = [(i, rng.standard_normal(DIM).tolist()) for i in range(200)]
    rows.append((200, None))  # NULL embedding -> cell 0 on both paths
    rows.append((201, [1.0] * (DIM - 3)))  # wrong length -> cell 0
    bad = rng.standard_normal(DIM).tolist()
    bad[3] = float("nan")  # NaN element -> all scores -inf -> cell 0
    rows.append((202, bad))
    rows.append((203, [0.0] * DIM))  # zero vector: all dots 0.0 (tie)
    return rows


def _schema():
    return T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
        ]
    )


@pytest.fixture(scope="module")
def edge_df(spark):
    df = spark.createDataFrame(_edge_corpus(), _schema()).persist()
    df.count()
    yield df
    df.unpersist()


def _centroids(dead_cell: int | None = 5) -> np.ndarray:
    rng = np.random.default_rng(99)
    cents = rng.standard_normal((K, DIM))
    if dead_cell is not None:
        cents[dead_cell] = 0.0  # dead centroid: -inf on both paths
    return cents


def _assignments(df, col) -> dict[int, int]:
    rows = df.select("vec_id", col.alias("cell")).collect()
    return {int(r.vec_id): int(r.cell) for r in rows}

def test_expr_and_pandas_paths_agree_rowwise(edge_df):
    cents = _centroids()
    a = _assignments(edge_df, nearest_cell_expr("embedding", cents))
    b = _assignments(edge_df, nearest_cell_pandas("embedding", cents))
    assert a == b
    # the defined edge semantics, explicitly (not just mutual agreement)
    for vid in (200, 201, 202):
        assert a[vid] == 0
    # the zero vector scores 0.0 against every live unit centroid —
    # an exact tie broken to the lowest cell id on both paths
    assert a[203] == 0
    # the dead centroid never wins anywhere
    assert 5 not in set(a.values())


def test_selector_routes_by_quantizer_size(edge_df):
    small = _centroids(dead_cell=None)  # K*DIM = 128 << threshold
    assert small.size <= NEAREST_CELL_CODEGEN_MAX_TERMS
    a = _assignments(edge_df, nearest_cell("embedding", small))
    b = _assignments(edge_df, nearest_cell_expr("embedding", small))
    assert a == b

    # a quantizer past the cut: K' x DIM with K'*DIM > threshold.
    big_k = NEAREST_CELL_CODEGEN_MAX_TERMS // DIM + 8
    rng = np.random.default_rng(7)
    big = rng.standard_normal((big_k, DIM))
    assert big.size > NEAREST_CELL_CODEGEN_MAX_TERMS
    got = _assignments(edge_df, nearest_cell("embedding", big))
    # independent numpy model of the same assignment
    unit = big / np.linalg.norm(big, axis=1, keepdims=True)
    for vid, emb in _edge_corpus():
        if emb is None or len(emb) != DIM or any(np.isnan(emb)):
            assert got[vid] == 0
        else:
            assert got[vid] == int(np.argmax(unit @ np.asarray(emb)))


def test_pandas_path_plan_is_arrow_batched(spark, edge_df):
    big_k = NEAREST_CELL_CODEGEN_MAX_TERMS // DIM + 8
    big = np.random.default_rng(7).standard_normal((big_k, DIM))
    plan = edge_df.select(
        nearest_cell("embedding", big).alias("cell")
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
