"""Chained incremental DAG: conv lake → per-conversation document
rollup → dedup index (pipeline.ConversationDedupChain). A turn edit /
conv delete flows through two fenced incremental refreshes and the
near-duplicate CONVERSATION pairs track the live state."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gene_etl_spark.lake.dedup_index import CorpusDedupIndex
from gene_etl_spark.lake.table import LakeTable
from gene_etl_spark.pipeline import ConversationDedupChain


def _conv_schema():
    return T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("text", T.StringType(), True),
        ]
    )


def _turns(tag: str, n_turns: int = 5, w_per_turn: int = 7):
    return [
        (f"{tag}", t, " ".join(f"{tag}w{t}x{k}" for k in range(w_per_turn)))
        for t in range(n_turns)
    ]


def _copy_conv(rows, new_id):
    return [(new_id, t, text) for (_c, t, text) in rows]


def _merge(spark, table, rows, lsn0, op="U"):
    df = spark.createDataFrame(
        [(c, t, tx, op, lsn0 + j, None) for j, (c, t, tx) in enumerate(rows)],
        T.StructType(
            list(_conv_schema().fields)
            + [
                T.StructField("op", T.StringType()),
                T.StructField("lsn", T.LongType()),
                T.StructField("ts", T.TimestampType()),
            ]
        ),
    )
    table.merge(df, batch_id=f"{op}{lsn0}", start_lsn=lsn0 - 1, end_lsn=lsn0 + len(rows))


@pytest.fixture()
def conv(spark, workdir):
    return LakeTable.create(
        spark,
        os.path.join(workdir, "conv"),
        _conv_schema(),
        key_cols=["conv_id", "turn_idx"],
        num_buckets=4,
    )


def test_chain_tracks_conversation_near_dups(spark, workdir, conv):
    chain = ConversationDedupChain(spark, conv, os.path.join(workdir, "chain"))

    a, b = _turns("a"), _turns("b")
    c = _copy_conv(a, "c")  # exact duplicate conversation
    _merge(spark, conv, a + b + c, lsn0=1)
    chain.refresh()

    pairs = {(r.doc_a, r.doc_b, r.exact) for r in chain.candidate_pairs().collect()}
    assert ("a", "c", True) in pairs
    assert not any({p[0], p[1]} == {"a", "b"} for p in pairs)

    # rollup documents equal a direct recompute over the live lake
    docs = {
        r.conv_id: r.text for r in chain.rollup.read().collect()
    }
    direct = {
        r.conv_id: r.text
        for r in conv.read()
        .groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                    lambda x: x["text"],
                ),
                " ",
            ).alias("text")
        )
        .collect()
    }
    assert docs == direct and set(docs) == {"a", "b", "c"}

    # commit 2: delete conv c entirely; insert conv d = a with ONE word
    # changed in one turn (near-duplicate conversation)
    d = _copy_conv(a, "d")
    cid, t1, tx = d[2]
    d[2] = (cid, t1, tx.replace("aw2x3", "zzz"))
    _merge(spark, conv, [(cid, t, None) for (cid, t, _tx) in c], lsn0=100, op="D")
    _merge(spark, conv, d, lsn0=200)
    out = chain.refresh()
    assert out["rollup"]["refreshed"] and out["index"]["refreshed"]

    pairs2 = {(r.doc_a, r.doc_b, r.exact) for r in chain.candidate_pairs().collect()}
    assert ("a", "d", False) in pairs2          # near, not exact
    assert not any("c" in (p[0], p[1]) for p in pairs2)  # deleted conv gone

    # a turn EDIT that converts d into an exact copy of a
    _merge(spark, conv, [("d", 2, a[2][2])], lsn0=400)
    chain.refresh()
    pairs3 = {(r.doc_a, r.doc_b, r.exact) for r in chain.candidate_pairs().collect()}
    assert ("a", "d", True) in pairs3

    # the chained index equals a clean rebuild over the rollup table
    fresh = CorpusDedupIndex(
        spark, os.path.join(workdir, "fresh_dedup"), chain.rollup.table
    )
    fresh.refresh()
    live = lambda t: {tuple(r) for r in t.read().collect()}  # noqa: E731
    assert live(chain.idx.bands) == live(fresh.bands)
    assert live(chain.idx.fps) == live(fresh.fps)
