"""Write-audit-publish staged commits (lake/wap.py).

Pins the quarantine-by-default contract: a staged merge's data exists
and is auditable but invisible; publish is atomic with live-commit
concurrency rules (MoR appends rebase, CoW overlap refuses, duplicate
batch ids refuse); abandon + vacuum reclaims every staged byte.
"""

import datetime as dt
import os

import pytest
from pyspark.sql import types as T

from gene_etl_spark.lake import maintenance as mt
from gene_etl_spark.lake import wap
from gene_etl_spark.lake.changes import read_changes
from gene_etl_spark.lake.table import CommitConflict, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _upd(spark, rows, lsn0=1):
    return spark.createDataFrame(
        [
            (c, t, x, dt.datetime(2026, 1, 1), lsn0 + i, op)
            for i, (c, t, x, op) in enumerate(rows)
        ],
        "conv_id string, turn_idx int, text string, ts timestamp,"
        " _lsn long, _op string",
    )


def _merge(tbl, spark, rows, bid, lsn0, **kw):
    return tbl.merge(
        _upd(spark, rows, lsn0),
        batch_id=bid,
        op_col="_op",
        lsn_col="_lsn",
        start_lsn=lsn0,
        end_lsn=lsn0 + len(rows),
        **kw,
    )


@pytest.fixture()
def tbl(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "lake"), SCHEMA, ["conv_id", "turn_idx"], 8
    )
    _merge(t, spark, [(f"c{i}", 0, f"seed-{i}", "I") for i in range(10)], "seed", 1)
    return t


def test_staged_is_invisible_but_auditable(spark, tbl):
    res = _merge(
        tbl, spark, [("c1", 0, "DIRTY", "U"), ("c99", 0, "new", "I")],
        "audit-me", 100, stage_id="s1",
    )
    assert res.stage_id == "s1"
    # invisible to every reader / the version chain / fencing
    assert tbl.version == 1
    assert {r.text for r in tbl.read().where("conv_id in ('c1','c99')").collect()} == {
        "seed-1"
    }
    assert "audit-me" not in tbl.committed_batches()
    # auditable: the staged state is the would-be table
    staged = wap.read_staged(tbl, "s1")
    got = {r.conv_id: r.text for r in staged.where("conv_id in ('c1','c99')").collect()}
    assert got == {"c1": "DIRTY", "c99": "new"}
    assert wap.list_staged(tbl)["s1"]["batch_id"] == "audit-me"
    # duplicate stage id refuses
    with pytest.raises(CommitConflict):
        _merge(tbl, spark, [("c2", 0, "x", "U")], "other", 200, stage_id="s1")


def test_publish_equals_direct_merge(spark, tbl, tmp_path):
    twin = LakeTable.create(
        spark, str(tmp_path / "twin"), SCHEMA, ["conv_id", "turn_idx"], 8
    )
    _merge(twin, spark, [(f"c{i}", 0, f"seed-{i}", "I") for i in range(10)], "seed", 1)
    batch = [("c1", 0, "v2", "U"), ("c2", 0, None, "D"), ("c77", 1, "new", "I")]
    _merge(twin, spark, batch, "b1", 100)
    _merge(tbl, spark, batch, "b1", 100, stage_id="s1")
    out = wap.publish_staged(tbl, "s1")
    assert out["snapshot_version"] == 2 and out["batch_id"] == "b1"
    left = sorted(map(tuple, tbl.read().select("conv_id", "turn_idx", "text").collect()))
    right = sorted(map(tuple, twin.read().select("conv_id", "turn_idx", "text").collect()))
    assert left == right
    # fencing is now live; publish-again and replay both refuse
    assert "b1" in tbl.committed_batches()
    with pytest.raises(FileNotFoundError):
        wap.publish_staged(tbl, "s1")
    # change feed sees the published commit like any other
    ops = {(r.conv_id, r._change_op) for r in read_changes(tbl, 1).collect()}
    assert ops == {("c1", "U"), ("c2", "D"), ("c77", "U")}


def test_publish_rebases_over_intervening_mor_append(spark, tbl):
    _merge(tbl, spark, [("c5", 1, "staged", "I")], "st", 100, mode="mor", stage_id="s1")
    _merge(tbl, spark, [("c6", 1, "live", "I")], "live", 200, mode="mor")
    out = wap.publish_staged(tbl, "s1")
    assert out["snapshot_version"] == 3
    texts = {r.conv_id: r.text for r in tbl.read().where("turn_idx=1").collect()}
    assert texts == {"c5": "staged", "c6": "live"}


def test_publish_refuses_cow_bucket_overlap_and_dup_batch(spark, tbl):
    _merge(tbl, spark, [("c3", 0, "staged", "U")], "st", 100, stage_id="s1")
    # live commit rewrites the SAME key's bucket after staging
    _merge(tbl, spark, [("c3", 0, "live", "U")], "live", 200)
    with pytest.raises(CommitConflict):
        wap.publish_staged(tbl, "s1")
    # a duplicate batch id refuses before touching the chain
    _merge(tbl, spark, [("c4", 0, "x", "U")], "live", 300, stage_id="s2")
    with pytest.raises(CommitConflict):
        wap.publish_staged(tbl, "s2")
    assert tbl.read().where("conv_id='c3'").collect()[0].text == "live"


def _parquet_set(tbl):
    return {
        os.path.join(r, f)
        for r, _d, fs in os.walk(os.path.join(tbl.path, "data"))
        for f in fs
        if f.endswith(".parquet")
    }


def test_abandon_then_vacuum_reclaims_staged_bytes(spark, tbl):
    mt.vacuum(tbl, older_than_sec=0)  # clear seed-write markers first
    before_data = _parquet_set(tbl)
    _merge(tbl, spark, [("c1", 0, "bad", "U")], "bad", 100, stage_id="s1")
    # staged files + pieces pinned while the stage exists: vacuum runs,
    # the staged snapshot stays fully readable
    mt.vacuum(tbl, older_than_sec=0)
    assert wap.read_staged(tbl, "s1").where("conv_id='c1'").collect()[0].text == "bad"
    assert wap.abandon_staged(tbl, "s1") == {"abandoned": "s1"}
    with pytest.raises(FileNotFoundError):
        wap.read_staged(tbl, "s1")
    res = mt.vacuum(tbl, older_than_sec=0)
    assert res["removed_files"] >= 1
    assert _parquet_set(tbl) == before_data  # every staged byte reclaimed
    assert tbl.read().where("conv_id='c1'").collect()[0].text == "seed-1"
    # the batch was never committed: replaying it live works
    _merge(tbl, spark, [("c1", 0, "good", "U")], "bad", 100)
    assert tbl.read().where("conv_id='c1'").collect()[0].text == "good"
