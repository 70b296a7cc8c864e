"""Snapshot rollback: restore a live snapshot's content as a NEW commit.

Pins: content equality with the target (CoW and MoR, including a target
that still carried deltas), feed visibility (the rollback commit emits
the restoring U/D rows — deletes for keys born after the target, upserts
for keys whose version changed — so CDC consumers fold the reversal: a
ContinuousRollup refreshed across the rollback equals a full recompute
of the restored state), metadata-only cost (no new data files), tag
resolution, and the rebucket/expired/no-op refusals.
"""

import datetime as dt
import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gene_etl_spark.lake.changes import CHANGE_OP_COL, read_changes
from gene_etl_spark.lake.maintenance import (
    expire_snapshots,
    read_at_version,
    rebucket,
    rollback,
    tag,
)
from gene_etl_spark.lake.rollup import ContinuousRollup
from gene_etl_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("grp", T.StringType()),
        T.StructField("val", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _upd(spark, rows):
    return spark.createDataFrame(
        [
            (lsn, op, conv, turn, grp, float(val),
             dt.datetime(2024, 1, 1, 0, 0, lsn % 60))
            for (lsn, op, conv, turn, grp, val) in rows
        ],
        "lsn long, op string, conv_id string, turn_idx int, grp string,"
        " val double, ts timestamp",
    )


def _state(df):
    return {
        (r.conv_id, r.turn_idx): (r.grp, r.val)
        for r in df.select("conv_id", "turn_idx", "grp", "val").collect()
    }


def _build(spark, path, mode):
    t = LakeTable.create(spark, path, SCHEMA, ["conv_id", "turn_idx"], 4)
    t.merge(
        _upd(spark, [(1, "I", "c0", 0, "a", 1.0), (2, "I", "c1", 0, "b", 2.0),
                     (3, "I", "c2", 0, "c", 3.0)]),
        batch_id="b1", mode=mode,
    )
    t.merge(
        _upd(spark, [(4, "U", "c0", 0, "a", 9.0), (5, "I", "c3", 0, "d", 4.0)]),
        batch_id="b2", mode=mode,
    )
    t.merge(
        _upd(spark, [(6, "D", "c1", 0, "b", 0.0), (7, "I", "c4", 0, "e", 5.0),
                     (8, "U", "c2", 0, "c", 30.0)]),
        batch_id="b3", mode=mode,
    )
    return t


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_rollback_restores_content_and_feeds_changes(spark, workdir, mode):
    t = _build(spark, f"{workdir}/lake_{mode}", mode)
    v_target = 2  # after b2: c0@4, c1@2, c2@3, c3@5
    target_state = _state(read_at_version(t, v_target))
    pre_state = _state(t.read())
    pre_v = t.version
    n_data_files = len(glob.glob(f"{t.path}/data/**/*.parquet", recursive=True))

    out = rollback(t, version=v_target)
    assert out["rolled_back"] and out["target_version"] == v_target
    assert t.version == pre_v + 1
    assert _state(t.read()) == target_state

    # metadata-only: no data file was written
    assert (
        len(glob.glob(f"{t.path}/data/**/*.parquet", recursive=True))
        == n_data_files
    )

    # the feed emits the restoring rows: D for keys born after the
    # target, U for keys whose version reverted
    ch = read_changes(t, pre_v, t.version)
    by_op = {
        op: {(r.conv_id, r.turn_idx) for r in rows}
        for op, rows in (
            (o, [r for r in ch.collect() if r[CHANGE_OP_COL] == o])
            for o in ("U", "D")
        )
    }
    # D: keys born after the target (c4); U: keys restored from a
    # delete (c1) plus keys whose version reverted (c2's update undone)
    assert by_op["D"] == set(pre_state) - set(target_state)
    assert by_op["U"] == (set(target_state) - set(pre_state)) | {
        k
        for k in set(target_state) & set(pre_state)
        if target_state[k] != pre_state[k]
    }

    # idempotent: rolling back to the same content is a no-op commit
    again = rollback(t, version=v_target)
    assert not again["rolled_back"]
    assert t.version == pre_v + 1


def test_rollup_consumer_folds_the_rollback(spark, workdir):
    t = _build(spark, f"{workdir}/lake_roll", "cow")
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("val").alias("sum_val"),
    ]
    roll = ContinuousRollup(spark, f"{workdir}/rollup", t, ["grp"], aggs, 4)
    roll.refresh()

    rollback(t, version=2)
    roll.refresh()

    recomputed = {
        r.grp: (r.n_rows, round(r.sum_val, 6))
        for r in t.read().groupBy("grp").agg(*aggs).collect()
    }
    maintained = {
        r.grp: (r.n_rows, round(r.sum_val, 6))
        for r in roll.read().select("grp", "n_rows", "sum_val").collect()
    }
    assert maintained == recomputed


def test_rollback_validation_and_tags(spark, workdir):
    t = _build(spark, f"{workdir}/lake_val", "cow")
    tag(t, "good", version=1)

    with pytest.raises(ValueError, match="exactly one"):
        rollback(t)
    with pytest.raises(ValueError, match="exactly one"):
        rollback(t, version=1, tag_name="good")
    with pytest.raises(ValueError, match="no tag"):
        rollback(t, tag_name="absent")

    # tag resolution
    out = rollback(t, tag_name="good")
    assert out["rolled_back"] and out["target_version"] == 1
    assert _state(t.read()) == _state(read_at_version(t, 1))

    # expired target refused (drop the tag so expiry can take v1... but
    # v1 content == current now; roll forward first)
    rollback(t, version=3)
    from gene_etl_spark.lake.maintenance import drop_tag

    drop_tag(t, "good")
    expire_snapshots(t, keep_last=1)
    with pytest.raises(ValueError, match="not a live snapshot"):
        rollback(t, version=1)


def test_rollback_across_rebucket_refuses(spark, workdir):
    t = _build(spark, f"{workdir}/lake_rb", "cow")
    v_before = t.version
    rebucket(t, 8)
    with pytest.raises(ValueError, match="across a rebucket"):
        rollback(t, version=v_before)


# ------------------------------------------------------------- race tests
# rollback commits ride the normal optimistic-concurrency rules: a
# concurrent merge on a bucket the rollback restores overlaps and the
# rollback refuses; one on a bucket the rollback leaves alone (identical
# between current and target) rebases benignly and survives.


def _race(table, winner_fn):
    orig = table._write_manifest
    state = {"fired": False}

    def racy(manifest, **kwargs):
        if not state["fired"]:
            state["fired"] = True
            winner_fn()
        return orig(manifest, **kwargs)

    table._write_manifest = racy


def _bucketed_pair(spark, num_buckets=4):
    """Two conv ids landing in different buckets."""
    from gene_etl_spark.functions import bucket_of
    from pyspark.sql import functions as F  # noqa: F401

    rows = spark.createDataFrame(
        [(f"c{i}",) for i in range(40)], "conv_id string"
    ).select("conv_id", bucket_of("conv_id", num_buckets).alias("b")).collect()
    first = rows[0]
    for r in rows[1:]:
        if r.b != first.b:
            return first.conv_id, r.conv_id
    raise AssertionError("no cross-bucket pair")


def test_rollback_race_on_restored_bucket_refuses(spark, workdir):
    from gene_etl_spark.lake.table import CommitConflict, LakeTable

    a, b = _bucketed_pair(spark)
    t = LakeTable.create(spark, f"{workdir}/lake_race1", SCHEMA,
                         ["conv_id", "turn_idx"], 4)
    t.merge(_upd(spark, [(1, "I", a, 0, "x", 1.0), (2, "I", b, 0, "y", 2.0)]),
            batch_id="b1")
    t.merge(_upd(spark, [(3, "U", a, 0, "x", 9.0)]), batch_id="b2")

    loser = LakeTable.load(spark, f"{workdir}/lake_race1")
    winner = LakeTable.load(spark, f"{workdir}/lake_race1")
    # winner touches conv a's bucket — exactly what the rollback restores
    _race(loser, lambda: winner.merge(
        _upd(spark, [(4, "U", a, 0, "x", 11.0)]), batch_id="w"))
    with pytest.raises(CommitConflict):
        rollback(loser, version=1)
    final = LakeTable.load(spark, f"{workdir}/lake_race1")
    assert _state(final.read())[(a, 0)] == ("x", 11.0)  # winner preserved


def test_rollback_race_on_unchanged_bucket_rebases(spark, workdir):
    from gene_etl_spark.lake.table import LakeTable

    a, b = _bucketed_pair(spark)
    t = LakeTable.create(spark, f"{workdir}/lake_race2", SCHEMA,
                         ["conv_id", "turn_idx"], 4)
    t.merge(_upd(spark, [(1, "I", a, 0, "x", 1.0), (2, "I", b, 0, "y", 2.0)]),
            batch_id="b1")
    t.merge(_upd(spark, [(3, "U", a, 0, "x", 9.0)]), batch_id="b2")

    loser = LakeTable.load(spark, f"{workdir}/lake_race2")
    winner = LakeTable.load(spark, f"{workdir}/lake_race2")
    # winner touches conv b's bucket — identical between v1 and current,
    # so the rollback (touched = conv a's bucket only) rebases past it
    _race(loser, lambda: winner.merge(
        _upd(spark, [(4, "U", b, 0, "y", 22.0)]), batch_id="w"))
    out = rollback(loser, version=1)
    assert out["rolled_back"]
    final = LakeTable.load(spark, f"{workdir}/lake_race2")
    st = _state(final.read())
    assert st[(a, 0)] == ("x", 1.0)  # restored
    assert st[(b, 0)] == ("y", 22.0)  # winner's concurrent change kept
