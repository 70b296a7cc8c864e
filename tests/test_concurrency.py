"""Optimistic-concurrency commit protocol: a losing writer rebases onto
the winner when safe (disjoint CoW buckets, MoR delta appends), and
refuses when not (overlapping CoW rewrite, duplicate batch_id)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gene_etl_spark.functions import bucket_of
from gene_etl_spark.lake.table import CommitConflict, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _upd(spark, rows):
    return spark.createDataFrame(
        [
            (lsn, op, conv, turn, text, dt.datetime(2024, 1, 1, 0, 0, lsn % 60))
            for (lsn, op, conv, turn, text) in rows
        ],
        "lsn long, op string, conv_id string, turn_idx int, text string, ts timestamp",
    )


def _two_convs(spark, same_bucket: bool):
    m = {
        r["conv_id"]: r["b"]
        for r in spark.createDataFrame(
            [(f"c{i}",) for i in range(40)], "conv_id string"
        )
        .select("conv_id", bucket_of("conv_id", 8).alias("b"))
        .collect()
    }
    first = next(iter(m))
    for c, b in m.items():
        if c != first and (b == m[first]) == same_bucket:
            return first, c
    raise AssertionError("no conv pair found")


def _race(table: LakeTable, winner_fn):
    """Arrange for ``winner_fn`` to commit just before ``table``'s next
    manifest link (the classic lost-the-race interleaving)."""
    orig = table._write_manifest
    state = {"fired": False}

    def racy(manifest, **kwargs):
        if not state["fired"]:
            state["fired"] = True
            winner_fn()
        return orig(manifest, **kwargs)

    table._write_manifest = racy


def test_cow_disjoint_bucket_conflict_rebases(spark, workdir):
    a, b = _two_convs(spark, same_bucket=False)
    t = LakeTable.create(spark, f"{workdir}/lake", SCHEMA, ["conv_id", "turn_idx"], 8)
    t.merge(_upd(spark, [(1, "I", a, 0, "a0"), (2, "I", b, 0, "b0")]), batch_id="seed")

    loser = LakeTable.load(spark, f"{workdir}/lake")
    winner = LakeTable.load(spark, f"{workdir}/lake")
    _race(
        loser,
        lambda: winner.merge(_upd(spark, [(3, "U", b, 0, "b1")]), batch_id="w"),
    )
    res = loser.merge(_upd(spark, [(4, "U", a, 0, "a1")]), batch_id="l")

    final = LakeTable.load(spark, f"{workdir}/lake")
    assert res.snapshot_version == final.version == 3  # rebased past the winner
    state = {
        (r.conv_id, r.turn_idx): r.text for r in final.read().collect()
    }
    assert state == {(a, 0): "a1", (b, 0): "b1"}  # neither update lost
    assert final.manifest["summary"]["total_rows"] == 2
    assert {"seed", "w", "l"} <= set(final.committed_batches())


def test_cow_overlapping_bucket_conflict_refuses(spark, workdir):
    a, b = _two_convs(spark, same_bucket=True)
    t = LakeTable.create(spark, f"{workdir}/lake", SCHEMA, ["conv_id", "turn_idx"], 8)
    t.merge(_upd(spark, [(1, "I", a, 0, "a0"), (2, "I", b, 0, "b0")]), batch_id="seed")

    loser = LakeTable.load(spark, f"{workdir}/lake")
    winner = LakeTable.load(spark, f"{workdir}/lake")
    _race(
        loser,
        lambda: winner.merge(_upd(spark, [(3, "U", b, 0, "b1")]), batch_id="w"),
    )
    with pytest.raises(CommitConflict, match="rebase unsafe"):
        loser.merge(_upd(spark, [(4, "U", a, 0, "a1")]), batch_id="l")
    # the winner's state is intact; the loser left only orphan files
    final = LakeTable.load(spark, f"{workdir}/lake")
    assert final.version == 2
    state = {(r.conv_id, r.turn_idx): r.text for r in final.read().collect()}
    assert state == {(a, 0): "a0", (b, 0): "b1"}


def test_mor_concurrent_appends_both_land(spark, workdir):
    a, b = _two_convs(spark, same_bucket=True)  # same bucket: appends still safe
    t = LakeTable.create(spark, f"{workdir}/lake", SCHEMA, ["conv_id", "turn_idx"], 8)
    t.merge(_upd(spark, [(1, "I", a, 0, "a0"), (2, "I", b, 0, "b0")]), batch_id="seed")

    loser = LakeTable.load(spark, f"{workdir}/lake")
    winner = LakeTable.load(spark, f"{workdir}/lake")
    _race(
        loser,
        lambda: winner.merge(
            _upd(spark, [(3, "U", b, 0, "b1")]), batch_id="w", mode="mor"
        ),
    )
    res = loser.merge(_upd(spark, [(4, "U", a, 0, "a1")]), batch_id="l", mode="mor")

    final = LakeTable.load(spark, f"{workdir}/lake")
    assert res.snapshot_version == final.version == 3
    state = {(r.conv_id, r.turn_idx): r.text for r in final.read().collect()}
    assert state == {(a, 0): "a1", (b, 0): "b1"}  # both deltas resolve


def test_duplicate_batch_id_race_refuses(spark, workdir):
    a, b = _two_convs(spark, same_bucket=False)
    t = LakeTable.create(spark, f"{workdir}/lake", SCHEMA, ["conv_id", "turn_idx"], 8)
    t.merge(_upd(spark, [(1, "I", a, 0, "a0")]), batch_id="seed")

    loser = LakeTable.load(spark, f"{workdir}/lake")
    winner = LakeTable.load(spark, f"{workdir}/lake")
    _race(
        loser,
        lambda: winner.merge(_upd(spark, [(2, "U", a, 0, "a1")]), batch_id="dup"),
    )
    with pytest.raises(CommitConflict, match="committed concurrently"):
        loser.merge(_upd(spark, [(2, "U", a, 0, "a1")]), batch_id="dup")
    final = LakeTable.load(spark, f"{workdir}/lake")
    assert final.version == 2  # exactly one application of the batch


def test_fencing_cache_sees_other_writers_and_expiry(spark, workdir):
    """committed_batches is incrementally cached per instance; the cache
    anchors on a live dir scan, so another writer's commits always show,
    and expired manifests keep fencing (expiry renames, never removes)."""
    t1 = LakeTable.create(
        spark, f"{workdir}/lake_fc", SCHEMA, ["conv_id", "turn_idx"], 4
    )
    t1.merge(_upd(spark, [(1, "I", "c0", 0, "a")]), batch_id="b1")
    t2 = LakeTable.load(spark, f"{workdir}/lake_fc")
    assert set(t2.committed_batches()) == {"b1"}  # warm t2's cache

    # another instance commits: t2 must see it without a reload
    t1.merge(_upd(spark, [(2, "I", "c1", 0, "b")]), batch_id="b2")
    assert {"b1", "b2"} <= set(t2.committed_batches())
    assert t2.max_committed_end_lsn() == t1.max_committed_end_lsn()

    # expiry renames old manifests; they still fence through the cache
    from gene_etl_spark.lake.maintenance import expire_snapshots

    expire_snapshots(t1, keep_last=0)
    fresh = LakeTable.load(spark, f"{workdir}/lake_fc")
    assert {"b1", "b2"} <= set(fresh.committed_batches())
    assert {"b1", "b2"} <= set(t2.committed_batches())
